"""The jitted end-to-end query path: one XLA program per image (or batch).

Replaces the reference inference flow (fsod_cen.py:417-534 → fsod_rpn.py
inference :1068-1210 → fsod_roi_heads eval :437-457 → detector_postprocess)
which hops between python loops, Instances objects and two NMS passes. Here
backbone → CGM correlation vs the support cache → CenterNet decode+NMS →
cascade ROI → final NMS all trace into a single compiled graph with no host
sync — the main lever for the ≥10x-over-50FPS target (BASELINE.json).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..models.cascade_roi import roi_inference
from ..models.centernet import decode_proposals
from ..models.detector import CenterNet2Detector, support_kernels
from ..structures.boxes import apply_deltas
from ..structures.instances import Detections
from .support_cache import SupportCache


def make_detector(cfg: Config) -> CenterNet2Detector:
    """Meta-architecture factory (reference: META_ARCHITECTURE registry,
    fsod_train_net.py yamls). This config family builds CenterNet2Detector;
    the AttentionRPN/FsodRCNN baseline lives behind its own config type
    (pipelines.attention_rpn.BaselineConfig + build_fsod_rcnn)."""
    name = getattr(cfg, "model_name", "CenterNet2Detector")
    if name != "CenterNet2Detector":
        raise ValueError(
            f"model_name={name!r}: this Config family builds "
            "'CenterNet2Detector' only; the FsodRCNN baseline uses "
            "pipelines.attention_rpn.BaselineConfig"
        )
    return CenterNet2Detector(cfg)


def _variables(params, batch_stats):
    if batch_stats is not None:
        return {"params": params, "batch_stats": batch_stats}
    return {"params": params}


def _freeze_scales(cfg: Config, act_scales):
    """Normalize the calibrated-scale dict for lru_cache keys (hashable,
    order-independent) and validate it against cfg.quantize."""
    qmode = getattr(cfg, "quantize", "none")
    if qmode in ("int8_static", "int8_resident") and not act_scales:
        raise ValueError(
            f"quantize={qmode!r} needs calibrated activation scales: pass "
            "act_scales=pipelines.quant_calib.calibrate_act_scales(...)"
        )
    if act_scales is None:
        return None
    return tuple(sorted(act_scales.items()))


def _scales_ctx(frozen_scales):
    from ..ops.quant import static_act_scales

    return static_act_scales(dict(frozen_scales) if frozen_scales else None)


def query_path_single(
    model: CenterNet2Detector,
    params,
    cache: SupportCache,
    image: jnp.ndarray,
    image_hw: jnp.ndarray,
    cfg: Config,
    batch_stats=None,
) -> Detections:
    """One query image [Hc, Wc, 3] (normalized, padded canvas) → Detections.

    image_hw: [2] true resized size (h, w) before canvas padding; detections
    are in resized-image coordinates (caller rescales to the original frame,
    mirroring detector_postprocess, fsod_cen.py:557-571).
    batch_stats: BN running statistics for dla.norm="BN" models (eval mode).
    """
    canvas_hw = (image.shape[0], image.shape[1])
    variables = _variables(params, batch_stats)

    feats = model.apply(variables, image[None], method=model.features)
    feats = {k: v[0] for k, v in feats.items()}

    kernels = {
        "p3": support_kernels(cache.p3),
        "p4": support_kernels(cache.p4),
        "p5": support_kernels(cache.p5),
    }
    pos_feats = model.apply(
        variables, {k: v[None] for k, v in feats.items()}, kernels,
        method=model.correlate,
    )
    pos_feats = {k: v[0] for k, v in pos_feats.items()}

    agn_hms, bbox_regs = model.apply(
        variables, {k: v[None] for k, v in pos_feats.items()},
        method=model.proposal_head,
    )
    agn_hms = [h[0] for h in agn_hms]
    bbox_regs = [r[0] for r in bbox_regs]

    proposals = decode_proposals(
        agn_hms, bbox_regs, cfg.centernet, canvas_hw, image_hw, training=False,
        nms_budget=cfg.static.nms_budget_test,
    )

    # cascade (1 stage live); stage k>0 re-pools on the previous stage's
    # decoded boxes, clipped to the image (_create_proposals_from_boxes,
    # cascade_rcnn.py:218-236)
    from ..structures.boxes import clip_boxes

    feat_list = [feats[l] for l in ("p3", "p4", "p5")]
    stage_outputs = []
    boxes = proposals.boxes
    for stage in range(len(cfg.roi.cascade_ious)):
        out = model.apply(
            variables, feat_list, boxes, cache.rcnn_8, cache.rcnn_4, stage,
            method=model.roi_stage,
        )
        stage_outputs.append(out)
        boxes = apply_deltas(out.deltas, boxes, cfg.roi.cascade_bbox_reg_weights[stage])
        if stage + 1 < len(cfg.roi.cascade_ious):
            boxes = clip_boxes(boxes, image_hw)

    return roi_inference(
        stage_outputs, boxes, proposals.valid, image_hw, cfg.roi,
        proposal_scores=proposals.scores,
    )


def query_path_multiclass(
    model: CenterNet2Detector,
    params,
    mcache: SupportCache,
    image: jnp.ndarray,
    image_hw: jnp.ndarray,
    cfg: Config,
    batch_stats=None,
) -> Detections:
    """Multi-class query path: one backbone pass, then the support-conditioned
    stages vmapped over the class axis of a stacked cache
    (pipelines.support_cache.stack_support_caches), cross-class NMS at the end.

    Fixes the reference's per-class eval loop (fsod_cen.py:454-517), where
    each class iteration overwrites the previous one's attention maps so only
    the last class was ever scored."""
    from ..ops.nms import batched_nms_mask

    canvas_hw = (image.shape[0], image.shape[1])
    variables = _variables(params, batch_stats)
    feats = model.apply(variables, image[None], method=model.features)
    feats = {k: v[0] for k, v in feats.items()}
    feat_list = [feats[l] for l in ("p3", "p4", "p5")]

    def per_class(cache_c):
        kernels = {
            "p3": support_kernels(cache_c.p3),
            "p4": support_kernels(cache_c.p4),
            "p5": support_kernels(cache_c.p5),
        }
        pos_feats = model.apply(
            variables, {k: v[None] for k, v in feats.items()}, kernels,
            method=model.correlate,
        )
        agn_hms, bbox_regs = model.apply(
            variables, pos_feats, method=model.proposal_head
        )
        proposals = decode_proposals(
            [h[0] for h in agn_hms], [r[0] for r in bbox_regs],
            cfg.centernet, canvas_hw, image_hw, training=False,
            nms_budget=cfg.static.nms_budget_test,
        )
        boxes = proposals.boxes
        stage_outputs = []
        for stage in range(len(cfg.roi.cascade_ious)):
            out = model.apply(
                variables, feat_list, boxes, cache_c.rcnn_8, cache_c.rcnn_4,
                stage, method=model.roi_stage,
            )
            stage_outputs.append(out)
            boxes = apply_deltas(out.deltas, boxes, cfg.roi.cascade_bbox_reg_weights[stage])
        probs = sum(jax.nn.softmax(o.scores, axis=-1) for o in stage_outputs) / len(
            stage_outputs
        )
        from ..structures.boxes import clip_boxes

        return clip_boxes(boxes, image_hw), probs[:, 0], proposals.valid

    boxes, scores, valid = jax.vmap(per_class)(mcache)
    n_cls = boxes.shape[0]
    classes = jnp.repeat(jnp.arange(n_cls), boxes.shape[1])
    boxes = boxes.reshape(-1, 4)
    scores = scores.reshape(-1)
    valid = valid.reshape(-1) & (scores > cfg.roi.score_thresh_test)
    valid &= jnp.isfinite(scores) & jnp.all(jnp.isfinite(boxes), axis=-1)
    if getattr(cfg.roi, "use_pallas_nms", False):
        from ..ops.pallas_nms import batched_nms_mask_pallas, supported

        if supported(scores.shape[0]):
            nms_fn = batched_nms_mask_pallas
        else:
            # no silent caps: the user asked for the Pallas kernel but
            # n_cls*K exceeds its VMEM bound — say so once per trace
            import logging

            logging.getLogger(__name__).warning(
                "use_pallas_nms=True but multiclass NMS size %d is outside "
                "pallas_nms.supported(); falling back to the XLA fixpoint",
                scores.shape[0],
            )
            nms_fn = batched_nms_mask
    else:
        nms_fn = batched_nms_mask
    keep = nms_fn(boxes, scores, classes, valid, cfg.roi.nms_thresh_test)
    topk = min(cfg.roi.detections_per_image, scores.shape[0])
    sel_scores, sel_idx = jax.lax.top_k(jnp.where(keep, scores, -1.0), topk)
    return Detections(
        boxes=boxes[sel_idx],
        scores=jnp.maximum(sel_scores, 0.0),
        classes=classes[sel_idx],
        valid=sel_scores > 0.0,
    )


def build_multiclass_inference_fn(
    cfg: Config,
    model: CenterNet2Detector | None = None,
    act_scales=None,
):
    model = model or make_detector(cfg)
    frozen = _freeze_scales(cfg, act_scales)

    @jax.jit
    def fn(params, mcache, image, image_hw, batch_stats=None):
        with _scales_ctx(frozen):
            return query_path_multiclass(
                model, params, mcache, image, image_hw, cfg, batch_stats
            )

    return fn


def build_inference_fn(
    cfg: Config,
    model: CenterNet2Detector | None = None,
    act_scales=None,
):
    """jit-compiled (params, cache, image, image_hw[, batch_stats]) →
    Detections (batch_stats only for dla.norm="BN" models).

    act_scales: calibrated static int8 activation scales
    (pipelines.quant_calib) — required when cfg.quantize == "int8_static".

    Memoized on (cfg, model): repeat builders (periodic in-training eval,
    per-budget loops) must reuse one jit cache — a fresh closure per call
    forces a full retrace+recompile (minutes through the axon relay)."""
    return _build_inference_cached(
        cfg, model or make_detector(cfg), _freeze_scales(cfg, act_scales)
    )


@functools.lru_cache(maxsize=16)
def _build_inference_cached(cfg: Config, model: CenterNet2Detector, frozen_scales=None):
    @jax.jit
    def fn(params, cache, image, image_hw, batch_stats=None):
        with _scales_ctx(frozen_scales):
            return query_path_single(
                model, params, cache, image, image_hw, cfg, batch_stats
            )

    return fn


def pack_detections(det: Detections) -> jnp.ndarray:
    """Detections → one [K, 7] f32 array (x1,y1,x2,y2,score,class,valid).

    A multi-leaf result costs one host round-trip PER LEAF to fetch through
    the relay; packing makes a served result exactly one readback. The class
    column rides along so the format also represents multiclass results
    (query_path_multiclass output)."""
    return jnp.concatenate(
        [
            det.boxes.astype(jnp.float32),
            det.scores.astype(jnp.float32)[..., None],
            det.classes.astype(jnp.float32)[..., None],
            det.valid.astype(jnp.float32)[..., None],
        ],
        axis=-1,
    )


def unpack_detections_np(packed) -> dict:
    """Host-side inverse of pack_detections (numpy in, numpy dict out)."""
    import numpy as np

    arr = np.asarray(packed)
    valid = arr[..., 6] > 0.5
    return {
        "boxes": arr[..., :4],
        "scores": arr[..., 4],
        "classes": arr[..., 5].astype(np.int32),
        "valid": valid,
    }


def build_pinned_inference_fn(
    cfg: Config,
    params,
    cache: SupportCache,
    model: CenterNet2Detector | None = None,
    act_scales=None,
    batch_stats=None,
    packed: bool = False,
):
    """jit-compiled (image, image_hw) → Detections with params/cache CLOSED
    OVER (captured as program constants) instead of passed per call.

    The sustained single-stream dispatch loop pays a per-dispatch host cost
    that scales with the argument pytree (~170 param leaves flattened +
    shipped as buffer references through the relay RPC on every call); that
    overhead is what kept the round-3 dispatch loop at ~2/3 of pure compute.
    Pinning the weights reduces per-call traffic to the two image tensors.
    Use for sustained serving on fixed weights (the DefaultPredictor
    deployment shape, detectron2.7z!engine/defaults.py:255-322); rebuild
    after any param update.

    packed=True returns pack_detections(det) ([K,7] f32) instead of the
    Detections pytree — one readback per served result.

    UNLIKE build_inference_fn there is no lru_cache: the weights are baked
    into the closure, so every call to this builder is a fresh jit program
    (a full retrace + compile — minutes through the remote-compile relay).
    Build ONCE per weight set and reuse (AsyncPredictor holds exactly one).
    """
    model = model or make_detector(cfg)
    frozen_scales = _freeze_scales(cfg, act_scales)

    @jax.jit
    def fn(image, image_hw):
        with _scales_ctx(frozen_scales):
            det = query_path_single(
                model, params, cache, image, image_hw, cfg, batch_stats
            )
        return pack_detections(det) if packed else det

    return fn


def build_batched_inference_fn(
    cfg: Config,
    model: CenterNet2Detector | None = None,
    act_scales=None,
):
    """jit-compiled (params, cache, images [B,Hc,Wc,3], image_hw [B,2]) →
    batched Detections — the serving path (vmapped masked NMS, no host loop).

    images may be RAW uint8 canvases (4x less host->device traffic — the
    relay link is the eval bottleneck): normalization then runs on device
    and the padding is re-zeroed to the reference's normalize-then-pad
    semantics (fsod_cen.py:544-546), exactly like the train-side
    train_step.prepare_batch.

    Memoized on (cfg, model) — see build_inference_fn."""
    return _build_batched_cached(
        cfg, model or make_detector(cfg), _freeze_scales(cfg, act_scales)
    )


@functools.lru_cache(maxsize=16)
def _build_batched_cached(cfg: Config, model: CenterNet2Detector, frozen_scales=None):
    @jax.jit
    def fn(params, cache, images, image_hw, batch_stats=None):
        if images.dtype == jnp.uint8:
            mean = jnp.asarray(cfg.input.pixel_mean, jnp.float32)
            std = jnp.asarray(cfg.input.pixel_std, jnp.float32)
            x = (images.astype(jnp.float32) - mean) / std
            hc, wc = x.shape[1:3]
            row_ok = jnp.arange(hc)[None, :] < image_hw[:, 0, None]
            col_ok = jnp.arange(wc)[None, :] < image_hw[:, 1, None]
            images = x * (row_ok[:, :, None] & col_ok[:, None, :])[..., None]
        with _scales_ctx(frozen_scales):
            return jax.vmap(
                lambda img, hw: query_path_single(
                    model, params, cache, img, hw, cfg, batch_stats
                )
            )(images, image_hw)

    return fn


def build_serving_fn(
    cfg: Config,
    input_hw: Tuple[int, int],
    model: CenterNet2Detector | None = None,
    act_scales=None,
):
    """End-to-end serving program: RAW images → detections in original coords.

    Fuses the preprocessing stage INTO the jitted graph (the jax.image
    preprocessing stage of the BASELINE.json north star): uint8/float
    [B, H0, W0, 3] batches at a fixed camera resolution are resized to the
    configured test scale, normalized, padded and pushed through the query
    path — one XLA program from pixels to boxes, no host-side image work.

    input_hw: the fixed raw input resolution (static per serving deployment).
    Returns (fn, canvas_hw): fn(params, cache, raw_images [B,H0,W0,3]) →
    Detections with boxes already rescaled to the raw input frame.
    """
    from .preprocess import preprocess_device, resize_shortest_edge_size

    model = model or make_detector(cfg)
    frozen_scales = _freeze_scales(cfg, act_scales)
    h0, w0 = input_hw
    rh, rw = resize_shortest_edge_size(
        h0, w0, cfg.input.min_size_test, cfg.input.max_size_test
    )
    d = cfg.input.size_divisibility
    canvas_hw = (-(-rh // d) * d, -(-rw // d) * d)
    sy, sx = h0 / rh, w0 / rw
    hw = jnp.asarray([float(rh), float(rw)])
    scale_vec = jnp.asarray([sx, sy, sx, sy], jnp.float32)

    @jax.jit
    def fn(params, cache, raw_images, batch_stats=None):
        def one(img):
            canvas = preprocess_device(
                img, (rh, rw), canvas_hw, cfg.input.pixel_mean, cfg.input.pixel_std
            )
            det = query_path_single(model, params, cache, canvas, hw, cfg, batch_stats)
            return det._replace(boxes=det.boxes * scale_vec)

        with _scales_ctx(frozen_scales):
            return jax.vmap(one)(raw_images)

    return fn, canvas_hw


def rescale_detections(det: Detections, scale_hw) -> Detections:
    """Map resized-frame boxes back to original image coords
    (detector_postprocess semantics: scale x by w-ratio, y by h-ratio)."""
    sy, sx = scale_hw
    boxes = det.boxes * jnp.asarray([sx, sy, sx, sy], det.boxes.dtype)
    return det._replace(boxes=boxes)
