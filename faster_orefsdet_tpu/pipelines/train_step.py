"""Episodic training step: loss computation + SGD update as one jitted graph.

Re-derivation of the reference train iteration (SimpleTrainer.run_step →
fsod_cen.forward, SURVEY.md §3.1): per query image, encode its way x shot
support crops, SM-refine + shot-mean them into CGM kernels, correlate the
query pyramid, run the CenterNet losses + proposal decode, sample 128 ROIs,
and run the DSA cascade stage losses.

Deliberate divergences from the reference (documented, SURVEY.md §7):
  - losses are averaged over the batch; the reference's python loop overwrote
    the dict so only the LAST item trained when B>1 (fsod_cen.py:279-307; the
    published runs use B=1, where this is identical);
  - support shot-mean is per image, not over the whole B*N support set
    (fsod_roi_heads.py:482 takes mean(0) over all images' supports — again
    identical at B=1).

Batch layout (all fixed shapes):
  images          [B, Hc, Wc, 3]   normalized, zero-padded canvas
  image_hw        [B, 2]           true resized sizes
  gt_boxes        [B, N, 4]; gt_classes [B, N]; gt_valid [B, N]
  support_images  [B, S, hs, ws, 3]
  support_boxes   [B, S, 4]
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models.cascade_roi import StageOutput, stage_losses, subsample_proposals
from ..models.centernet import _level_valid_mask, centernet_losses, decode_proposals
from ..models.detector import CenterNet2Detector, support_kernels
from ..ops.heatmap import (
    compute_grids,
    flat_size_ranges,
    flat_strides,
    render_targets,
)
from ..ops.roi_align import multilevel_roi_align
from ..structures.boxes import apply_deltas
from ..structures.instances import GroundTruth


class TrainBatch(NamedTuple):
    images: jnp.ndarray
    image_hw: jnp.ndarray
    gt_boxes: jnp.ndarray
    gt_classes: jnp.ndarray
    gt_valid: jnp.ndarray
    support_images: jnp.ndarray
    support_boxes: jnp.ndarray


def prepare_batch(batch: TrainBatch, cfg: Config) -> TrainBatch:
    """Device-side normalization of raw uint8 batches (trace-time dispatch).

    The mapper ships raw uint8 canvases (4x less host->device traffic —
    data/mapper.py); (x - mean)/std runs on device, fused by XLA into the
    first conv, and the padding region is re-zeroed to match the reference's
    normalize-then-pad order (fsod_cen.py:544-546 — pad pixels hold 0, not
    -mean/std). Already-normalized float batches pass through unchanged.
    """
    if batch.images.dtype != jnp.uint8:
        return batch
    mean = jnp.asarray(cfg.input.pixel_mean, jnp.float32)
    std = jnp.asarray(cfg.input.pixel_std, jnp.float32)
    x = (batch.images.astype(jnp.float32) - mean) / std
    hc, wc = x.shape[1:3]
    row_ok = jnp.arange(hc)[None, :] < batch.image_hw[:, 0, None]  # [B, Hc]
    col_ok = jnp.arange(wc)[None, :] < batch.image_hw[:, 1, None]  # [B, Wc]
    x = x * (row_ok[:, :, None] & col_ok[:, None, :])[..., None]
    sup = (batch.support_images.astype(jnp.float32) - mean) / std
    cs = cfg.fs.support_crop_size  # support valid region is static (mapper)
    sup = sup.at[:, :, cs:, :, :].set(0.0)
    sup = sup.at[:, :, :, cs:, :].set(0.0)
    return batch._replace(images=x, support_images=sup)


class TrainState(NamedTuple):
    params: Dict
    opt_state: optax.OptState
    step: jnp.ndarray
    # running BatchNorm statistics — None for frozen/stateless-norm configs,
    # a {"backbone": ...} collection for dla.norm="BN" (finetune_dla)
    batch_stats: Dict | None = None


def loss_fn(
    params,
    batch: TrainBatch,
    model: CenterNet2Detector,
    cfg: Config,
    rng: jax.Array,
    axis_name: str | None = None,
    batch_stats: Dict | None = None,
    deterministic: bool = False,
    injected_rois: Tuple[jnp.ndarray, jnp.ndarray] | None = None,
):
    """Returns (total, losses); with batch_stats given, (total, (losses,
    new_batch_stats)) — the two backbone passes run in BN train mode and the
    running stats update sequentially (query pass then support pass, the
    reference's forward order, fsod_cen.py:165→177).

    deterministic / injected_rois exist for the composed train-loss parity
    test (tests/test_composed_train_parity.py): deterministic=True disables
    the SM-block dropout; injected_rois=(boxes [B,R,4], valid [B,R]) bypasses
    proposal decode + random ROI subsampling — the injected boxes are labeled
    by the stage-0 matcher (cascade_ious[0]) exactly like sampled ones, so
    the torch transcription can feed the identical fixed set."""
    batch = prepare_batch(batch, cfg)
    variables = {"params": params}
    b = batch.images.shape[0]
    s = batch.support_images.shape[1]
    canvas_hw = (batch.images.shape[1], batch.images.shape[2])
    strides = cfg.centernet.fpn_strides
    levels = ("p3", "p4", "p5")
    drop_rng, sample_rng = jax.random.split(rng)
    if axis_name is not None:
        # DP rng contract: dropout decorrelates per replica, while ROI-
        # sampling keys are derived from the GLOBAL example index below —
        # so an N-device DP run draws the same proposal subsamples as a
        # single-device run over the same global batch (trajectory test,
        # tests/test_parallel_dp.py). The reference's DDP has no such
        # contract (each rank owns an independent torch RNG stream).
        rep = jax.lax.axis_index(axis_name)
        drop_rng = jax.random.fold_in(drop_rng, rep)
        ex_base = rep * b
    else:
        ex_base = 0

    # ---- query + support feature extraction (fsod_cen.py:165,177-178)
    sup_flat = batch.support_images.reshape(b * s, *batch.support_images.shape[2:])
    if batch_stats is not None:
        qfeats, upd = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch.images,
            method=model.features, train=True, mutable=["batch_stats"],
        )
        sfeats, upd = model.apply(
            {"params": params, **upd}, sup_flat,
            method=model.features, train=True, mutable=["batch_stats"],
        )
        new_batch_stats = upd["batch_stats"]
    else:
        qfeats = model.apply(variables, batch.images, method=model.features)
        sfeats = model.apply(variables, sup_flat, method=model.features)

    # ---- support ROI pools for the DSA head (:180-183)
    def pool_all(size):
        def one(f3, f4, f5, box):
            return multilevel_roi_align(
                [f3, f4, f5], box[None], list(strides), size,
                cfg.roi.pooler_sampling_ratio, cfg.roi.canonical_box_size,
                cfg.roi.canonical_level,
            )[0]

        return jax.vmap(one)(
            sfeats["p3"], sfeats["p4"], sfeats["p5"],
            batch.support_boxes.reshape(b * s, 4),
        )

    # shot-mean over the POSITIVE way only (supports are ordered positive-way
    # first by the mapper; the reference slices pos_begin:pos_end,
    # fsod_cen.py:208-227 — negative-way shots never enter the means)
    shot = min(cfg.fs.support_shot, s)
    sup8 = pool_all(cfg.roi.pooler_resolution).reshape(b, s, cfg.roi.pooler_resolution,
                                                       cfg.roi.pooler_resolution, -1)
    sup4 = pool_all(cfg.roi.pooler_resolution2).reshape(b, s, cfg.roi.pooler_resolution2,
                                                        cfg.roi.pooler_resolution2, -1)
    sup8_mean = jnp.mean(sup8[:, :shot], axis=1)  # [B, 8, 8, C]
    sup4_mean = jnp.mean(sup4[:, :shot], axis=1)

    # ---- SM refinement + per-image shot-mean kernels (:216-232)
    refined = model.apply(
        variables, sfeats, method=model.refine_support,
        rngs={"dropout": drop_rng}, deterministic=deterministic,
    )
    mean_maps = {
        k: jnp.mean(v.reshape(b, s, *v.shape[1:])[:, :shot], axis=1)
        for k, v in refined.items()
    }  # [B, S_l, S_l, C] — positive-way shots only (:225-227)

    kernels = {k: jax.vmap(support_kernels)(v) for k, v in mean_maps.items()}

    # ---- CGM correlation, batched over B (kernels have a leading B axis)
    def correlate_one(qf, ks):
        return model.apply(
            variables, {k: v[None] for k, v in qf.items()},
            {k: tuple(t for t in ks[k]) for k in levels}, method=model.correlate,
        )

    pos_feats = jax.vmap(
        lambda qf3, qf4, qf5, k1, k2, k3: {
            k: v[0]
            for k, v in correlate_one(
                {"p3": qf3, "p4": qf4, "p5": qf5}, {"p3": k1, "p4": k2, "p5": k3}
            ).items()
        }
    )(qfeats["p3"], qfeats["p4"], qfeats["p5"],
      kernels["p3"], kernels["p4"], kernels["p5"])

    # ---- CenterNet head + losses
    agn_hms, bbox_regs = model.apply(
        variables, {k: pos_feats[k] for k in levels}, method=model.proposal_head
    )

    grids = compute_grids(canvas_hw, strides)
    strides_m = flat_strides(canvas_hw, strides)
    size_ranges = flat_size_ranges(canvas_hw, strides, cfg.centernet.sizes_of_interest)

    # single-class path: gt classes forced to 0 (fsod_cen.py:157-159)
    gt_classes = jnp.zeros_like(batch.gt_classes)

    def per_image_targets(boxes, valid):
        return render_targets(
            boxes, valid, grids, strides_m, size_ranges, canvas_hw, strides,
            cfg.centernet.sizes_of_interest,
            hm_min_overlap=cfg.centernet.hm_min_overlap,
            min_radius=cfg.centernet.min_radius,
        )

    targets = jax.vmap(per_image_targets)(batch.gt_boxes, batch.gt_valid)

    if cfg.centernet.more_pos:
        # MORE_POS mining replaces the center positives (fsod_rpn.py:664-669)
        from ..ops.heatmap import more_pos_inds

        def mine(boxes, valid, r3, r4, r5):
            reg_flat = jnp.concatenate(
                [jax.lax.stop_gradient(r).reshape(-1, 4) for r in (r3, r4, r5)]
            )
            return more_pos_inds(
                boxes, valid, reg_flat, canvas_hw, strides,
                cfg.centernet.sizes_of_interest,
                more_pos_topk=cfg.centernet.more_pos_topk,
                more_pos_thresh=cfg.centernet.more_pos_thresh,
                loc_loss_type=cfg.centernet.loc_loss_type,
            )

        mp_inds, mp_mask = jax.vmap(mine)(
            batch.gt_boxes, batch.gt_valid, bbox_regs[0], bbox_regs[1], bbox_regs[2]
        )
        targets = targets._replace(pos_inds=mp_inds, pos_mask=mp_mask)

    canvas_valid = jax.vmap(
        lambda hw: _level_valid_mask(canvas_hw, strides, hw)
    )(batch.image_hw)

    # reference reduce_sum semantics (:719-726): num_pos averaged across the
    # data-parallel group; under shard_map the axis_name wires in the psum.
    local_pos = jnp.sum(targets.pos_mask)
    if axis_name is not None:
        total_pos = jax.lax.psum(local_pos, axis_name=axis_name)
        n_rep = jax.lax.psum(1, axis_name=axis_name)
    else:
        total_pos, n_rep = local_pos, 1
    num_pos_avg = jnp.maximum(total_pos / n_rep / b, 1.0)

    cn_losses = jax.vmap(
        lambda h3, h4, h5, r3, r4, r5, tgt, cval: centernet_losses(
            [h3, h4, h5], [r3, r4, r5], tgt, cfg.centernet, cval,
            num_pos_avg=num_pos_avg,
        )
    )(agn_hms[0], agn_hms[1], agn_hms[2], bbox_regs[0], bbox_regs[1], bbox_regs[2],
      targets, canvas_valid)
    cn_losses = {k: jnp.mean(v) for k, v in cn_losses.items()}

    # ---- proposals for the ROI stage (no grad through decode, :678-680 runs
    # under predict_instances' no_grad)
    if injected_rois is None:
        def decode_one(h3, h4, h5, r3, r4, r5, hw):
            return decode_proposals(
                [h3, h4, h5], [r3, r4, r5], cfg.centernet, canvas_hw, hw, training=True
            )

        proposals = jax.vmap(decode_one)(
            *[jax.lax.stop_gradient(x) for x in (agn_hms[0], agn_hms[1], agn_hms[2])],
            *[jax.lax.stop_gradient(x) for x in (bbox_regs[0], bbox_regs[1], bbox_regs[2])],
            batch.image_hw,
        )
        roi_boxes, roi_valid = proposals.boxes, proposals.valid
    else:
        roi_boxes, roi_valid = injected_rois

    # ---- ROI sampling + DSA cascade stage losses (keys by global example
    # index — identical draws under DP and single-device, see ex_base above)
    sample_rngs = jax.vmap(lambda i: jax.random.fold_in(sample_rng, i))(
        ex_base + jnp.arange(b)
    )

    def roi_one(rng_i, prop_boxes, prop_valid, gtb, gtc, gtv, f3, f4, f5, s8, s4):
        gt = GroundTruth(boxes=gtb, classes=gtc, valid=gtv)
        all_losses = {}
        if injected_rois is None:
            boxes, cls_t, box_t, slot_valid = subsample_proposals(
                rng_i, prop_boxes, prop_valid, gt, cfg.roi
            )
        else:
            # pre-sampled set: label with the stage-0 matcher only
            from ..models.cascade_roi import match_proposals

            boxes, slot_valid = prop_boxes, prop_valid
            midx, fg = match_proposals(boxes, slot_valid, gt, cfg.roi.cascade_ious[0])
            cls_t = jnp.where(fg & slot_valid, gt.classes[midx], cfg.roi.num_classes)
            box_t = gt.boxes[midx]
        for stage in range(len(cfg.roi.cascade_ious)):
            out = model.apply(
                variables, [f3, f4, f5], boxes, s8, s4, stage, method=model.roi_stage
            )
            all_losses.update(
                stage_losses(out, boxes, cls_t, box_t, slot_valid, cfg.roi, stage)
            )
            if stage + 1 < len(cfg.roi.cascade_ious):
                boxes = jax.lax.stop_gradient(
                    apply_deltas(out.deltas, boxes, cfg.roi.cascade_bbox_reg_weights[stage])
                )
                # re-match at the next IoU threshold (cascade_rcnn.py:218-260)
                from ..models.cascade_roi import match_proposals

                midx, fg = match_proposals(boxes, slot_valid, gt, cfg.roi.cascade_ious[stage + 1])
                cls_t = jnp.where(fg & slot_valid, gt.classes[midx], cfg.roi.num_classes)
                box_t = gt.boxes[midx]
        return all_losses

    roi_losses = jax.vmap(roi_one)(
        sample_rngs, roi_boxes, roi_valid,
        batch.gt_boxes, gt_classes, batch.gt_valid,
        qfeats["p3"], qfeats["p4"], qfeats["p5"], sup8_mean, sup4_mean,
    )
    roi_losses = {k: jnp.mean(v) for k, v in roi_losses.items()}

    losses = {**cn_losses, **roi_losses}
    total = sum(losses.values())
    if batch_stats is not None:
        return total, (losses, new_batch_stats)
    return total, losses


def _train_step_impl(state, batch, rng, model, cfg, tx, axis_name,
                     deterministic=False):
    if state.batch_stats is None:
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, model, cfg, rng, axis_name,
            deterministic=deterministic,
        )
        new_stats = None
    else:
        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, batch, model, cfg, rng, axis_name, state.batch_stats,
          deterministic=deterministic)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics = {"total_loss": total, **losses}
    return TrainState(params, opt_state, state.step + 1, new_stats), metrics


def _check_trainable(cfg: Config) -> None:
    """PTQ is serving-only: ops.quant.int8_conv's round + int8 casts carry
    no straight-through estimator, so d(loss)/d(kernel) through a quantized
    conv is zero almost everywhere — a quantize!=none training run would
    report plausible losses while the backbone never learns. Fail fast."""
    if getattr(cfg, "quantize", "none") != "none":
        raise ValueError(
            f"quantize={cfg.quantize!r} is a serving-only preset (no STE in "
            "the quantized convs — gradients would be zero). Train with "
            "quantize=none; quantization applies to the trained weights at "
            "serving time."
        )


def build_train_step(
    cfg: Config,
    model: CenterNet2Detector,
    tx: optax.GradientTransformation,
    axis_name: str | None = None,
    deterministic: bool = False,
):
    """jit-compiled (state, batch, rng) -> (state, metrics).

    Works for both stateless states (batch_stats=None) and BN states — the
    branch resolves at trace time on the state's pytree structure.
    deterministic=True disables SM-block dropout (DP trajectory test)."""
    _check_trainable(cfg)

    @jax.jit
    def train_step(state: TrainState, batch: TrainBatch, rng: jax.Array):
        return _train_step_impl(state, batch, rng, model, cfg, tx, axis_name,
                                deterministic)

    return train_step


def build_train_step_scan(
    cfg: Config,
    model: CenterNet2Detector,
    tx: optax.GradientTransformation,
    axis_name: str | None = None,
):
    """K sequential SGD steps fused into ONE program via lax.scan — the
    TPU-native answer to per-step dispatch latency (no reference analog:
    the torch trainer must dispatch per step; under XLA the whole k-step
    chain compiles once and the relay RTT amortizes k-fold; round-2 wall
    floor was dispatch-bound at 9-11 ms/it vs a 4.6 ms device step).

    Returns step_k(state, batches, rngs) -> (state, metrics[k]) where every
    leaf of `batches` is stacked on a leading k axis and rngs is [k] keys.
    Bit-identical to k build_train_step calls with the same per-step keys
    (tests/test_train_scan.py)."""
    _check_trainable(cfg)

    @jax.jit
    def train_step_k(state: TrainState, batches: TrainBatch, rngs: jax.Array):
        def body(st, xs):
            batch, rng = xs
            return _train_step_impl(st, batch, rng, model, cfg, tx, axis_name)

        return jax.lax.scan(body, state, (batches, rngs))

    return train_step_k


def run_scan_chunk(step_k, state: TrainState, loader, rng: jax.Array, kk: int):
    """Drive one k-step chunk: pull kk batches from the loader, stack them,
    split the rng EXACTLY like kk single steps (the numerics contract
    tests/test_train_scan.py pins), and dispatch one scan program.

    Returns (state, rng, metrics) where every metrics leaf is a [kk] device
    array (one entry per step). Shared by cli/train.py and
    tools/train_synthetic.py so the stacking/rng semantics live in one
    place."""
    bs = [next(loader) for _ in range(kk)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *bs)
    subs = []
    for _ in range(kk):
        rng, sub = jax.random.split(rng)
        subs.append(sub)
    state, mk = step_k(state, stacked, jnp.stack(subs))
    return state, rng, mk
