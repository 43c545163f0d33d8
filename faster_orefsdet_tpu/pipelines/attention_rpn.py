"""AttentionRPN baseline (FsodRCNN) pipelines: support cache, jitted
inference, and the episodic train loss.

Mirrors the reference flow for the ALT configs (SURVEY.md §2.2):
  train  — fsod_rcnn.py:114-331 (per-image support enhance → attention →
           RPN raw outputs → externally computed losses → Res5 ROI head →
           multi-relation predictor with hard-negative-mining CE)
  eval   — fsod_rcnn.py:445-518 + fsod_roi_heads.py:143-191
           (eval_with_support: per-class proposals, batched per-class
           relation scoring, cross-class NMS)
  cache  — fsod_rcnn.py:333-443 ({res4_avg, res5_avg} per class)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.attention_rpn import (
    FsodRCNN,
    generate_anchors,
    rpn_label_anchors,
    rpn_losses,
    rpn_predict_proposals,
)
from ..ops.losses import smooth_l1_loss
from ..ops.nms import batched_nms_mask
from ..ops.roi_align import roi_align
from ..structures.boxes import apply_deltas, clip_boxes, encode_deltas
from ..structures.instances import Detections, GroundTruth
from .train_step import TrainBatch


@dataclass(frozen=True)
class BaselineConfig:
    """Effective knobs of Base-FSOD-C4.yaml + finetune_R_50_C4_1x.yaml."""

    depth: int = 50
    stride: int = 16
    pooler_resolution: int = 14
    sampling_ratio: int = 0  # adaptive ROIAlignV2 semantics (ops/roi_align.py)
    # RPN (fsod_rpn config + Base-FSOD-C4.yaml:6-8)
    rpn_pre_nms_topk_train: int = 2000  # capped for TPU (ref 12000)
    rpn_post_nms_topk_train: int = 512  # ref 2000; sampled to 128 anyway
    rpn_pre_nms_topk_test: int = 1000  # ref 6000
    rpn_post_nms_topk_test: int = 100
    rpn_nms_thresh: float = 0.7
    rpn_batch_size: int = 256
    rpn_positive_fraction: float = 0.5
    # ROI (Base-FSOD-C4.yaml:10-13)
    roi_batch_size: int = 128
    roi_positive_fraction: float = 0.5
    roi_iou_threshold: float = 0.5
    num_classes: int = 1
    bbox_reg_weights: Tuple[float, float, float, float] = (10.0, 10.0, 5.0, 5.0)
    smooth_l1_beta: float = 0.0
    test_score_thresh: float = 0.05
    test_nms_thresh: float = 0.5
    detections_per_image: int = 100
    support_shot: int = 10
    compute_dtype: str = "float32"


class BaselineSupportCache(NamedTuple):
    res4_avg: jnp.ndarray  # [C?, 1, 14, 14, 1024] per-class enhanced rpn maps
    res5_avg: jnp.ndarray  # [C?, 1, 7, 7, 2048] per-class rcnn support


def make_fsod_rcnn(cfg: BaselineConfig) -> FsodRCNN:
    return FsodRCNN(depth=cfg.depth, dtype_str=cfg.compute_dtype)


def init_fsod_rcnn_params(model: FsodRCNN, rng: jax.Array):
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    r = jax.random.split(rng, 6)
    params = model.init(r[0], img, method=model.features)["params"]
    feat = model.apply({"params": params}, img, method=model.features)
    p1 = model.init(r[1], feat, method=model.rpn_head)["params"]
    p2 = model.init(r[2], jnp.zeros((2, 196, 1024)), method=model.enhance_support_rpn)["params"]
    p3 = model.init(r[3], jnp.zeros((2, 49, 2048)), method=model.enhance_support_rcnn)["params"]
    p4 = model.init(r[4], feat, jnp.zeros((1, 14, 14, 1024)), method=model.rpn_attention)["params"]
    pooled = jnp.zeros((2, 14, 14, 1024))
    p5 = model.init(r[5], pooled, method=model.res5_transform)["params"]
    res5_out = model.apply({"params": p5}, pooled, method=model.res5_transform)
    p6 = model.init(r[0], res5_out, res5_out[:1], method=model.relation)["params"]
    from ..utils.params import merge_params

    return merge_params(params, p1, p2, p3, p4, p5, p6)


def build_baseline_cache(
    model: FsodRCNN,
    params,
    support_images: jnp.ndarray,
    support_boxes: jnp.ndarray,
    cfg: BaselineConfig,
) -> BaselineSupportCache:
    """Single-class cache ({res4_avg, res5_avg}, fsod_rcnn.py:350-424).

    support_images: [S, Hs, Ws, 3] normalized ÷32-padded crops; boxes [S,4]."""
    variables = {"params": params}

    def run(imgs, boxes):
        res4 = model.apply(variables, imgs, method=model.features)  # [S,h,w,1024]
        pooled14 = jax.vmap(
            lambda f, b: roi_align(f, b[None], 1.0 / cfg.stride,
                                   cfg.pooler_resolution, cfg.sampling_ratio)[0]
        )(res4, boxes)  # [S,14,14,1024]
        res5 = model.apply(variables, pooled14, method=model.res5_transform)  # [S,7,7,2048]

        rpn_tokens = pooled14.reshape(pooled14.shape[0], 196, 1024)
        rcnn_tokens = res5.reshape(res5.shape[0], 49, 2048)
        res4_avg = model.apply(variables, rpn_tokens, method=model.enhance_support_rpn)
        res5_avg = model.apply(variables, rcnn_tokens, method=model.enhance_support_rcnn)
        return BaselineSupportCache(res4_avg=res4_avg[None], res5_avg=res5_avg[None])

    return jax.jit(run)(support_images, support_boxes)


def baseline_inference_single(
    model: FsodRCNN,
    params,
    cache: BaselineSupportCache,
    image: jnp.ndarray,
    image_hw: jnp.ndarray,
    cfg: BaselineConfig,
) -> Detections:
    """One query image through the per-class eval protocol
    (fsod_rcnn.py:445-518, eval_with_support fsod_roi_heads.py:143-191)."""
    variables = {"params": params}
    res4 = model.apply(variables, image[None], method=model.features)
    feat_hw = (res4.shape[1], res4.shape[2])
    anchors = generate_anchors(feat_hw, cfg.stride)

    def per_class(res4_avg, res5_avg):
        pos = model.apply(variables, res4, res4_avg, method=model.rpn_attention)
        logits, deltas = model.apply(variables, pos, method=model.rpn_head)
        props = rpn_predict_proposals(
            anchors, logits, deltas, image_hw,
            pre_nms_topk=cfg.rpn_pre_nms_topk_test,
            post_nms_topk=cfg.rpn_post_nms_topk_test,
            nms_thresh=cfg.rpn_nms_thresh,
        )
        pooled = roi_align(res4[0], props.boxes, 1.0 / cfg.stride,
                           cfg.pooler_resolution, cfg.sampling_ratio)
        box_feats = model.apply(variables, pooled, method=model.res5_transform)
        pred = model.apply(variables, box_feats, res5_avg, method=model.relation)
        probs = jax.nn.softmax(pred.scores, axis=-1)[:, 0]  # fg prob
        boxes = apply_deltas(pred.deltas, props.boxes, cfg.bbox_reg_weights)
        boxes = clip_boxes(boxes, image_hw)
        return boxes, probs, props.valid

    boxes, probs, valid = jax.vmap(per_class)(cache.res4_avg, cache.res5_avg)
    c = boxes.shape[0]
    classes = jnp.repeat(jnp.arange(c), boxes.shape[1])
    boxes = boxes.reshape(-1, 4)
    probs = probs.reshape(-1)
    valid = valid.reshape(-1) & (probs > cfg.test_score_thresh)
    keep = batched_nms_mask(boxes, probs, classes, valid, cfg.test_nms_thresh)
    topk = cfg.detections_per_image
    sel_scores, sel_idx = jax.lax.top_k(jnp.where(keep, probs, -1.0), topk)
    return Detections(
        boxes=boxes[sel_idx],
        scores=jnp.maximum(sel_scores, 0.0),
        classes=classes[sel_idx],
        valid=sel_scores > 0.0,
    )


def build_baseline_inference_fn(cfg: BaselineConfig, model: FsodRCNN | None = None):
    model = model or make_fsod_rcnn(cfg)

    @jax.jit
    def fn(params, cache, image, image_hw):
        return baseline_inference_single(model, params, cache, image, image_hw, cfg)

    return fn


# ------------------------------------------------------------------ training
def hard_negative_ce(
    scores: jnp.ndarray, gt_classes: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """FsodFastRCNNOutputs.softmax_cross_entropy_loss (fsod_fast_rcnn.py:232-260):
    CE over fg + hardest backgrounds (top bg by fg-softmax, split across the
    first/second half of the proposal batch), masked fixed-shape version."""
    n = scores.shape[0]
    probs = jax.nn.softmax(scores, axis=-1)
    fg = valid & (gt_classes == 0)
    bg = valid & (gt_classes == 1)
    num_fg = jnp.sum(fg)
    bg_num_0 = jnp.maximum(1, jnp.minimum(num_fg * 2, n // 4))
    bg_num_1 = jnp.maximum(1, jnp.minimum(num_fg * 1, bg_num_0))

    half = n // 2
    idx = jnp.arange(n)
    fg_prob = probs[:, 0]

    def topk_mask(mask, k):
        key = jnp.where(mask, fg_prob, -1.0)
        rank = jnp.argsort(jnp.argsort(-key))
        return mask & (rank < k)

    bg0 = topk_mask(bg & (idx < half), bg_num_0)
    bg1 = topk_mask(bg & (idx >= half), bg_num_1)
    selected = fg | bg0 | bg1
    logz = jax.nn.logsumexp(scores, axis=-1)
    ll = jnp.take_along_axis(scores, gt_classes[:, None], axis=-1)[:, 0]
    loss = jnp.where(selected, logz - ll, 0.0)
    return jnp.sum(loss) / jnp.maximum(jnp.sum(selected), 1)


def baseline_loss_fn(
    params,
    batch: TrainBatch,
    model: FsodRCNN,
    cfg: BaselineConfig,
    rng: jax.Array,
):
    """Episodic training losses (fsod_rcnn.py:141-331), B-averaged."""
    from ..models.cascade_roi import subsample_proposals

    variables = {"params": params}
    b = batch.images.shape[0]
    s = batch.support_images.shape[1]

    res4 = model.apply(variables, batch.images, method=model.features)
    sup_flat = batch.support_images.reshape(b * s, *batch.support_images.shape[2:])
    sup_res4 = model.apply(variables, sup_flat, method=model.features)
    pooled14 = jax.vmap(
        lambda f, bx: roi_align(f, bx[None], 1.0 / cfg.stride,
                                cfg.pooler_resolution, cfg.sampling_ratio)[0]
    )(sup_res4, batch.support_boxes.reshape(b * s, 4))
    sup_res5 = model.apply(variables, pooled14, method=model.res5_transform)

    feat_hw = (res4.shape[1], res4.shape[2])
    anchors = generate_anchors(feat_hw, cfg.stride)
    rngs = jax.random.split(rng, 2 * b).reshape(b, 2, -1)

    def per_image(i_res4, sup14, sup5, gtb, gtv, rr):
        rpn_tokens = sup14.reshape(s, 196, 1024)
        rcnn_tokens = sup5.reshape(s, 49, 2048)
        res4_avg = model.apply(variables, rpn_tokens, method=model.enhance_support_rpn)
        res5_avg = model.apply(variables, rcnn_tokens, method=model.enhance_support_rcnn)

        pos = model.apply(variables, i_res4[None], res4_avg, method=model.rpn_attention)
        logits, deltas = model.apply(variables, pos, method=model.rpn_head)
        gt = GroundTruth(boxes=gtb, classes=jnp.zeros_like(gtv, jnp.int32), valid=gtv)
        labels, matched = rpn_label_anchors(
            anchors, gt, rr[0], cfg.rpn_batch_size, cfg.rpn_positive_fraction
        )
        losses = rpn_losses(anchors, logits, deltas, labels, matched,
                            cfg.rpn_batch_size, cfg.smooth_l1_beta)

        props = rpn_predict_proposals(
            anchors, jax.lax.stop_gradient(logits), jax.lax.stop_gradient(deltas),
            jnp.asarray([feat_hw[0] * cfg.stride, feat_hw[1] * cfg.stride],
                        jnp.float32),
            pre_nms_topk=cfg.rpn_pre_nms_topk_train,
            post_nms_topk=cfg.rpn_post_nms_topk_train,
            nms_thresh=cfg.rpn_nms_thresh,
        )
        roi_cfg = _roi_cfg(cfg)
        boxes, gt_cls, gt_boxes, slot_valid = subsample_proposals(
            rr[1], props.boxes, props.valid, gt, roi_cfg
        )
        pooled = roi_align(i_res4, boxes, 1.0 / cfg.stride,
                           cfg.pooler_resolution, cfg.sampling_ratio)
        box_feats = model.apply(variables, pooled, method=model.res5_transform)
        pred = model.apply(variables, box_feats, res5_avg, method=model.relation)

        loss_cls = hard_negative_ce(pred.scores, gt_cls, slot_valid)
        fg = slot_valid & (gt_cls == 0)
        tgt = encode_deltas(boxes, gt_boxes, cfg.bbox_reg_weights)
        reg = smooth_l1_loss(pred.deltas, tgt, cfg.smooth_l1_beta)
        reg = jnp.sum(jnp.where(fg[:, None], reg, 0.0)) / jnp.maximum(
            jnp.sum(slot_valid), 1
        )
        losses["loss_cls"] = loss_cls
        losses["loss_box_reg"] = reg
        return losses

    sup14_b = pooled14.reshape(b, s, *pooled14.shape[1:])
    sup5_b = sup_res5.reshape(b, s, *sup_res5.shape[1:])
    all_losses = jax.vmap(per_image)(
        res4, sup14_b, sup5_b, batch.gt_boxes, batch.gt_valid, rngs
    )
    losses = {k: jnp.mean(v) for k, v in all_losses.items()}
    total = sum(losses.values())
    return total, losses


def _roi_cfg(cfg: BaselineConfig):
    from ..config import ROIConfig

    return ROIConfig(
        cascade_ious=(cfg.roi_iou_threshold,),
        batch_size_per_image=cfg.roi_batch_size,
        positive_fraction=cfg.roi_positive_fraction,
        num_classes=cfg.num_classes,
    )
