"""Cascade ROI heads with support-conditioned DSA fusion.

Re-architecture of fewx/modeling/fsod/fsod_roi_heads.py:282-520
(`CustomCascadeROIHeads`, the fewx-registry one that actually runs) plus the
modified detectron2 StandardROIHeads that hosts its DSA parameters
(detectron2.7z!modeling/roi_heads/roi_heads.py:585-592) and the cascade loop
(detectron2.7z!modeling/roi_heads/cascade_rcnn.py:163-260).

Live structure per stage (golden log :717-753):
  box_pooler  8x8 ROIAlignV2 over P3-P5,  box_pooler2 4x4
  DSA: attn = conv3(cat(q, s)) + cat(conv1(q), conv2(s))   [1x1 convs]
  box_head: flatten → fc1(8192→128) → relu
  predictor: cls Linear(128→2), bbox Linear(128→4) (class-agnostic)

The reference also computes a 4x4 branch through fc2/fc3 whose result is
discarded (fsod_roi_heads.py:513-516, SURVEY.md "dead compute") — we skip the
FLOPs and do not materialize those parameters.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ROIConfig
from ..ops.losses import smooth_l1_loss, softmax_cross_entropy
from ..ops.nms import keep_top_scores, nms_mask
from ..ops.roi_align import multilevel_roi_align
from ..structures.boxes import apply_deltas, clip_boxes, encode_deltas, pairwise_iou
from ..structures.instances import Detections, GroundTruth, Proposals


class StageOutput(NamedTuple):
    scores: jnp.ndarray  # [K, 2] class logits (fg, bg)
    deltas: jnp.ndarray  # [K, 4] class-agnostic box deltas


class DSACascadeHead(nn.Module):
    """Parameters + per-stage forward. Orchestration (matching/sampling/NMS)
    lives in pure functions below so that randomness and losses stay explicit.

    dtype: compute dtype for the Dense layers (params stay f32). Without it
    linen promotes bf16 pooled features back to f32 against the f32 params,
    doubling the stage's HBM traffic on the bf16 serving path."""

    cfg: ROIConfig
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        features: Sequence[jnp.ndarray],
        boxes: jnp.ndarray,
        support_8: jnp.ndarray,
        support_4: jnp.ndarray,
        stage: int,
    ) -> StageOutput:
        """features: list of [H_l, W_l, C] (one image); boxes [K,4];
        support_8 [8,8,C] / support_4 [4,4,C]: shot-mean support ROI features."""
        c = features[0].shape[-1]
        strides = [8, 16, 32]
        q8 = multilevel_roi_align(
            features, boxes, strides, self.cfg.pooler_resolution,
            self.cfg.pooler_sampling_ratio, self.cfg.canonical_box_size,
            self.cfg.canonical_level,
        )  # [K, 8, 8, C]

        s8 = jnp.broadcast_to(support_8[None].astype(q8.dtype), q8.shape)
        # DSA fuse (roi_heads.py:508-510): 1x1 convs = per-pixel Dense
        dt = self.dtype
        fused = nn.Dense(c, dtype=dt, name="dsa_conv3")(
            jnp.concatenate([q8, s8], axis=-1)
        )
        branch = jnp.concatenate(
            [nn.Dense(c // 2, dtype=dt, name="dsa_conv1")(q8),
             nn.Dense(c // 2, dtype=dt, name="dsa_conv2")(s8)],
            axis=-1,
        )
        attn8 = fused + branch  # [K, 8, 8, C]

        x = attn8.reshape(attn8.shape[0], -1)  # flatten (HWC order; converter
        # permutes torch's CHW-major fc1 weight accordingly)
        x = nn.relu(nn.Dense(self.cfg.fc_dim, dtype=dt, name=f"stage{stage}_fc1")(x))
        # predictors in f32: their outputs feed box decode / NMS thresholds
        x32 = x.astype(jnp.float32)
        scores = nn.Dense(self.cfg.num_classes + 1, name=f"stage{stage}_cls")(x32)
        deltas = nn.Dense(4, name=f"stage{stage}_bbox")(x32)
        return StageOutput(scores=scores, deltas=deltas)


# ------------------------------------------------------------------ sampling

def match_proposals(
    prop_boxes: jnp.ndarray,
    prop_valid: jnp.ndarray,
    gt: GroundTruth,
    iou_threshold: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """d2 Matcher([thr], [0,1], allow_low_quality=False) semantics
    (detectron2 matcher + roi_heads.label_and_sample_proposals:220-303).

    Returns (matched_gt_idx [K], fg_mask [K]): fg iff max IoU with a valid gt
    >= threshold."""
    iou = pairwise_iou(gt.boxes, prop_boxes)  # [N, K]
    iou = jnp.where(gt.valid[:, None], iou, -1.0)
    matched_idx = jnp.argmax(iou, axis=0)  # [K]
    matched_iou = jnp.max(iou, axis=0)
    fg = (matched_iou >= iou_threshold) & prop_valid
    return matched_idx, fg


def subsample_proposals(
    rng: jax.Array,
    prop_boxes: jnp.ndarray,
    prop_valid: jnp.ndarray,
    gt: GroundTruth,
    cfg: ROIConfig,
):
    """label_and_sample_proposals with PROPOSAL_APPEND_GT (d2 roi_heads.py
    :181-303): append gt boxes to the proposal set, match at cascade_ious[0],
    then sample `batch_size_per_image` with `positive_fraction` positives.

    Fixed-shape strategy: score each candidate with a random key, rank
    positives and negatives separately, keep the first num_pos/num_neg of
    each, then compact the selection into exactly `batch` slots.

    Returns (boxes [B,4], gt_classes [B] (num_classes = background),
    gt_boxes [B,4], slot_valid [B])."""
    boxes = jnp.concatenate([prop_boxes, gt.boxes], axis=0)
    valid = jnp.concatenate([prop_valid, gt.valid], axis=0)
    matched_idx, fg = match_proposals(boxes, valid, gt, cfg.cascade_ious[0])

    batch = cfg.batch_size_per_image
    max_pos = int(batch * cfg.positive_fraction)
    k = boxes.shape[0]

    r = jax.random.uniform(rng, (k,))
    # rank positives among positives, negatives among negatives
    pos_key = jnp.where(fg, r, 2.0)
    neg_key = jnp.where(valid & ~fg, r, 2.0)
    pos_rank = jnp.argsort(jnp.argsort(pos_key))  # rank of each elem
    neg_rank = jnp.argsort(jnp.argsort(neg_key))
    num_pos = jnp.minimum(jnp.sum(fg), max_pos)
    num_neg = jnp.minimum(jnp.sum(valid & ~fg), batch - num_pos)
    sel_pos = fg & (pos_rank < num_pos)
    sel_neg = valid & ~fg & (neg_rank < num_neg)
    selected = sel_pos | sel_neg

    # compact: order selected first (positives keep no particular order,
    # matching the reference's random permutation sampling)
    sort_key = jnp.where(selected, r, 2.0)
    order = jnp.argsort(sort_key)[:batch]
    slot_valid = selected[order]

    s_boxes = boxes[order]
    s_match = matched_idx[order]
    s_fg = fg[order]
    gt_classes = jnp.where(
        s_fg & slot_valid, gt.classes[s_match], cfg.num_classes
    ).astype(jnp.int32)
    gt_boxes = gt.boxes[s_match]
    return s_boxes, gt_classes, gt_boxes, slot_valid


# ------------------------------------------------------------------ losses

def stage_losses(
    out: StageOutput,
    prop_boxes: jnp.ndarray,
    gt_classes: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    slot_valid: jnp.ndarray,
    cfg: ROIConfig,
    stage: int,
) -> Dict[str, jnp.ndarray]:
    """FastRCNNOutputLayers.losses (d2 fast_rcnn.py:448-540): mean CE over all
    sampled rows + L1 (smooth_l1 beta=0) over fg deltas normalized by the
    total sampled count."""
    loss_cls = softmax_cross_entropy(out.scores, gt_classes, slot_valid)
    fg = slot_valid & (gt_classes < cfg.num_classes)
    target_deltas = encode_deltas(
        prop_boxes, gt_boxes, cfg.cascade_bbox_reg_weights[stage]
    )
    reg = smooth_l1_loss(out.deltas, target_deltas, cfg.smooth_l1_beta)
    reg = jnp.where(fg[:, None], reg, 0.0)
    loss_reg = jnp.sum(reg) / jnp.maximum(jnp.sum(slot_valid), 1)
    return {f"loss_cls_stage{stage}": loss_cls, f"loss_box_reg_stage{stage}": loss_reg}


# ------------------------------------------------------------------ inference

def roi_inference(
    stage_outputs: Sequence[StageOutput],
    final_boxes: jnp.ndarray,
    prop_valid: jnp.ndarray,
    image_hw,
    cfg: ROIConfig,
    proposal_scores: jnp.ndarray | None = None,
) -> Detections:
    """Cascade score averaging + fast_rcnn_inference
    (fsod_roi_heads.py:437-457, d2 fast_rcnn.py:46-172).

    stage_outputs: per-stage predictions on their stage's proposals;
    final_boxes: boxes decoded from the LAST stage's deltas [K,4].
    proposal_scores: when cfg.mult_proposal_score, scores are geometric-mean
    fused with the proposal objectness (sqrt(s*ps), the MULT_PROPOSAL_SCORE
    branch of the overridden first _forward_box, fsod_roi_heads.py:357-359 —
    effectively OFF in the published model, see config.ROIConfig)."""
    probs = [jax.nn.softmax(o.scores, axis=-1) for o in stage_outputs]
    scores = sum(probs) / len(probs)  # [K, C+1]
    if cfg.mult_proposal_score and proposal_scores is not None:
        scores = jnp.sqrt(jnp.maximum(scores * proposal_scores[:, None], 0.0))
    fg_scores = scores[:, : cfg.num_classes]  # drop background column

    boxes = clip_boxes(final_boxes, image_hw)
    # single fg class → plain NMS with strict > score filter; non-finite
    # predictions dropped (fast_rcnn_inference valid_mask, fast_rcnn.py:137-140)
    s = fg_scores[:, 0]
    finite = jnp.isfinite(s) & jnp.all(jnp.isfinite(boxes), axis=-1)
    valid = prop_valid & (s > cfg.score_thresh_test) & finite
    if getattr(cfg, "use_pallas_nms", False):
        from ..ops.pallas_nms import nms_mask_pallas, supported as _pallas_ok

        nms_fn = nms_mask_pallas if _pallas_ok(s.shape[0]) else nms_mask
    else:
        nms_fn = nms_mask
    keep = nms_fn(boxes, s, valid, cfg.nms_thresh_test)
    topk = min(cfg.detections_per_image, s.shape[0])
    sel_scores, sel_idx = jax.lax.top_k(jnp.where(keep, s, -1.0), topk)
    return Detections(
        boxes=boxes[sel_idx],
        scores=jnp.maximum(sel_scores, 0.0),
        classes=jnp.zeros((topk,), jnp.int32),
        valid=sel_scores > 0.0,
    )
