"""CenterNet proposal generation: decode, NMS, and losses (pure functions).

Re-derivation of the live half of fewx/modeling/fsod/fsod_rpn.py:491-1343
(`CenterNet` with only_proposal=True, with_agn_hm=True): FCOS-style grid
decode of the agnostic heatmap + ltrb regression into fixed-K proposals, and
the training losses (binary heatmap focal + gIoU). All dynamic-count logic
(score threshold → topk → NMS → kthvalue trim, :1116-1210) becomes masked
fixed-capacity tensors.
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CenterNetConfig
from ..ops.heatmap import (
    CenterNetTargets,
    compute_grids,
    flat_size_ranges,
    flat_strides,
    level_grid_shapes,
    render_targets,
)
from ..ops.losses import binary_heatmap_focal_loss, iou_loss_ltrb
from ..ops.nms import keep_top_scores, nms_mask
from ..structures.boxes import ltrb_to_xyxy
from ..structures.instances import Proposals


def _level_valid_mask(canvas_hw, strides, image_hw) -> jnp.ndarray:
    """[M] mask of grid cells the reference would have produced.

    The reference pads each image only to ÷32 (ImageList.from_tensors,
    fsod_cen.py:546); our canvas may be larger for jit-cache friendliness.
    Cells beyond ceil32(image_size) never exist in the reference, so they are
    masked out of the candidate set. image_hw are traced scalars (h, w)."""
    h32 = jnp.ceil(image_hw[0] / 32.0) * 32.0
    w32 = jnp.ceil(image_hw[1] / 32.0) * 32.0
    masks = []
    for (hl, wl), s in zip(level_grid_shapes(canvas_hw, strides), strides):
        iy = jnp.arange(hl, dtype=jnp.float32)[:, None]
        ix = jnp.arange(wl, dtype=jnp.float32)[None, :]
        m = (iy < h32 / s) & (ix < w32 / s)
        masks.append(m.reshape(-1))
    return jnp.concatenate(masks)


def decode_proposals(
    agn_hms: Sequence[jnp.ndarray],
    bbox_regs: Sequence[jnp.ndarray],
    cfg: CenterNetConfig,
    canvas_hw: Tuple[int, int],
    image_hw,
    *,
    training: bool,
    nms_budget: int | None = None,
) -> Proposals:
    """Decode per-level head outputs for ONE image into fixed-K proposals.

    agn_hms[l]: [H_l, W_l, 1] logits; bbox_regs[l]: [H_l, W_l, 4] (relu'd,
    in stride units). Mirrors predict_instances/predict_single_level/
    nms_and_topK (fsod_rpn.py:1100-1210):
      scores = sqrt(sigmoid(hm))  (with_agn_hm sqrt transform :1175-1176)
      per-level score threshold + pre-NMS topk, cross-level concat,
      class-agnostic NMS, kthvalue-style post-NMS trim.
    """
    strides = cfg.fpn_strides
    grids = compute_grids(canvas_hw, strides)  # [M,2]
    valid_canvas = _level_valid_mask(canvas_hw, strides, image_hw)

    pre_topk = cfg.pre_nms_topk_train if training else cfg.pre_nms_topk_test
    post_topk = cfg.post_nms_topk_train if training else cfg.post_nms_topk_test
    nms_th = cfg.nms_thresh_train if training else cfg.nms_thresh_test
    if nms_budget is None:
        # training needs the full post-NMS keep capacity; the inference
        # builders pass config.StaticShapeConfig.nms_budget_test explicitly
        # (round 5); 1024 remains the fallback for direct test-path calls
        nms_budget = max(2048, post_topk) if training else 1024

    shapes = level_grid_shapes(canvas_hw, strides)
    offsets = np.cumsum([0] + [hl * wl for hl, wl in shapes])

    cand_scores: List[jnp.ndarray] = []
    cand_boxes: List[jnp.ndarray] = []
    cand_valid: List[jnp.ndarray] = []
    for li, s in enumerate(strides):
        hm = jax.nn.sigmoid(agn_hms[li].reshape(-1).astype(jnp.float32))  # [Ml]
        reg = bbox_regs[li].reshape(-1, 4).astype(jnp.float32) * s  # [Ml,4]
        g = grids[offsets[li] : offsets[li + 1]]
        vmask = valid_canvas[offsets[li] : offsets[li + 1]]
        cand = (hm > cfg.score_thresh) & vmask
        k = min(pre_topk, hm.shape[0])
        # top-k by thresholded score (reference: topk of candidates, :1157-1162)
        masked = jnp.where(cand, hm, -1.0)
        top_scores, top_idx = jax.lax.top_k(masked, k)
        boxes = ltrb_to_xyxy(g[top_idx], reg[top_idx])
        # sqrt score transform under with_agn_hm (:1175-1176)
        cand_scores.append(jnp.sqrt(jnp.maximum(top_scores, 0.0)))
        cand_boxes.append(boxes)
        cand_valid.append(top_scores > 0.0)

    scores = jnp.concatenate(cand_scores)
    boxes = jnp.concatenate(cand_boxes)
    valid = jnp.concatenate(cand_valid)

    # Cap the NMS working set (TPU budget; documented divergence: the
    # reference NMS'es up to pre_topk*L candidates. With the 0.6/0.9
    # thresholds the post-trim survivor sets are essentially identical.)
    if scores.shape[0] > nms_budget:
        top_scores, top_idx = jax.lax.top_k(jnp.where(valid, scores, -1.0), nms_budget)
        scores = top_scores
        boxes = boxes[top_idx]
        valid = top_scores > 0.0

    if getattr(cfg, "use_pallas_nms", False):
        from ..ops.pallas_nms import nms_mask_pallas, supported as _pallas_ok

        nms_fn = nms_mask_pallas if _pallas_ok(scores.shape[0]) else nms_mask
    else:
        nms_fn = nms_mask
    keep = nms_fn(boxes, scores, valid, nms_th)
    post_topk = min(post_topk, scores.shape[0])  # small canvases have fewer cells
    keep = keep_top_scores(scores, keep, post_topk)

    # Compact to the post-NMS capacity.
    sel_scores, sel_idx = jax.lax.top_k(jnp.where(keep, scores, -1.0), post_topk)
    return Proposals(
        boxes=boxes[sel_idx],
        scores=jnp.maximum(sel_scores, 0.0),
        valid=sel_scores > 0.0,
    )


def centernet_losses(
    agn_hms: Sequence[jnp.ndarray],
    bbox_regs: Sequence[jnp.ndarray],
    targets: CenterNetTargets,
    cfg: CenterNetConfig,
    canvas_valid: jnp.ndarray,
    *,
    num_pos_avg: jnp.ndarray,
    reg_norm: jnp.ndarray | None = None,
):
    """Training losses for ONE image (fsod_rpn.py:702-779, only_proposal path).

    canvas_valid: [M] mask excluding canvas-slack cells from the neg loss.
    num_pos_avg: cross-replica mean positive count (reduce_sum semantics,
    :719-726) — computed by the caller so the psum happens once per step.
    reg_norm: cross-replica mean reg-pixel count (:751-754); defaults to the
    local count for single-replica runs.
    Returns dict(loss_centernet_loc, loss_centernet_agn_pos, loss_centernet_agn_neg).
    """
    agn_flat = jnp.concatenate([h.reshape(-1) for h in agn_hms]).astype(jnp.float32)
    reg_flat = jnp.concatenate([r.reshape(-1, 4) for r in bbox_regs]).astype(jnp.float32)

    # localization: gIoU over pixels with a target (reg_targets.max >= 0, :744)
    reg_valid = (jnp.max(targets.reg_targets, axis=1) >= 0) & canvas_valid
    # NOT_NORM_REG=True → unit weights (:749-750)
    weights = reg_valid.astype(jnp.float32)
    reg_losses = iou_loss_ltrb(
        jnp.maximum(reg_flat, 0.0), jnp.maximum(targets.reg_targets, 0.0),
        weights, loss_type=cfg.loc_loss_type,
    )
    if reg_norm is None:
        reg_norm = jnp.maximum(jnp.sum(weights), 1.0)
    loss_loc = cfg.reg_weight * jnp.sum(reg_losses) / reg_norm

    pos_sum, neg_sum = binary_heatmap_focal_loss(
        agn_flat,
        targets.heatmap,
        targets.pos_inds,
        targets.pos_mask,
        canvas_valid,
        beta=cfg.hm_focal_beta,
        gamma=cfg.loss_gamma,
        sigmoid_clamp=cfg.sigmoid_clamp,
        ignore_high_fp=cfg.ignore_high_fp,
    )
    return {
        "loss_centernet_loc": loss_loc,
        "loss_centernet_agn_pos": cfg.pos_weight * pos_sum / num_pos_avg,
        "loss_centernet_agn_neg": cfg.neg_weight * neg_sum / num_pos_avg,
    }
