"""Fixed-capacity masked non-maximum suppression.

TPU-native replacement for torchvision.ops.nms / detectron2 batched_nms
(detectron2.7z!layers/nms.py:10-31) used via ml_nms
(CenterNet2/centernet/modeling/layers/ml_nms.py:27) and fast_rcnn_inference.

Under XLA everything is static shape: boxes arrive as a fixed-K array with a
validity mask; suppression produces a keep-mask rather than a shrunken set.
The greedy sequential dependency of NMS is honored exactly via lax.fori_loop
over score-sorted candidates, each step doing one K-wide VPU update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..structures.boxes import pairwise_iou


def nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
) -> jnp.ndarray:
    """Greedy NMS. boxes [K,4], scores [K], valid [K] -> keep mask [K].

    Exactly reproduces torchvision nms semantics: process candidates in
    descending score order; a candidate is kept iff not suppressed by any
    previously kept box with IoU > threshold (strict >).
    """
    k = boxes.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    order = jnp.argsort(jnp.where(valid, scores, neg_inf), descending=True)
    sboxes = boxes[order]
    svalid = valid[order]
    iou = pairwise_iou(sboxes, sboxes)  # [K,K]
    suppress_pair = iou > iou_threshold  # does kept i suppress j

    def body(i, state):
        keep, suppressed = state
        keep_i = svalid[i] & ~suppressed[i]
        keep = keep.at[i].set(keep_i)
        row = suppress_pair[i] & keep_i
        suppressed = suppressed | row
        return keep, suppressed

    keep0 = jnp.zeros((k,), dtype=bool)
    sup0 = jnp.zeros((k,), dtype=bool)
    keep_sorted, _ = jax.lax.fori_loop(0, k, body, (keep0, sup0))
    # scatter back to original order
    keep = jnp.zeros((k,), dtype=bool).at[order].set(keep_sorted)
    return keep


def batched_nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
) -> jnp.ndarray:
    """Class-aware NMS via the coordinate-offset trick (d2 batched_nms)."""
    if boxes.shape[0] == 0:
        return valid
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0)) + 1.0
    offsets = classes.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    return nms_mask(shifted, scores, valid, iou_threshold)


def keep_top_scores(scores: jnp.ndarray, valid: jnp.ndarray, k: int) -> jnp.ndarray:
    """Mask keeping entries whose score is >= the k-th largest valid score.

    Mirrors the reference's post-NMS trim (fsod_rpn.py:1198-1206), which uses
    kthvalue + `>=` comparison — ties at the threshold are all kept there; we
    reproduce that semantic (may keep > k on ties, as the reference does).
    """
    n = scores.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    masked = jnp.where(valid, scores, neg_inf)
    num_valid = jnp.sum(valid)
    kth = jnp.sort(masked, descending=True)[jnp.minimum(k, n) - 1]
    # Only trim when there are more than k valid entries.
    return jnp.where(num_valid > k, valid & (masked >= kth), valid)
