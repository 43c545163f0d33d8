"""Fixed-capacity masked non-maximum suppression.

TPU-native replacement for torchvision.ops.nms / detectron2 batched_nms
(detectron2.7z!layers/nms.py:10-31) used via ml_nms
(CenterNet2/centernet/modeling/layers/ml_nms.py:27) and fast_rcnn_inference.

Under XLA everything is static shape: boxes arrive as a fixed-K array with a
validity mask; suppression produces a keep-mask rather than a shrunken set.
The greedy sequential dependency of NMS is honored exactly by a peeling
fixpoint over the rank-ordered suppression DAG — sort-free (rank built by
direct score comparison) and O(depth) rounds of K-wide bool reductions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..structures.boxes import pairwise_iou


def nms_mask_sequential(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
) -> jnp.ndarray:
    """Reference greedy NMS via a K-step sequential loop (used as the
    cross-check oracle for the fixpoint implementation below)."""
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


def nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
) -> jnp.ndarray:
    """Greedy NMS. boxes [K,4], scores [K], valid [K] -> keep mask [K].

    Exactly reproduces torchvision nms semantics (descending-score greedy
    suppression, strict > threshold) but runs in O(D) rounds of K-wide
    vector ops, where D is the depth of the suppression DAG (typically ≤ ~10)
    — instead of K sequential steps. Peeling fixpoint:

      round: every undecided box with no higher-scored kept-or-undecided
      overlapper is KEPT; every undecided box overlapped by a kept box is
      REMOVED. Each round settles at least one suppression layer, so the
      while_loop exits after D rounds (dynamic condition — allowed in XLA).
    """
    k = boxes.shape[0]
    # NO SORT: the fixpoint only needs the suppression DAG, which a direct
    # rank comparison builds in place — argsort of K=1024 alone costs ~630 us
    # on TPU (more than all the rest of the NMS, tools/nms_bench.py), and
    # dropping it also drops the gather and the final scatter. Ties break by
    # original index, matching stable descending argsort (torchvision nms).
    iou = pairwise_iou(boxes, boxes)
    idx = jnp.arange(k)
    higher = (scores[:, None] > scores[None, :]) | (
        (scores[:, None] == scores[None, :]) & (idx[:, None] < idx[None, :])
    )
    # E[i, j]: higher-ranked i suppresses j. e kept as BOOL and consumed by
    # any-reductions: the loop re-reads e twice per round, so 1 byte/entry
    # instead of an f32 matmul operand cuts the dominant HBM traffic of the
    # whole decode+NMS stage 4x (tools/serving_profile.py phase table).
    e = (iou > iou_threshold) & higher & valid[:, None] & valid[None, :]

    def cond(state):
        kept, removed, undecided = state
        return jnp.any(undecided)

    def body(state):
        kept, removed, undecided = state
        active = kept | undecided
        # j has a live higher-scored overlapper
        blocked = jnp.any(e & active[:, None], axis=0)
        newly_kept = undecided & ~blocked
        kept2 = kept | newly_kept
        crushed = jnp.any(e & kept2[:, None], axis=0)
        newly_removed = undecided & crushed
        return kept2, removed | newly_removed, undecided & ~(newly_kept | newly_removed)

    kept0 = jnp.zeros((k,), dtype=bool)
    state = (kept0, kept0, valid)
    kept, _, _ = jax.lax.while_loop(cond, body, state)
    return kept


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
