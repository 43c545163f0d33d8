"""Loss functions for the CenterNet proposal stage and the cascade ROI stage.

TPU-native (masked, fixed-shape) re-derivations of:
  - penalty-reduced heatmap focal loss (CenterNet2/.../heatmap_focal_loss.py:5-87,
    the torch.jit.script'd hot loss) — here a plain jitted function;
  - ltrb IoU/gIoU loss (CenterNet2/.../iou_loss.py:5-63);
  - smooth-L1 (beta=0 → pure L1, d2 fast_rcnn box_reg_loss);
  - masked softmax cross-entropy (d2 fast_rcnn loss_cls).

All "gather positive indices" patterns become fixed-size padded index arrays
with weight masks, so shapes stay static under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def binary_heatmap_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    pos_inds: jnp.ndarray,
    pos_mask: jnp.ndarray,
    hm_mask: jnp.ndarray,
    *,
    beta: float = 4.0,
    gamma: float = 2.0,
    sigmoid_clamp: float = 1e-4,
    ignore_high_fp: float = -1.0,
):
    """Agnostic-heatmap focal loss (binary_heatmap_focal_loss, :51-87).

    logits:  [M] raw agn-hm predictions over all pyramid pixels
    targets: [M] rendered gaussian-ish heatmap in [0,1]
    pos_inds:[P] padded flat indices of positive pixels
    pos_mask:[P] validity of each padded positive
    hm_mask: [M] validity of each pixel (false for canvas padding)
    Returns (pos_loss_sum, neg_loss_sum) — caller applies pos/neg weights and
    the cross-device num_pos normalizer (fsod_rpn.py:719-726,771-772).
    """
    pred = jnp.clip(_sigmoid(logits), sigmoid_clamp, 1.0 - sigmoid_clamp)
    neg_weights = jnp.power(1.0 - targets, beta)
    pos_pred = pred[pos_inds]  # [P]
    pos_loss = jnp.log(pos_pred) * jnp.power(1.0 - pos_pred, gamma)
    pos_loss = jnp.where(pos_mask, pos_loss, 0.0)
    neg_loss = jnp.log(1.0 - pred) * jnp.power(pred, gamma) * neg_weights
    if ignore_high_fp > 0:
        neg_loss = neg_loss * (pred < ignore_high_fp).astype(neg_loss.dtype)
    neg_loss = jnp.where(hm_mask, neg_loss, 0.0)
    return -jnp.sum(pos_loss), -jnp.sum(neg_loss)


def _sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x))


def heatmap_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    pos_inds: jnp.ndarray,
    labels: jnp.ndarray,
    pos_mask: jnp.ndarray,
    hm_mask: jnp.ndarray,
    *,
    alpha: float = 0.25,
    beta: float = 4.0,
    gamma: float = 2.0,
    sigmoid_clamp: float = 1e-4,
    ignore_high_fp: float = -1.0,
):
    """Class-aware heatmap focal loss (heatmap_focal_loss, :5-48). logits [M,C]."""
    pred = jnp.clip(_sigmoid(logits), sigmoid_clamp, 1.0 - sigmoid_clamp)
    neg_weights = jnp.power(1.0 - targets, beta)
    pos_pred = pred[pos_inds, labels]  # [P]
    pos_loss = jnp.log(pos_pred) * jnp.power(1.0 - pos_pred, gamma)
    pos_loss = jnp.where(pos_mask, pos_loss, 0.0)
    neg_loss = jnp.log(1.0 - pred) * jnp.power(pred, gamma) * neg_weights
    if ignore_high_fp > 0:
        neg_loss = neg_loss * (pred < ignore_high_fp).astype(neg_loss.dtype)
    neg_loss = jnp.where(hm_mask[:, None], neg_loss, 0.0)
    pos_sum, neg_sum = jnp.sum(pos_loss), jnp.sum(neg_loss)
    if alpha >= 0:
        return -alpha * pos_sum, -(1.0 - alpha) * neg_sum
    return -pos_sum, -neg_sum


def iou_loss_ltrb(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    weight: jnp.ndarray | None = None,
    *,
    loss_type: str = "giou",
) -> jnp.ndarray:
    """IOULoss on (l,t,r,b) distance parameterization (iou_loss.py:5-63).

    pred/target: [..., 4] nonneg distances; returns elementwise loss [...].
    Invalid rows must be masked by passing weight=0 for them.
    """
    pl_, pt, pr, pb = pred[..., 0], pred[..., 1], pred[..., 2], pred[..., 3]
    tl, tt, tr, tb = target[..., 0], target[..., 1], target[..., 2], target[..., 3]

    target_area = (tl + tr) * (tt + tb)
    pred_area = (pl_ + pr) * (pt + pb)

    w_intersect = jnp.minimum(pl_, tl) + jnp.minimum(pr, tr)
    h_intersect = jnp.minimum(pb, tb) + jnp.minimum(pt, tt)
    g_w = jnp.maximum(pl_, tl) + jnp.maximum(pr, tr)
    g_h = jnp.maximum(pb, tb) + jnp.maximum(pt, tt)
    ac_union = g_w * g_h

    area_intersect = w_intersect * h_intersect
    area_union = target_area + pred_area - area_intersect
    ious = (area_intersect + 1.0) / (area_union + 1.0)
    if loss_type == "iou":
        losses = -jnp.log(jnp.maximum(ious, 1e-12))
    elif loss_type == "linear_iou":
        losses = 1.0 - ious
    elif loss_type == "giou":
        gious = ious - (ac_union - area_union) / jnp.maximum(ac_union, 1e-12)
        losses = 1.0 - gious
    else:
        raise ValueError(loss_type)
    if weight is not None:
        losses = losses * weight
    return losses


def smooth_l1_loss(pred: jnp.ndarray, target: jnp.ndarray, beta: float) -> jnp.ndarray:
    """fvcore smooth_l1_loss; beta=0 degenerates to |x| (the live setting)."""
    diff = jnp.abs(pred - target)
    if beta <= 0:
        return diff
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def softmax_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """Mean CE over valid rows (d2 cross_entropy(..., reduction='mean'))."""
    logz = jax.nn.logsumexp(logits, axis=-1)
    ll = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    loss = jnp.where(valid, logz - ll, 0.0)
    return jnp.sum(loss) / jnp.maximum(jnp.sum(valid), 1)
