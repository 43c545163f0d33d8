"""Box operations on plain [..., 4] xyxy arrays.

TPU-native replacement for detectron2's Boxes class and Box2BoxTransform
(detectron2.7z!structures/boxes.py, detectron2.7z!modeling/box_regression.py:42-117).
Everything is functional, static-shape, and differentiable where it matters.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# d2's Box2BoxTransform scale clamp: log(1000/16)
SCALE_CLAMP = math.log(1000.0 / 16.0)


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes, shape [..., 4] -> [...]."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def nonempty_mask(boxes: jnp.ndarray, threshold: float = 0.0) -> jnp.ndarray:
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return (w > threshold) & (h > threshold)


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix [N, M] between two xyxy box sets [N,4], [M,4].

    Matches detectron2.structures.pairwise_iou semantics: intersection over
    union with zero IoU for empty boxes.
    """
    a1 = area(boxes1)  # [N]
    a2 = area(boxes2)  # [M]
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])  # [N,M,2]
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])  # [N,M,2]
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]  # [N,M]
    union = a1[:, None] + a2[None, :] - inter
    return jnp.where(inter > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def clip_boxes(boxes: jnp.ndarray, image_hw) -> jnp.ndarray:
    """Clip xyxy boxes to [0,w] x [0,h]. image_hw = (h, w) scalars or arrays."""
    h, w = image_hw
    x1 = jnp.clip(boxes[..., 0], 0.0, w)
    y1 = jnp.clip(boxes[..., 1], 0.0, h)
    x2 = jnp.clip(boxes[..., 2], 0.0, w)
    y2 = jnp.clip(boxes[..., 3], 0.0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def encode_deltas(src_boxes: jnp.ndarray, target_boxes: jnp.ndarray, weights) -> jnp.ndarray:
    """Box2BoxTransform.get_deltas (box_regression.py:42-76): (dx,dy,dw,dh)
    mapping src (proposal) to target (gt), scaled by `weights` (wx,wy,ww,wh)."""
    sw = src_boxes[..., 2] - src_boxes[..., 0]
    sh = src_boxes[..., 3] - src_boxes[..., 1]
    scx = src_boxes[..., 0] + 0.5 * sw
    scy = src_boxes[..., 1] + 0.5 * sh

    tw = target_boxes[..., 2] - target_boxes[..., 0]
    th = target_boxes[..., 3] - target_boxes[..., 1]
    tcx = target_boxes[..., 0] + 0.5 * tw
    tcy = target_boxes[..., 1] + 0.5 * th

    wx, wy, ww, wh = weights
    eps = 1e-12
    dx = wx * (tcx - scx) / jnp.maximum(sw, eps)
    dy = wy * (tcy - scy) / jnp.maximum(sh, eps)
    dw = ww * jnp.log(jnp.maximum(tw, eps) / jnp.maximum(sw, eps))
    dh = wh * jnp.log(jnp.maximum(th, eps) / jnp.maximum(sh, eps))
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def apply_deltas(deltas: jnp.ndarray, boxes: jnp.ndarray, weights) -> jnp.ndarray:
    """Box2BoxTransform.apply_deltas (box_regression.py:77-117): decode
    class-agnostic deltas [..., 4] onto proposal boxes [..., 4] (f32)."""
    deltas = deltas.astype(jnp.float32)
    boxes = boxes.astype(jnp.float32)
    widths = boxes[..., 2] - boxes[..., 0]
    heights = boxes[..., 3] - boxes[..., 1]
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights

    wx, wy, ww, wh = weights
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, SCALE_CLAMP)
    dh = jnp.minimum(deltas[..., 3] / wh, SCALE_CLAMP)

    pred_ctr_x = dx * widths + ctr_x
    pred_ctr_y = dy * heights + ctr_y
    pred_w = jnp.exp(dw) * widths
    pred_h = jnp.exp(dh) * heights

    return jnp.stack(
        [
            pred_ctr_x - 0.5 * pred_w,
            pred_ctr_y - 0.5 * pred_h,
            pred_ctr_x + 0.5 * pred_w,
            pred_ctr_y + 0.5 * pred_h,
        ],
        axis=-1,
    )


def ltrb_to_xyxy(grids: jnp.ndarray, ltrb: jnp.ndarray) -> jnp.ndarray:
    """Decode FCOS-style (l,t,r,b) distances at grid centers to xyxy boxes.

    Mirrors fsod_rpn.py:1164-1173 including the +0.01 min-extent guard that
    avoids degenerate boxes entering the ROI heads."""
    x1 = grids[..., 0] - ltrb[..., 0]
    y1 = grids[..., 1] - ltrb[..., 1]
    x2 = grids[..., 0] + ltrb[..., 2]
    y2 = grids[..., 1] + ltrb[..., 3]
    x2 = jnp.maximum(x2, x1 + 0.01)
    y2 = jnp.maximum(y2, y1 + 0.01)
    return jnp.stack([x1, y1, x2, y2], axis=-1)
