"""CenterNet grid computation and ground-truth target rendering.

Vectorized, static-shape re-derivation of the reference's target assignment
(fewx/modeling/fsod/fsod_rpn.py:782-1065): per-pixel ltrb regression targets
selected by weighted center distance, agnostic gaussian-ish heatmaps, and the
flat positive-pixel indices used by the focal loss. Ground truth arrives as a
fixed-N padded GroundTruth; all M x N matrices are static shape.
"""

from __future__ import annotations

import math
from typing import List, NamedTuple, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

INF = 1e8


def level_grid_shapes(canvas_hw: Tuple[int, int], strides: Sequence[int]):
    """[(h_l, w_l)] for each stride; canvas is padded to divisibility."""
    h, w = canvas_hw
    return [(h // s, w // s) for s in strides]


def compute_grids(canvas_hw: Tuple[int, int], strides: Sequence[int]) -> jnp.ndarray:
    """Concatenated [M, 2] grid-point (x, y) image coords (fsod_rpn.py:782-800).

    Per level: (x, y) = (j * stride, i * stride) + stride // 2, row-major.
    Static given the padded canvas, so built in numpy at trace time.
    """
    out = []
    for (hl, wl), s in zip(level_grid_shapes(canvas_hw, strides), strides):
        xs = np.arange(wl, dtype=np.float32) * s + s // 2
        ys = np.arange(hl, dtype=np.float32) * s + s // 2
        gx, gy = np.meshgrid(xs, ys)  # [hl, wl]
        out.append(np.stack([gx.reshape(-1), gy.reshape(-1)], axis=1))
    return jnp.asarray(np.concatenate(out, axis=0))


def flat_strides(canvas_hw, strides) -> jnp.ndarray:
    """[M] stride of each concatenated grid point."""
    reps = [hl * wl for (hl, wl) in level_grid_shapes(canvas_hw, strides)]
    return jnp.asarray(np.repeat(np.asarray(strides, np.float32), reps))


def flat_size_ranges(canvas_hw, strides, sizes_of_interest) -> jnp.ndarray:
    """[M, 2] per-pixel size-of-interest range."""
    reps = [hl * wl for (hl, wl) in level_grid_shapes(canvas_hw, strides)]
    rows = np.repeat(np.asarray(sizes_of_interest, np.float32), reps, axis=0)
    return jnp.asarray(rows)


class CenterNetTargets(NamedTuple):
    reg_targets: jnp.ndarray  # [M, 4] ltrb / stride; -INF rows = no target
    heatmap: jnp.ndarray  # [M] agnostic heatmap in [0, 1]
    pos_inds: jnp.ndarray  # [N*L] padded flat indices of positive pixels
    pos_mask: jnp.ndarray  # [N*L] validity


def render_targets(
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    grids: jnp.ndarray,
    strides_m: jnp.ndarray,
    size_ranges: jnp.ndarray,
    canvas_hw: Tuple[int, int],
    strides: Sequence[int],
    sizes_of_interest: Sequence[Tuple[float, float]],
    *,
    hm_min_overlap: float = 0.8,
    min_radius: int = 4,
) -> CenterNetTargets:
    """Render CenterNet targets for ONE image (vmap over batch outside).

    gt_boxes [N,4] padded xyxy, gt_valid [N] bool.
    Mirrors fsod_rpn.py:_get_ground_truth (:803-901) + _get_label_inds (:904-956)
    with masks replacing boolean indexing.
    """
    m = grids.shape[0]
    n = gt_boxes.shape[0]
    delta = (1.0 - hm_min_overlap) / (1.0 + hm_min_overlap)

    gx = grids[:, 0][:, None]  # [M,1]
    gy = grids[:, 1][:, None]
    bx1 = gt_boxes[:, 0][None, :]  # [1,N]
    by1 = gt_boxes[:, 1][None, :]
    bx2 = gt_boxes[:, 2][None, :]
    by2 = gt_boxes[:, 3][None, :]

    l = gx - bx1
    t = gy - by1
    r = bx2 - gx
    b = by2 - gy
    reg = jnp.stack([l, t, r, b], axis=2)  # [M,N,4]

    boxes_area = jnp.maximum((bx2 - bx1) * (by2 - by1), 0.0)[0]  # [N]
    cx = (bx1 + bx2) / 2.0  # [1,N]
    cy = (by1 + by2) / 2.0
    sm = strides_m[:, None]  # [M,1]
    # discretized center snapped to this pixel's stride grid (:860-861)
    cdx = (cx / sm).astype(jnp.int32).astype(jnp.float32) * sm + sm / 2.0  # [M,N]
    cdy = (cy / sm).astype(jnp.int32).astype(jnp.float32) * sm + sm / 2.0

    is_peak = ((gx - cdx) ** 2 + (gy - cdy) ** 2) == 0  # [M,N]
    is_in_boxes = jnp.min(reg, axis=2) > 0  # [M,N]
    is_center3x3 = (
        (jnp.abs(gx - cdx) <= sm) & (jnp.abs(gy - cdy) <= sm) & is_in_boxes
    )  # [M,N] (:1049-1065)
    crit = jnp.sqrt((l + r) ** 2 + (t + b) ** 2) / 2.0  # [M,N] (:985-986)
    is_cared = (crit >= size_ranges[:, 0:1]) & (crit <= size_ranges[:, 1:2])
    reg_mask = is_center3x3 & is_cared & gt_valid[None, :]

    dist2 = (gx - cx) ** 2 + (gy - cy) ** 2  # [M,N]
    dist2 = jnp.where(is_peak, 0.0, dist2)
    radius2 = jnp.maximum(delta**2 * 2.0 * boxes_area, float(min_radius**2))  # [N]
    weighted_dist2 = dist2 / radius2[None, :]  # [M,N]

    # --- reg targets: nearest (weighted) masked gt per pixel (:992-1003)
    wd_masked = jnp.where(reg_mask, weighted_dist2, INF)
    min_dist = jnp.min(wd_masked, axis=1)  # [M]
    min_inds = jnp.argmin(wd_masked, axis=1)  # [M]
    reg_targets = jnp.take_along_axis(reg, min_inds[:, None, None].repeat(4, 2), axis=1)[
        :, 0, :
    ]  # [M,4]
    reg_targets = jnp.where((min_dist == INF)[:, None], -INF, reg_targets)
    reg_targets = reg_targets / strides_m[:, None]  # (:896-897)

    # --- agnostic heatmap (:1024-1035): min over *valid* gt only
    wd_hm = jnp.where(gt_valid[None, :], weighted_dist2, INF)
    heatmap = jnp.exp(-jnp.min(wd_hm, axis=1))
    heatmap = jnp.where(heatmap < 1e-4, 0.0, heatmap)

    # --- positive indices (_get_label_inds :904-956), B=1 layout:
    # flat index = level_base + iy * w_l + ix
    shapes = level_grid_shapes(canvas_hw, strides)
    level_bases = np.cumsum([0] + [hl * wl for hl, wl in shapes])[:-1]
    cxn = cx[0]  # [N]
    cyn = cy[0]
    # per-gt diagonal/2 criterion for level assignment (assign_fpn_level :959-975)
    diag = jnp.sqrt((bx2 - bx1) ** 2 + (by2 - by1) ** 2)[0] / 2.0  # [N]
    pos_list = []
    mask_list = []
    for li, s in enumerate(strides):
        hl, wl = shapes[li]
        ix = (cxn / s).astype(jnp.int32)
        iy = (cyn / s).astype(jnp.int32)
        idx = level_bases[li] + iy * wl + ix  # [N]
        lo, hi = sizes_of_interest[li]
        cared = (diag >= lo) & (diag <= hi) & gt_valid
        pos_list.append(jnp.clip(idx, 0, m - 1))
        mask_list.append(cared)
    pos_inds = jnp.concatenate(pos_list)  # [L*N]
    pos_mask = jnp.concatenate(mask_list)
    return CenterNetTargets(reg_targets, heatmap, pos_inds, pos_mask)


def more_pos_inds(
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    reg_pred: jnp.ndarray,
    canvas_hw: Tuple[int, int],
    strides: Sequence[int],
    sizes_of_interest: Sequence[Tuple[float, float]],
    *,
    more_pos_topk: int = 9,
    more_pos_thresh: float = 0.2,
    loc_loss_type: str = "giou",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MORE_POS positive mining (_add_more_pos/_get_c33_inds,
    fsod_rpn.py:1213-1343): pixels in each object's center-3x3 region whose
    regression loss is below the per-object kth-smallest (capped at
    more_pos_thresh) become additional positives.

    gt_boxes [N,4] padded; reg_pred [M,4] (stride units, detached by caller).
    Returns (pos_inds [N*L*9], pos_mask [N*L*9]).
    """
    from .losses import iou_loss_ltrb

    shapes = level_grid_shapes(canvas_hw, strides)
    level_bases = np.cumsum([0] + [hl * wl for hl, wl in shapes])[:-1]
    m = reg_pred.shape[0]
    n = gt_boxes.shape[0]
    num_l = len(strides)
    k = 9
    dx = jnp.asarray([-1, 0, 1, -1, 0, 1, -1, 0, 1])
    dy = jnp.asarray([-1, -1, -1, 0, 0, 0, 1, 1, 1])

    cx = (gt_boxes[:, 0] + gt_boxes[:, 2]) / 2.0  # [N]
    cy = (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2.0
    diag = jnp.sqrt(
        (gt_boxes[:, 2] - gt_boxes[:, 0]) ** 2
        + (gt_boxes[:, 3] - gt_boxes[:, 1]) ** 2
    ) / 2.0

    inds_l, mask_l, regs_l, level_ok_l = [], [], [], []
    for li, s in enumerate(strides):
        hl, wl = shapes[li]
        ix = (cx / s).astype(jnp.int32)  # [N]
        iy = (cy / s).astype(jnp.int32)
        gx = ix.astype(jnp.float32) * s + s // 2  # center grid coords (:1285)
        gy = iy.astype(jnp.float32) * s + s // 2
        l = (gx - gt_boxes[:, 0]) / s
        t = (gy - gt_boxes[:, 1]) / s
        r = (gt_boxes[:, 2] - gx) / s
        b = (gt_boxes[:, 3] - gy) / s
        reg = jnp.stack([l, t, r, b], axis=1)  # [N,4] stride units (:1286-1291)
        lo, hi = sizes_of_interest[li]
        level_ok = (
            (jnp.min(reg, axis=1) >= 0) & (diag >= lo) & (diag <= hi) & gt_valid
        )  # [N] (:1298-1299)

        cix = ix[:, None] + dx[None, :]  # [N,9]
        ciy = iy[:, None] + dy[None, :]
        idx = level_bases[li] + ciy * wl + cix
        inb = (cix >= 0) & (cix < wl) & (ciy >= 0) & (ciy < hl)
        # shifted regression targets for the 3x3 offsets: l-dx, t-dy, r+dx,
        # b+dy (transcribes the column edits at :1317-1325)
        dxf = dx.astype(jnp.float32)
        dyf = dy.astype(jnp.float32)
        c33 = jnp.stack(
            [reg[:, None, 0] + dxf[None, :] * -1.0,
             reg[:, None, 1] + dyf[None, :] * -1.0,
             reg[:, None, 2] + dxf[None, :],
             reg[:, None, 3] + dyf[None, :]],
            axis=2,
        )  # [N,9,4]
        ok = inb & (jnp.min(c33, axis=2) >= 0)  # [N,9] (:1326)
        inds_l.append(jnp.clip(idx, 0, m - 1))
        mask_l.append(ok)
        regs_l.append(c33)
        level_ok_l.append(level_ok)

    inds = jnp.stack(inds_l, axis=1)  # [N,L,9]
    masks = jnp.stack(mask_l, axis=1)
    regs = jnp.stack(regs_l, axis=1)  # [N,L,9,4]
    level_ok = jnp.stack(level_ok_l, axis=1)  # [N,L]

    pred = reg_pred[inds.reshape(-1)].reshape(n, num_l, k, 4)
    loss = iou_loss_ltrb(pred, jnp.clip(regs, 0.0), None, loss_type=loc_loss_type)
    loss = jnp.where(masks & gt_valid[:, None, None], loss, INF)
    # the true center (k=4) gets loss 0 where the level carries the object (:1231)
    loss = loss.at[:, :, 4].set(jnp.where(level_ok, 0.0, loss[:, :, 4]))
    flat = loss.reshape(n, num_l * k)
    kth = jnp.sort(flat, axis=1)[:, min(more_pos_topk, num_l * k) - 1]  # [N]
    thresh = jnp.minimum(kth, more_pos_thresh)  # (:1236-1238)
    new_pos = loss < thresh[:, None, None]  # strict < (:1239)
    return inds.reshape(-1), (new_pos & gt_valid[:, None, None]).reshape(-1)
