"""Golden test: CenterNet ground-truth rendering vs a direct numpy
transcription of the reference math (fsod_rpn.py:803-956)."""

import numpy as np
import pytest

import jax.numpy as jnp

from faster_orefsdet_tpu.config import get_config
from faster_orefsdet_tpu.ops.heatmap import (
    compute_grids,
    flat_size_ranges,
    flat_strides,
    level_grid_shapes,
    render_targets,
)

INF = 1e8


def _reference_targets(gt_boxes, canvas_hw, strides, soi, hm_min_overlap=0.8,
                       min_radius=4):
    """Numpy transcription of _get_ground_truth for one image (B=1)."""
    shapes = [(canvas_hw[0] // s, canvas_hw[1] // s) for s in strides]
    grids = []
    for (hl, wl), s in zip(shapes, strides):
        xs = np.arange(wl) * s + s // 2
        ys = np.arange(hl) * s + s // 2
        gx, gy = np.meshgrid(xs, ys)
        grids.append(np.stack([gx.ravel(), gy.ravel()], 1))
    grids = np.concatenate(grids).astype(np.float64)
    m = len(grids)
    strides_m = np.concatenate(
        [np.full(hl * wl, s, np.float64) for (hl, wl), s in zip(shapes, strides)])
    ranges = np.concatenate(
        [np.tile(np.asarray(soi[i], np.float64), (hl * wl, 1))
         for i, (hl, wl) in enumerate(shapes)])
    delta = (1 - hm_min_overlap) / (1 + hm_min_overlap)

    boxes = np.asarray(gt_boxes, np.float64)
    n = len(boxes)
    l = grids[:, 0:1] - boxes[None, :, 0]
    t = grids[:, 1:2] - boxes[None, :, 1]
    r = boxes[None, :, 2] - grids[:, 0:1]
    b = boxes[None, :, 3] - grids[:, 1:2]
    reg = np.stack([l, t, r, b], 2)  # [M,N,4]
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    cx = (boxes[:, 0] + boxes[:, 2]) / 2
    cy = (boxes[:, 1] + boxes[:, 3]) / 2
    sm = strides_m[:, None]
    cdx = (cx[None] / sm).astype(np.int64) * sm + sm / 2
    cdy = (cy[None] / sm).astype(np.int64) * sm + sm / 2
    is_peak = ((grids[:, 0:1] - cdx) ** 2 + (grids[:, 1:2] - cdy) ** 2) == 0
    is_in = reg.min(2) > 0
    c33 = (np.abs(grids[:, 0:1] - cdx) <= sm) & (np.abs(grids[:, 1:2] - cdy) <= sm) & is_in
    crit = np.sqrt((l + r) ** 2 + (t + b) ** 2) / 2
    cared = (crit >= ranges[:, 0:1]) & (crit <= ranges[:, 1:2])
    mask = c33 & cared
    dist2 = (grids[:, 0:1] - cx[None]) ** 2 + (grids[:, 1:2] - cy[None]) ** 2
    dist2[is_peak] = 0
    radius2 = np.maximum(delta**2 * 2 * area, min_radius**2)
    wd = dist2 / radius2[None]

    wdm = wd.copy()
    wdm[~mask] = INF
    mind = wdm.min(1)
    mini = wdm.argmin(1)
    reg_t = reg[np.arange(m), mini]
    reg_t[mind == INF] = -INF
    reg_t = reg_t / strides_m[:, None]

    hm = np.exp(-wd.min(1))
    hm[hm < 1e-4] = 0

    # pos inds (B=1)
    level_bases = np.cumsum([0] + [hl * wl for hl, wl in shapes])[:-1]
    diag = np.sqrt((boxes[:, 2] - boxes[:, 0]) ** 2 + (boxes[:, 3] - boxes[:, 1]) ** 2) / 2
    pos = []
    for li, s in enumerate(strides):
        hl, wl = shapes[li]
        ix = (cx / s).astype(np.int64)
        iy = (cy / s).astype(np.int64)
        idx = level_bases[li] + iy * wl + ix
        lo, hi = soi[li]
        for ni in range(n):
            if lo <= diag[ni] <= hi:
                pos.append(idx[ni])
    return reg_t, hm, sorted(pos)


def test_render_targets_matches_reference_math():
    canvas_hw = (96, 128)
    strides = [8, 16, 32]
    soi = [(0, 64), (48, 192), (128, 1000000)]
    rng = np.random.default_rng(0)
    for trial in range(3):
        n = 4
        xy = rng.uniform(4, 60, (n, 2))
        wh = rng.uniform(8, 50, (n, 2))
        boxes = np.concatenate([xy, np.minimum(xy + wh, [126, 94])], 1).astype(np.float32)
        valid = np.asarray([True, True, True, False])
        ref_reg, ref_hm, ref_pos = _reference_targets(boxes[:3], canvas_hw, strides, soi)

        grids = compute_grids(canvas_hw, strides)
        sm = flat_strides(canvas_hw, strides)
        sr = flat_size_ranges(canvas_hw, strides, soi)
        tgt = render_targets(
            jnp.asarray(boxes), jnp.asarray(valid), grids, sm, sr,
            canvas_hw, strides, soi,
        )
        got_reg = np.asarray(tgt.reg_targets)
        got_hm = np.asarray(tgt.heatmap)
        # regression targets: where the reference has a target, ours must match
        has = ref_reg[:, 0] > -INF / 2
        np.testing.assert_allclose(got_reg[has], ref_reg[has], rtol=1e-4, atol=1e-4)
        ours_has = got_reg[:, 0] > -INF / 2
        np.testing.assert_array_equal(ours_has, has)
        np.testing.assert_allclose(got_hm, ref_hm, rtol=1e-4, atol=1e-5)
        got_pos = sorted(np.asarray(tgt.pos_inds)[np.asarray(tgt.pos_mask)].tolist())
        assert got_pos == ref_pos


def test_grids_match_level_layout():
    canvas_hw = (64, 96)
    strides = [8, 16, 32]
    g = np.asarray(compute_grids(canvas_hw, strides))
    shapes = level_grid_shapes(canvas_hw, strides)
    assert len(g) == sum(h * w for h, w in shapes)
    # first level-0 point at (4,4); second at (12,4) (row-major x-fastest)
    np.testing.assert_allclose(g[0], [4, 4])
    np.testing.assert_allclose(g[1], [12, 4])
    # first level-1 point
    off = shapes[0][0] * shapes[0][1]
    np.testing.assert_allclose(g[off], [8, 8])
