"""ROIAlign (v2, aligned=True) as separable bilinear matmuls.

TPU-native replacement for torchvision's CUDA roi_align kernel used by
detectron2's ROIPooler (detectron2.7z!layers/roi_align.py:3,
detectron2.7z!modeling/poolers.py). The live model pools 8x8 and 4x4 regions
from P3-P5 with ROIAlignV2 (aligned=True, sampling_ratio=0; golden log
:717-731).

Key insight: bilinear interpolation is separable, and ROIAlign's per-bin
average over an SxS sample grid preserves separability. For one box we build
two small interpolation matrices A_y [P, H] and A_x [P, W] (each row: the mean
of S bilinear hat-function rows) and compute

    out[p, q, c] = sum_{h,w} A_y[p, h] * feat[h, w, c] * A_x[q, w]

i.e. two matmuls that map straight onto the MXU, vmapped over boxes. This is
bit-exact w.r.t. the CUDA kernel for a *static* sampling ratio.

sampling_ratio semantics: a positive value uses that fixed SxS sample grid
per bin (torchvision). sampling_ratio=0 reproduces the reference's ADAPTIVE
mode — ceil(roi_size/out_size) samples per bin — exactly, despite the
data-dependent count: samples are laid out on a static S_MAX grid and masked
to the per-box dynamic count (rows beyond ceil() get zero weight, the mean
divides by the dynamic count). S_MAX=8 covers boxes up to ~8x the bin size —
every box the FPN level routing plus the 1000-px input cap can produce;
larger ratios clamp to S_MAX. The cap costs only weight-matrix construction
([P,S,H] hats); the pooling matmuls see the same [P,H] matrix regardless.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from ..structures.boxes import area


ADAPTIVE_S_MAX = 8


def _interp_matrix(start, size, axis_len: int, out_size: int, sampling_ratio: int):
    """Mean-of-samples bilinear weight matrix for one axis of one roi.

    start: scalar roi start (already scaled + aligned-offset), traced
    size:  scalar roi extent, traced
    sampling_ratio: >0 fixed grid; 0 = adaptive ceil(size/out_size) samples
    (ROIAlignV2's sampling_ratio=0) realized on a masked static S_MAX grid.
    Returns [out_size, axis_len] weights.
    """
    bin_size = size / out_size
    p = jnp.arange(out_size, dtype=jnp.float32)[:, None]  # [P,1]
    if sampling_ratio > 0:
        s = sampling_ratio
        iy = (jnp.arange(s, dtype=jnp.float32)[None, :] + 0.5) / s  # [1,S]
        y = start + (p + iy) * bin_size  # [P,S]
        sample_w = jnp.full((1, s), 1.0 / s)
    else:
        s = ADAPTIVE_S_MAX
        # dynamic per-roi count: ceil(bin_size), clamped to [1, S_MAX]
        s_dyn = jnp.clip(jnp.ceil(bin_size), 1.0, float(s))
        idx = jnp.arange(s, dtype=jnp.float32)[None, :]
        iy = (idx + 0.5) / s_dyn  # positions for the first s_dyn samples
        y = start + (p + iy) * bin_size
        active = idx < s_dyn
        sample_w = jnp.where(active, 1.0 / s_dyn, 0.0)  # [1,S]
    # torchvision bilinear_interpolate: zero outside [-1, axis_len]; clamp to
    # [0, axis_len-1]; hat weights over integer grid points.
    inrange = (y >= -1.0) & (y <= axis_len)
    yc = jnp.clip(y, 0.0, axis_len - 1.0)
    h = jnp.arange(axis_len, dtype=jnp.float32)[None, None, :]  # [1,1,H]
    hat = jnp.maximum(0.0, 1.0 - jnp.abs(yc[..., None] - h))  # [P,S,H]
    hat = jnp.where(inrange[..., None], hat, 0.0)
    return jnp.sum(hat * sample_w[..., None], axis=1)  # [P,H]


def roi_align(
    feature: jnp.ndarray,
    boxes: jnp.ndarray,
    spatial_scale: float,
    output_size: int,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """ROIAlign v2 over a single feature level.

    feature: [H, W, C]; boxes: [R, 4] xyxy in image coords; returns [R, P, P, C].
    """
    hh, ww = feature.shape[0], feature.shape[1]

    def mats(box):
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        # aligned=True: half-pixel offset after scaling
        sx = x1 * spatial_scale - 0.5
        sy = y1 * spatial_scale - 0.5
        ex = x2 * spatial_scale - 0.5
        ey = y2 * spatial_scale - 0.5
        w = jnp.maximum(ex - sx, 1e-6)
        h = jnp.maximum(ey - sy, 1e-6)
        ay = _interp_matrix(sy, h, hh, output_size, sampling_ratio)  # [P,H]
        ax = _interp_matrix(sx, w, ww, output_size, sampling_ratio)  # [P,W]
        return ay, ax

    ays, axs = jax.vmap(mats)(boxes.astype(jnp.float32))  # [R,P,H], [R,P,W]
    # MXU packing: a vmapped per-box "ph,hwc" is a batched matmul with M=8
    # per element (6% systolic-array utilization — serving_profile measured
    # the ROI stage pinned at ~12 TF/s, the M=8 ceiling). Contracting with
    # the SHARED feature as one [R*P, H] x [H, W*C] matmul fills the MXU.
    t = jnp.einsum("rph,hwc->rpwc", ays, feature, preferred_element_type=jnp.float32)
    # keep the [R,P,W,C] intermediate + output in the FEATURE dtype: bf16 on
    # the serving path halves this stage's HBM traffic; f32 features
    # (train/golden tests) keep the exact f32 path.
    t = t.astype(feature.dtype)
    out = jnp.einsum(
        "rqw,rpwc->rpqc", axs, t, preferred_element_type=jnp.float32
    )
    return out.astype(feature.dtype)


def assign_levels(
    boxes: jnp.ndarray,
    min_level: int,
    max_level: int,
    canonical_box_size: int = 224,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """FPN paper eqn. (1) level assignment (detectron2.7z!modeling/poolers.py:22-57)."""
    sizes = jnp.sqrt(jnp.maximum(area(boxes), 0.0))
    lvl = jnp.floor(canonical_level + jnp.log2(sizes / canonical_box_size + 1e-8))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32)


def multilevel_roi_align(
    features: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    strides: Sequence[int],
    output_size: int,
    sampling_ratio: int = 2,
    canonical_box_size: int = 224,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """ROIPooler: route each box to its pyramid level and align-pool there.

    features: list of [H_l, W_l, C]; boxes [R,4]; returns [R, P, P, C].

    XLA-native strategy: pool every box at every level (cheap — level maps
    shrink 4x per step) and select by the level assignment mask. Avoids
    dynamic partitioning entirely.
    """
    import math

    min_level = int(math.log2(strides[0]))
    max_level = int(math.log2(strides[-1]))
    lvl = assign_levels(boxes, min_level, max_level, canonical_box_size, canonical_level)

    out = None
    for i, (feat, stride) in enumerate(zip(features, strides)):
        pooled = roi_align(feat, boxes, 1.0 / stride, output_size, sampling_ratio)
        mask = (lvl == (min_level + i)).astype(pooled.dtype)[:, None, None, None]
        out = pooled * mask if out is None else out + pooled * mask
    return out
