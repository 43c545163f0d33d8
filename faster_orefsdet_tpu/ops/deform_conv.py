"""Deformable convolution (v1 and modulated v2) in pure XLA.

TPU-native equivalent of detectron2's `_C.deform_conv_forward` /
`_C.modulated_deform_conv_forward` CUDA kernels
(detectron2.7z!layers/deform_conv.py:61,98,121,220,254), used by the
USE_DEFORMABLE head option, the DFConv3x3 VoVNet variant, and the DLA-Up
decoder (_DeformConv, dla.py:266-302).

Formulation: for output pixel p and kernel tap k, sample the input at
``p*stride + dilation*(k - center) + offset_k(p)`` by bilinear interpolation
(optionally scaled by the v2 modulation mask), then contract the sampled
[H, W, K, Cin] tensor with the [K, Cin, Cout] weights — one big MXU einsum.
The gather is the only scatter/gather op; everything else is matmul.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """img [H, W, C]; ys/xs [...] float sample coords (zero outside).
    Returns [..., C]."""
    h, w = img.shape[0], img.shape[1]
    inrange = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly = ys - y0
    lx = xs - x0
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    # clip AFTER the +1 on the raw floor — clipping first would alias the
    # x0=-1 border corner onto column 1 instead of 0
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    # sample the 4 corners with per-corner validity (corners outside the
    # image contribute zero — CUDA im2col semantics)
    flat = img.reshape(-1, img.shape[-1])

    def corner(yi, xi, valid_y, valid_x, wgt):
        v = (valid_y & valid_x & inrange).astype(img.dtype)[..., None]
        return flat[(yi * w + xi).reshape(-1)].reshape(*ys.shape, -1) * v * wgt[..., None]

    vy0 = (y0 >= 0) & (y0 <= h - 1)
    vy1 = (y0 + 1 >= 0) & (y0 + 1 <= h - 1)
    vx0 = (x0 >= 0) & (x0 <= w - 1)
    vx1 = (x0 + 1 >= 0) & (x0 + 1 <= w - 1)
    out = (
        corner(y0i, x0i, vy0, vx0, (1 - ly) * (1 - lx))
        + corner(y0i, x1i, vy0, vx1, (1 - ly) * lx)
        + corner(y1i, x0i, vy1, vx0, ly * (1 - lx))
        + corner(y1i, x1i, vy1, vx1, ly * lx)
    )
    return out


def deform_conv2d(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    weights: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    *,
    kernel_size: int = 3,
    stride: int = 1,
    dilation: int = 1,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Deformable conv for ONE image (vmap over batch outside).

    x:       [H, W, Cin]
    offsets: [Ho, Wo, 2*K] per-pixel (dy, dx) per tap, CUDA layout
             (tap-major: [k0_dy, k0_dx, k1_dy, k1_dx, ...])
    weights: [kh, kw, Cin, Cout] (HWIO)
    mask:    [Ho, Wo, K] modulation (v2) or None (v1)
    """
    kh = kw = kernel_size
    k = kh * kw
    ho, wo = offsets.shape[0], offsets.shape[1]
    pad = dilation * (kernel_size - 1) // 2

    base_y = jnp.arange(ho, dtype=jnp.float32)[:, None, None] * stride - pad
    base_x = jnp.arange(wo, dtype=jnp.float32)[None, :, None] * stride - pad
    tap_dy = jnp.repeat(jnp.arange(kh, dtype=jnp.float32) * dilation, kw)[None, None, :]
    tap_dx = jnp.tile(jnp.arange(kw, dtype=jnp.float32) * dilation, kh)[None, None, :]

    off = offsets.reshape(ho, wo, k, 2)
    ys = base_y + tap_dy + off[..., 0]  # [Ho, Wo, K]
    xs = base_x + tap_dx + off[..., 1]

    sampled = _bilinear_gather(x, ys, xs)  # [Ho, Wo, K, Cin]
    if mask is not None:
        sampled = sampled * mask[..., None]
    wmat = weights.reshape(k, weights.shape[2], weights.shape[3])  # [K, Cin, Cout]
    out = jnp.einsum("hwkc,kco->hwo", sampled, wmat,
                     preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out
