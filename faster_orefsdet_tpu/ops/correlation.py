"""CGM depthwise cross-correlation as fused VPU stencils.

The reference's matcher ("CGM") correlates the query feature pyramid with
support-derived depthwise kernels via cuDNN grouped convs
(fsod_cen.py:235-275,463-509: F.conv2d(..., groups=128) with 1x1, 1x3 and 3x1
kernels). On TPU a 128-group conv with tiny kernels is a poor fit for the MXU
and overkill for the VPU; each correlation is just a per-channel scale (1x1)
or a 3-tap per-channel stencil (1x3/3x1). We express them as elementwise
multiply-adds on shifted slices, which XLA fuses into a handful of VPU ops —
no convolution dispatch at all.

Layout: NHWC (channel-last, lane-dim = C = 128 exactly matching the VPU/MXU
lane width).
"""

from __future__ import annotations

import jax.numpy as jnp


def depthwise_correlate_1x1(q: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Per-channel scale: q [..., H, W, C] * k [C] (torch F.conv2d 1x1 depthwise)."""
    return q * k


def _stencil3_w(q: jnp.ndarray, k3: jnp.ndarray) -> jnp.ndarray:
    """3-tap stencil along W with zero padding: out[w] = sum_d q[w+d-1]*k3[d]."""
    qp = jnp.pad(q, [(0, 0)] * (q.ndim - 3) + [(0, 0), (1, 1), (0, 0)])
    w = q.shape[-2]
    return (
        qp[..., :, 0:w, :] * k3[0]
        + qp[..., :, 1 : w + 1, :] * k3[1]
        + qp[..., :, 2 : w + 2, :] * k3[2]
    )


def _stencil3_h(q: jnp.ndarray, k3: jnp.ndarray) -> jnp.ndarray:
    """3-tap stencil along H with zero padding."""
    qp = jnp.pad(q, [(0, 0)] * (q.ndim - 3) + [(1, 1), (0, 0), (0, 0)])
    h = q.shape[-3]
    return (
        qp[..., 0:h, :, :] * k3[0]
        + qp[..., 1 : h + 1, :, :] * k3[1]
        + qp[..., 2 : h + 2, :, :] * k3[2]
    )


def depthwise_correlate_1x3_3x1(
    q: jnp.ndarray, k_1x3: jnp.ndarray, k_3x1: jnp.ndarray
) -> jnp.ndarray:
    """relu(stencil_w(q, k_1x3)) then stencil_h along H (no relu on output here).

    k_1x3: [3, C] taps along W (torch kernel shape [C,1,1,3] transposed);
    k_3x1: [3, C] taps along H (torch kernel shape [C,1,3,1] transposed).
    """
    x = jnp.maximum(_stencil3_w(q, k_1x3), 0.0)
    return _stencil3_h(x, k_3x1)


def cgm_correlate(
    q: jnp.ndarray,
    k_1x1: jnp.ndarray,
    k_1x3: jnp.ndarray,
    k_3x1: jnp.ndarray,
) -> jnp.ndarray:
    """The full per-level CGM correlation chain *before* the conv3 fusion.

    Reproduces fsod_cen.py:235-243 (train) / :463-469 (eval):
        c1 = relu(dwconv1x1(q, k));  c2 = relu(dwconv1x1(c1, k))
        d1 = relu(dwconv1x3(q));     d2 = relu(dwconv3x1(d1))
        return c2 + d2 + q

    q: [..., H, W, C];  k_1x1: [C];  k_1x3/k_3x1: [3, C].
    """
    c1 = jnp.maximum(q * k_1x1, 0.0)
    c2 = jnp.maximum(c1 * k_1x1, 0.0)
    d1 = jnp.maximum(_stencil3_w(q, k_1x3), 0.0)
    d2 = jnp.maximum(_stencil3_h(d1, k_3x1), 0.0)
    return c2 + d2 + q
