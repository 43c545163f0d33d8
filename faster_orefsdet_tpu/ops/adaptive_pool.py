"""Adaptive average pooling with exact torch semantics.

The reference leans on nn.AdaptiveAvgPool2d in several places:
  - agp1/2/3 pools of support feature maps to 32/16/8 (fsod_cen.py:66-68,216-218)
  - support correlation kernels pooled to (1,1)/(1,3)/(3,1) (fsod_cen.py:72-75)
  - eSE global average pool (vovnet.py:250)

torch's adaptive pool averages input range [floor(i*I/O), ceil((i+1)*I/O)) for
output index i. Since in/out sizes are static under jit, we express the pool as
two constant matrices (built in numpy at trace time) applied as matmuls:
``out = P_h @ x @ P_w^T`` — MXU-friendly and exactly matching torch, including
the upsampling case O > I (duplicated rows), which occurs when 240px support
crops give 30x30 p3 maps pooled "up" to 32x32.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _pool_matrix_np(in_size: int, out_size: int) -> np.ndarray:
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        lo = (i * in_size) // out_size
        hi = -((-(i + 1) * in_size) // out_size)  # ceil
        m[i, lo:hi] = 1.0 / (hi - lo)
    return m


def adaptive_pool_matrix(in_size: int, out_size: int) -> jnp.ndarray:
    """[out, in] row-stochastic averaging matrix (exact torch semantics)."""
    return jnp.asarray(_pool_matrix_np(in_size, out_size))


def adaptive_avg_pool2d(x: jnp.ndarray, output_size) -> jnp.ndarray:
    """Adaptive average pool over the two spatial axes of NHWC (or HWC) input.

    x: [..., H, W, C];  output_size: (out_h, out_w)
    """
    out_h, out_w = output_size
    h, w = x.shape[-3], x.shape[-2]
    ph = adaptive_pool_matrix(h, out_h)  # [oh, H]
    pw = adaptive_pool_matrix(w, out_w)  # [ow, W]
    x = jnp.einsum("oh,...hwc->...owc", ph, x)
    x = jnp.einsum("pw,...owc->...opc", pw, x)
    return x
