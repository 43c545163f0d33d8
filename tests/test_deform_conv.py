"""Deformable conv golden tests vs a direct numpy transcription of the
CUDA sampling formula (detectron2 modulated_deform_conv semantics)."""

import numpy as np
import pytest

import jax.numpy as jnp

from faster_orefsdet_tpu.ops.deform_conv import deform_conv2d


def _ref_dcn(x, offsets, weights, mask, ks=3, stride=1, dilation=1):
    """x [H,W,C]; offsets [Ho,Wo,2K]; weights [kh,kw,C,Co]; mask [Ho,Wo,K]."""
    h, w, c = x.shape
    ho, wo = offsets.shape[:2]
    k = ks * ks
    co = weights.shape[-1]
    pad = dilation * (ks - 1) // 2
    out = np.zeros((ho, wo, co))
    for py in range(ho):
        for px in range(wo):
            acc = np.zeros(co)
            for ki in range(k):
                ky, kx = divmod(ki, ks)
                dy, dx = offsets[py, px, 2 * ki], offsets[py, px, 2 * ki + 1]
                y = py * stride - pad + ky * dilation + dy
                xx = px * stride - pad + kx * dilation + dx
                if y <= -1 or y >= h or xx <= -1 or xx >= w:
                    val = np.zeros(c)
                else:
                    y0, x0 = int(np.floor(y)), int(np.floor(xx))
                    ly, lx = y - y0, xx - x0
                    val = np.zeros(c)
                    for (yy, wy) in ((y0, 1 - ly), (y0 + 1, ly)):
                        for (xc, wxx) in ((x0, 1 - lx), (x0 + 1, lx)):
                            if 0 <= yy < h and 0 <= xc < w:
                                val += wy * wxx * x[yy, xc]
                m = mask[py, px, ki] if mask is not None else 1.0
                acc += (val * m) @ weights[ky, kx]
            out[py, px] = acc
    return out


@pytest.mark.parametrize("use_mask", [True, False])
def test_deform_conv_matches_reference(use_mask):
    rng = np.random.default_rng(0)
    h, w, c, co = 7, 9, 4, 5
    x = rng.standard_normal((h, w, c)).astype(np.float32)
    offsets = (rng.standard_normal((h, w, 18)) * 1.5).astype(np.float32)
    weights = rng.standard_normal((3, 3, c, co)).astype(np.float32) * 0.2
    mask = rng.uniform(0, 1, (h, w, 9)).astype(np.float32) if use_mask else None

    ours = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weights),
        None if mask is None else jnp.asarray(mask),
    ))
    ref = _ref_dcn(x, offsets, weights, mask)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_deform_conv_zero_offsets_is_conv():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    x = rng.standard_normal((8, 10, 3)).astype(np.float32)
    weights = rng.standard_normal((3, 3, 3, 6)).astype(np.float32) * 0.2
    offsets = np.zeros((8, 10, 18), np.float32)
    ours = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weights)))
    ref = F.conv2d(
        torch.from_numpy(x).permute(2, 0, 1)[None],
        torch.from_numpy(weights).permute(3, 2, 0, 1),
        padding=1,
    )[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
