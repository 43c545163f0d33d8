"""Pallas fused CGM kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from faster_orefsdet_tpu.ops.correlation import cgm_correlate
from faster_orefsdet_tpu.ops.pallas_cgm import cgm_correlate_fused, cgm_fused_or_fallback


def _ref(q, k1, k13, k31, w3, b3):
    corr = cgm_correlate(jnp.asarray(q), jnp.asarray(k1), jnp.asarray(k13), jnp.asarray(k31))
    cat = jnp.concatenate([corr, jnp.asarray(q)], axis=-1)
    return np.asarray(jnp.maximum(cat @ jnp.asarray(w3) + jnp.asarray(b3), 0.0))


def test_fused_matches_xla_path(rng):
    h, w, c = 12, 16, 128
    q = rng.standard_normal((h, w, c), dtype=np.float32)
    k1 = rng.standard_normal((c,), dtype=np.float32)
    k13 = rng.standard_normal((3, c), dtype=np.float32)
    k31 = rng.standard_normal((3, c), dtype=np.float32)
    w3 = (rng.standard_normal((2 * c, c)) * 0.05).astype(np.float32)
    b3 = rng.standard_normal((c,), dtype=np.float32)

    got = np.asarray(
        cgm_correlate_fused(
            jnp.asarray(q), jnp.asarray(k1), jnp.asarray(k13), jnp.asarray(k31),
            jnp.asarray(w3), jnp.asarray(b3), interpret=True,
        )
    )
    ref = _ref(q, k1, k13, k31, w3, b3)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_fallback_path_used_for_large_inputs(rng):
    # force the fallback branch (no pallas) and check identical math
    h, w, c = 90, 120, 128  # > 3MB f32
    q = rng.standard_normal((h, w, c), dtype=np.float32)
    k1 = rng.standard_normal((c,), dtype=np.float32)
    k13 = rng.standard_normal((3, c), dtype=np.float32)
    k31 = rng.standard_normal((3, c), dtype=np.float32)
    w3 = (rng.standard_normal((2 * c, c)) * 0.05).astype(np.float32)
    b3 = rng.standard_normal((c,), dtype=np.float32)
    got = np.asarray(cgm_fused_or_fallback(
        jnp.asarray(q), jnp.asarray(k1), jnp.asarray(k13), jnp.asarray(k31),
        jnp.asarray(w3), jnp.asarray(b3)))
    ref = _ref(q, k1, k13, k31, w3, b3)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)
