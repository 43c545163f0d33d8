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


def test_model_correlate_flag_equivalence(rng):
    """cfg.use_pallas_cgm wires the fused kernel into the detector's
    correlate stage — it must match the XLA composition end-to-end through
    model.apply (the serving wiring, models/detector.py)."""
    import dataclasses

    from faster_orefsdet_tpu.config import get_config
    from faster_orefsdet_tpu.models.detector import support_kernels
    from faster_orefsdet_tpu.pipelines.inference import make_detector
    from faster_orefsdet_tpu.utils.params import init_params

    import jax

    cfg = get_config("finetune_vovnet")
    model = make_detector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    c = cfg.fpn.out_channels
    feats = {
        "p3": jnp.asarray(rng.standard_normal((1, 16, 24, c), dtype=np.float32)),
        "p4": jnp.asarray(rng.standard_normal((1, 8, 12, c), dtype=np.float32)),
        "p5": jnp.asarray(rng.standard_normal((1, 4, 6, c), dtype=np.float32)),
    }
    kernels = {
        k: support_kernels(
            jnp.asarray(rng.standard_normal((s, s, c), dtype=np.float32))
        )
        for k, s in (("p3", 32), ("p4", 16), ("p5", 8))
    }
    out_xla = model.apply({"params": params}, feats, kernels, method=model.correlate)

    pmodel = make_detector(cfg.replace(use_pallas_cgm=True))
    out_pal = pmodel.apply({"params": params}, feats, kernels, method=pmodel.correlate)
    for lvl in ("p3", "p4", "p5"):
        np.testing.assert_allclose(
            np.asarray(out_pal[lvl]), np.asarray(out_xla[lvl]),
            rtol=2e-4, atol=2e-4, err_msg=lvl,
        )
