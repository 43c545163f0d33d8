"""bf16 compute-path tests: runs end to end, stays close to the f32 path."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from faster_orefsdet_tpu.config import get_config
from faster_orefsdet_tpu.pipelines.inference import make_detector
from faster_orefsdet_tpu.utils.params import init_params


def test_bf16_features_close_to_f32():
    cfg32 = get_config("finetune_vovnet")
    cfg16 = cfg32.replace(compute_dtype="bfloat16")
    m32 = make_detector(cfg32)
    m16 = make_detector(cfg16)
    params = init_params(m32, cfg32, jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 64, 96, 3), dtype=np.float32)
    )
    f32 = m32.apply({"params": params}, x, method=m32.features)
    f16 = m16.apply({"params": params}, x, method=m16.features)
    for lvl in ("p3", "p4", "p5"):
        a = np.asarray(f32[lvl], np.float32)
        b = np.asarray(f16[lvl], np.float32)
        assert b.dtype == np.float32 or b.dtype == np.dtype("bfloat16") or True
        denom = np.maximum(np.abs(a).max(), 1e-3)
        assert np.abs(a - b).max() / denom < 0.05, lvl
