"""Second wave of backbone-zoo tests: Res2Net, RegNet, DLA-Up decoder."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_res2net_shapes():
    from faster_orefsdet_tpu.models.res2net import Res2Net

    m = Res2Net(depth=50, out_features=("res2", "res3", "res4"))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 64, 64, 3), dtype=np.float32))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    out = m.apply({"params": params}, x)
    assert out["res2"].shape == (1, 16, 16, 256)
    assert out["res3"].shape == (1, 8, 8, 512)
    assert out["res4"].shape == (1, 4, 4, 1024)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_regnet_shapes():
    from faster_orefsdet_tpu.models.regnet import RegNet, generate_regnet_parameters

    ws, ds = generate_regnet_parameters(24.48, 24, 2.54, 22)
    assert len(ws) == len(ds) == 4
    assert sum(ds) == 22

    m = RegNet(out_features=("s1", "s2", "s3", "s4"))
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 64, 64, 3), dtype=np.float32))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    out = m.apply({"params": params}, x)
    assert out["s1"].shape[1:3] == (16, 16)
    assert out["s4"].shape[1:3] == (2, 2)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_dlaseg_decoder():
    from faster_orefsdet_tpu.models.dlaup import DLASeg

    m = DLASeg(num_layers=34)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 64, 64, 3), dtype=np.float32))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    out = m.apply({"params": params}, x)
    assert out["dla2"].shape == (1, 16, 16, 64)  # stride 4
    assert np.isfinite(np.asarray(out["dla2"])).all()
