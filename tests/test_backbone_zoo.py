"""Backbone zoo shape tests: every ALT backbone family builds and produces a
correctly-shaped P3-P5 pyramid through the detector."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from faster_orefsdet_tpu.config import get_config
from faster_orefsdet_tpu.pipelines.inference import make_detector


@pytest.mark.parametrize(
    "backbone", ["vovnet_fpn", "dla_bifpn", "mnv3_fpn", "resnet_fpn"]
)
def test_backbone_pyramid_shapes(backbone):
    cfg = get_config("finetune_vovnet").replace(backbone_name=backbone)
    model = make_detector(cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 64, 96, 3), dtype=np.float32))
    # keep every init collection — dla_bifpn carries BN batch_stats
    variables = model.init(jax.random.PRNGKey(0), x, method=model.features)
    feats = model.apply(variables, x, method=model.features)
    c = cfg.fpn.out_channels
    assert set(feats) >= {"p3", "p4", "p5"}
    assert feats["p3"].shape == (1, 8, 12, c)
    assert feats["p4"].shape == (1, 4, 6, c)
    assert feats["p5"].shape == (1, 2, 3, c)
    for k in ("p3", "p4", "p5"):
        assert np.isfinite(np.asarray(feats[k], np.float32)).all(), k


def test_resnet_c4_shapes():
    from faster_orefsdet_tpu.models.resnet import Res5Stage, ResNetC4

    m = ResNetC4(depth=50, out_features=("res4",))
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    out = m.apply({"params": params}, x)
    assert out["res4"].shape == (1, 4, 4, 1024)

    r5 = Res5Stage()
    pooled = jnp.zeros((2, 14, 14, 1024))
    p5 = r5.init(jax.random.PRNGKey(0), pooled)["params"]
    y = r5.apply({"params": p5}, pooled)
    assert y.shape == (2, 7, 7, 2048)


def test_mobilenet_channels():
    from faster_orefsdet_tpu.models.mobilenet import MobileNetV3Small

    m = MobileNetV3Small(out_features=("res2", "res3", "res4", "res5"))
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    out = m.apply({"params": params}, x)
    assert out["res2"].shape == (1, 16, 16, 16)
    assert out["res3"].shape == (1, 8, 8, 24)
    assert out["res4"].shape == (1, 4, 4, 48)
    assert out["res5"].shape == (1, 2, 2, 576)


def test_dla_channels():
    from faster_orefsdet_tpu.models.dla import DLA

    m = DLA(num_layers=34, out_features=("dla2", "dla3", "dla4", "dla5"))
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    out = m.apply({"params": params}, x)
    assert out["dla2"].shape == (1, 16, 16, 64)
    assert out["dla3"].shape == (1, 8, 8, 128)
    assert out["dla4"].shape == (1, 4, 4, 256)
    assert out["dla5"].shape == (1, 2, 2, 512)
