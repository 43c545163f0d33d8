"""int8 W8A8 post-training quantization (ops/quant.py, models.layers.QuantConv)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def test_int8_conv_close_to_f32():
    from jax import lax

    from faster_orefsdet_tpu.ops.quant import int8_conv

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 32), np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 32, 64), np.float32) * 0.1)
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    ref = lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)
    got = int8_conv(x, w, strides=1, padding=1)
    assert got.dtype == x.dtype and got.shape == ref.shape
    assert _cos(got, ref) > 0.999
    # int8 grid error bound: output abs-max * ~(1/127 + 1/127)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0.03 * scale)


def test_int8_conv_strided_and_3d():
    from jax import lax

    from faster_orefsdet_tpu.ops.quant import int8_conv

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((15, 17, 8), np.float32))  # unbatched
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16), np.float32))
    got = int8_conv(x, w, strides=2, padding=1)
    ref = lax.conv_general_dilated(
        x[None], w, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=lax.conv_dimension_numbers(
            x[None].shape, w.shape, ("NHWC", "HWIO", "NHWC")
        ),
    )[0]
    assert got.shape == ref.shape
    assert _cos(got, ref) > 0.995


def test_int8_matmul_close():
    from faster_orefsdet_tpu.ops.quant import int8_matmul

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((5, 64), np.float32))
    w = jnp.asarray(rng.standard_normal((64, 32), np.float32))
    ref = x @ w
    got = int8_matmul(x, w)
    assert _cos(got, ref) > 0.999


def test_quantconv_param_tree_matches_nnconv():
    """quant=True must not change the checkpoint format."""
    from faster_orefsdet_tpu.models.layers import ConvNorm

    x = jnp.zeros((1, 8, 8, 16))
    p0 = ConvNorm(32, quant=False).init(jax.random.PRNGKey(0), x)["params"]
    p1 = ConvNorm(32, quant=True).init(jax.random.PRNGKey(0), x)["params"]
    t0 = jax.tree.map(lambda a: (a.shape, a.dtype), p0)
    t1 = jax.tree.map(lambda a: (a.shape, a.dtype), p1)
    assert t0 == t1


def test_quantized_backbone_features_close():
    """Full backbone+FPN: int8 pyramid ≈ f32 pyramid on the same params."""
    from faster_orefsdet_tpu.config import get_config
    from faster_orefsdet_tpu.pipelines.inference import make_detector
    from faster_orefsdet_tpu.utils.params import init_params

    cfg = get_config("finetune_vovnet")
    model = make_detector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))

    qcfg = cfg.replace(quantize="int8")
    qmodel = make_detector(qcfg)

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.standard_normal((1, 96, 128, 3), np.float32))
    f = model.apply({"params": params}, img, method=model.features)
    fq = qmodel.apply({"params": params}, img, method=qmodel.features)
    for level in ("p3", "p4", "p5"):
        c = _cos(fq[level], f[level])
        assert c > 0.98, (level, c)


def test_int8_preset_and_backbone_gate():
    from faster_orefsdet_tpu.config import get_config
    from faster_orefsdet_tpu.pipelines.inference import make_detector
    from faster_orefsdet_tpu.utils.params import init_params

    cfg = get_config("serving_vovnet_int8")
    assert cfg.quantize == "int8"
    assert cfg.compute_dtype == "bfloat16"
    assert cfg.centernet.post_nms_topk_test == 64

    bad = get_config("finetune_dla").replace(quantize="int8")
    model = make_detector(bad)
    with pytest.raises(ValueError, match="vovnet_fpn"):
        init_params(model, bad, jax.random.PRNGKey(0))
