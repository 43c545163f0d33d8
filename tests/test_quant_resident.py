"""int8-RESIDENT backbone (round 5): QTensor flow, scale-folded concat,
fused requant epilogue (ops/quant.py QTensor/qconcat/int8_conv_resident,
models/layers.py ConvNorm resident path, models/vovnet.py _resident).

The structural claim under test: unlike int8_static (dequant-to-wide at
every conv boundary, RESULTS.md round-5 reconciliation), the resident mode
materializes int8 between the OSA convs and at the concat — verified here
by numerics (≈ f32 / ≈ static), by param-tree identity (checkpoints load
unchanged), and by XLA cost analysis (bytes accessed strictly below the
int8_static build of the same backbone).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def test_qconcat_scale_vector():
    from faster_orefsdet_tpu.ops.quant import QTensor, qconcat

    rng = np.random.default_rng(0)
    a = QTensor(jnp.asarray(rng.integers(-127, 128, (2, 4, 4, 3), np.int8)), 0.5)
    b = QTensor(jnp.asarray(rng.integers(-127, 128, (2, 4, 4, 2), np.int8)), 2.0)
    cat = qconcat([a, b])
    assert cat.q.shape == (2, 4, 4, 5) and cat.q.dtype == jnp.int8
    np.testing.assert_allclose(np.asarray(cat.scale), [0.5, 0.5, 0.5, 2.0, 2.0])
    # dequant of the concat == concat of the dequants
    ref = jnp.concatenate([a.dequant(), b.dequant()], axis=-1)
    np.testing.assert_allclose(np.asarray(cat.dequant()), np.asarray(ref))


def test_int8_conv_resident_matches_dequant_conv():
    """acc * factor must equal conv(dequant(x), w_q_eff) exactly (int8 values
    are exact in f32): the per-channel input scales fold into the weights
    without approximation beyond weight quantization itself."""
    from jax import lax

    from faster_orefsdet_tpu.ops.quant import (
        QTensor, int8_conv_resident, qconcat, quantize_symmetric,
    )

    rng = np.random.default_rng(1)
    a = QTensor(jnp.asarray(rng.integers(-127, 128, (1, 8, 8, 5), np.int8)), 0.3)
    b = QTensor(jnp.asarray(rng.integers(-127, 128, (1, 8, 8, 3), np.int8)), 1.7)
    x = qconcat([a, b])
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16), np.float32) * 0.2)

    acc, factor = int8_conv_resident(x, w, strides=1, padding=1)
    assert acc.dtype == jnp.int32
    got = acc.astype(jnp.float32) * factor

    # reproduce the effective quantized weights the op used
    s_in = np.asarray(x.scale, np.float32).reshape(1, 1, -1, 1)
    wq, sw = quantize_symmetric(w * s_in, axes=(0, 1, 2))
    dn = lax.conv_dimension_numbers(x.q.shape, wq.shape, ("NHWC", "HWIO", "NHWC"))
    ref = lax.conv_general_dilated(
        x.q.astype(jnp.float32),
        (wq.astype(jnp.float32) * sw),
        (1, 1),
        [(1, 1), (1, 1)],
        dimension_numbers=dn,
    )
    # scale-before-conv vs scale-after-conv differ only by f32 associativity
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-3)
    # and it approximates the real-valued conv
    dnf = lax.conv_dimension_numbers(x.q.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    real = lax.conv_general_dilated(
        x.dequant(), w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dnf
    )
    assert _cos(got, real) > 0.999


def test_resident_param_tree_matches_static():
    """quantize='int8_resident' must not change the checkpoint format."""
    from faster_orefsdet_tpu.models.vovnet import VoVNet

    x = jnp.zeros((1, 64, 64, 3))
    k = jax.random.PRNGKey(0)
    p0 = VoVNet(quant=True).init(k, x)["params"]
    p1 = VoVNet(quant=True, resident=True).init(k, x)["params"]
    t0 = jax.tree.map(lambda a: (a.shape, str(a.dtype)), p0)
    t1 = jax.tree.map(lambda a: (a.shape, str(a.dtype)), p1)
    assert t0 == t1


def test_resident_backbone_close_to_f32_and_static():
    """Dynamic-resident and calibrated-resident stage outputs track the f32
    backbone about as well as int8_static does (same quantization points,
    different materialization)."""
    from faster_orefsdet_tpu.models.vovnet import VoVNet
    from faster_orefsdet_tpu.ops.quant import static_act_scales

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 96, 128, 3), np.float32))
    k = jax.random.PRNGKey(1)
    fmodel = VoVNet()
    params = fmodel.init(k, x)["params"]
    f = fmodel.apply({"params": params}, x)

    rmodel = VoVNet(quant=True, resident=True)
    r_dyn = rmodel.apply({"params": params}, x)
    smodel = VoVNet(quant=True)
    s = smodel.apply({"params": params}, x)

    for level in ("stage3", "stage4", "stage5"):
        cd = _cos(r_dyn[level], f[level])
        cs = _cos(s[level], f[level])
        assert cd > 0.97, (level, cd)
        # resident requant noise must be in the same class as static's
        assert cd > cs - 0.02, (level, cd, cs)

    # calibrated: sow amax on the same input, then run with static scales
    _, col = rmodel.apply({"params": params}, x, mutable=["act_amax"])
    from faster_orefsdet_tpu.pipelines.quant_calib import amax_tree_to_scales

    scales = amax_tree_to_scales(jax.device_get(col["act_amax"]))
    with static_act_scales(scales):
        r_st = rmodel.apply({"params": params}, x)
    for level in ("stage3", "stage4", "stage5"):
        c = _cos(r_st[level], f[level])
        assert c > 0.97, (level, c)
        # static-calibrated on the calibration image ≈ dynamic
        assert _cos(r_st[level], r_dyn[level]) > 0.995, level


def test_resident_missing_scale_raises():
    from faster_orefsdet_tpu.models.vovnet import VoVNet
    from faster_orefsdet_tpu.ops.quant import static_act_scales

    x = jnp.zeros((1, 64, 64, 3))
    model = VoVNet(quant=True, resident=True)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    # the first missing boundary hit is stem1's float-input conv, whose
    # message carries the static wording; match the shared core
    with static_act_scales({"bogus/key": 1.0}):
        with pytest.raises(ValueError, match="no calibrated"):
            model.apply({"params": params}, x)
    # and the resident-specific OUTPUT-scale error: give stem1's conv its
    # key but omit the ConvNorm output key
    with static_act_scales({"stem1/conv": 1.0, "bogus/key": 1.0}):
        with pytest.raises(ValueError, match="int8_resident: no calibrated OUTPUT"):
            model.apply({"params": params}, x)


def test_resident_calibration_covers_all_boundaries():
    """Every float→int8 boundary sows exactly one scale: QuantConv float
    inputs (stem1 + FPN-style consumers), OSA entries, ConvNorm outputs
    (except emit_float concats) — and the calibrated set feeds a full
    detector features() trace without a missing-key error."""
    from faster_orefsdet_tpu.config import get_config
    from faster_orefsdet_tpu.ops.quant import static_act_scales
    from faster_orefsdet_tpu.pipelines.inference import make_detector
    from faster_orefsdet_tpu.pipelines.quant_calib import calibrate_act_scales
    from faster_orefsdet_tpu.utils.params import init_params

    cfg = get_config("serving_vovnet_int8_resident").replace(
        compute_dtype="float32"
    )
    model = make_detector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.standard_normal((2, 96, 128, 3), np.float32))
    scales = calibrate_act_scales(cfg, params, imgs)
    assert scales and all(v > 0 for v in scales.values())
    # OSA-entry keys exist (one per block), chain-conv INPUT keys must NOT
    # (those boundaries are int8-resident; the producer owns them)
    assert any(k.endswith("_block0") for k in scales), sorted(scales)[:8]
    assert not any("layer0/conv" in k for k in scales), sorted(scales)[:8]
    # chain-conv OUTPUT keys exist; concat (emit_float) outputs must not
    assert any(k.endswith("layer0") for k in scales)
    assert not any(k.endswith("concat") and "fpn" not in k for k in scales)

    with static_act_scales(scales):
        f = model.apply({"params": params}, imgs, method=model.features)
    fcfg = cfg.replace(quantize="none")
    ref = make_detector(fcfg).apply(
        {"params": params}, imgs, method=model.features
    )
    for level in ("p3", "p4", "p5"):
        assert _cos(f[level], ref[level]) > 0.97, level


def test_resident_pinned_deployment_path():
    """The deployment shape: build_pinned_inference_fn with the resident
    preset (scales as compile-time captures) must produce exactly the
    unpinned build_inference_fn's detections."""
    from faster_orefsdet_tpu.config import get_config
    from faster_orefsdet_tpu.pipelines.inference import (
        build_inference_fn, build_pinned_inference_fn, make_detector,
    )
    from faster_orefsdet_tpu.pipelines.quant_calib import calibrate_act_scales
    from faster_orefsdet_tpu.pipelines.support_cache import SupportCache
    from faster_orefsdet_tpu.utils.params import init_params

    cfg = get_config("serving_vovnet_int8_resident").replace(
        compute_dtype="float32"
    )
    model = make_detector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(11)
    c = cfg.fpn.out_channels
    cache = SupportCache(
        p3=jnp.asarray(rng.standard_normal((32, 32, c), np.float32)),
        p4=jnp.asarray(rng.standard_normal((16, 16, c), np.float32)),
        p5=jnp.asarray(rng.standard_normal((8, 8, c), np.float32)),
        rcnn_8=jnp.asarray(rng.standard_normal((8, 8, c), np.float32)),
        rcnn_4=jnp.asarray(rng.standard_normal((4, 4, c), np.float32)),
    )
    image = jnp.asarray(rng.standard_normal((96, 128, 3), np.float32))
    hw = jnp.asarray([96.0, 120.0])
    scales = calibrate_act_scales(cfg, params, image[None])

    infer = build_inference_fn(cfg, model, act_scales=scales)
    ref = infer(params, cache, image, hw, None)
    pinned = build_pinned_inference_fn(cfg, params, cache, model, act_scales=scales)
    got = pinned(image, hw)
    # pinning lets XLA constant-fold the weight quantization at compile
    # time — same math, different op order, so ~1e-7 relative noise
    np.testing.assert_allclose(
        np.asarray(got.boxes), np.asarray(ref.boxes), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.scores), np.asarray(ref.scores), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))


def test_resident_reduces_bytes_vs_static():
    """The point of the mode: XLA cost analysis of the jitted backbone must
    show strictly fewer bytes accessed than the int8_static build (which
    dequantizes wide at every boundary) on identical shapes/params."""
    from faster_orefsdet_tpu.models.vovnet import VoVNet
    from faster_orefsdet_tpu.ops.quant import static_act_scales
    from faster_orefsdet_tpu.pipelines.quant_calib import amax_tree_to_scales

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 128, 128, 3), np.float32))
    k = jax.random.PRNGKey(2)
    smodel = VoVNet(quant=True)
    params = smodel.init(k, x)["params"]
    rmodel = VoVNet(quant=True, resident=True)
    _, col = rmodel.apply({"params": params}, x, mutable=["act_amax"])
    rscales = amax_tree_to_scales(jax.device_get(col["act_amax"]))
    _, scol = smodel.apply({"params": params}, x, mutable=["act_amax"])
    sscales = amax_tree_to_scales(jax.device_get(scol["act_amax"]))

    def bytes_accessed(model, scales):
        with static_act_scales(scales):
            compiled = (
                jax.jit(lambda p, i: model.apply({"params": p}, i))
                .lower(params, x)
                .compile()
            )
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["bytes accessed"])

    b_res = bytes_accessed(rmodel, rscales)
    b_static = bytes_accessed(smodel, sscales)
    assert b_res < b_static, (b_res, b_static)
