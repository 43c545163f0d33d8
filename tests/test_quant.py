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


def test_int8_conv_per_example_batch_scales():
    """Batched (non-vmap) calls quantize each example with its own scale: an
    outlier image must not degrade the rest of the batch (advisor round-3)."""
    from faster_orefsdet_tpu.ops.quant import int8_conv

    rng = np.random.default_rng(4)
    x = rng.standard_normal((3, 12, 12, 16), np.float32)
    x[1] *= 1000.0  # outlier example
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 8), np.float32) * 0.1)
    batched = int8_conv(jnp.asarray(x), w, strides=1, padding=1)
    per_example = jnp.stack(
        [int8_conv(jnp.asarray(xi), w, strides=1, padding=1) for xi in x]
    )
    np.testing.assert_allclose(
        np.asarray(batched), np.asarray(per_example), rtol=0, atol=1e-5
    )


def test_calibration_covers_every_quantconv():
    """calibrate_act_scales returns one positive scale per QuantConv, keyed
    exactly by the module path QuantConv looks up at trace time."""
    from faster_orefsdet_tpu.config import get_config
    from faster_orefsdet_tpu.pipelines.inference import make_detector
    from faster_orefsdet_tpu.pipelines.quant_calib import calibrate_act_scales
    from faster_orefsdet_tpu.utils.params import init_params

    cfg = get_config("finetune_vovnet").replace(quantize="int8_static")
    model = make_detector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.standard_normal((2, 96, 128, 3), np.float32))
    scales = calibrate_act_scales(cfg, params, imgs)

    # every scale positive, every key under backbone/ or fpn/ and ending in
    # a conv module name
    assert scales and all(v > 0 for v in scales.values())
    assert all(k.split("/")[0] in ("backbone", "fpn") for k in scales)
    # count == number of conv kernels in the quantized submodules (the eSE
    # 1x1 fc convs intentionally stay float — vovnet.py quant docstring)
    flat = jax.tree_util.tree_leaves_with_path(params)
    n_convs = sum(
        1
        for path, leaf in flat
        if getattr(path[-1], "key", None) == "kernel"
        and getattr(path[0], "key", None) in ("backbone", "fpn")
        and leaf.ndim == 4
        and not any(getattr(p, "key", None) == "ese" for p in path)
    )
    assert len(scales) == n_convs, (len(scales), n_convs)


def test_static_scales_reach_the_convs():
    """Corrupting the calibrated scales must corrupt the features — proving
    the trace-time path lookup actually hits (a silent key mismatch would
    fall back to dynamic quantization and hide forever)."""
    from faster_orefsdet_tpu.config import get_config
    from faster_orefsdet_tpu.ops.quant import static_act_scales
    from faster_orefsdet_tpu.pipelines.inference import make_detector
    from faster_orefsdet_tpu.pipelines.quant_calib import calibrate_act_scales
    from faster_orefsdet_tpu.utils.params import init_params

    cfg = get_config("finetune_vovnet").replace(quantize="int8_static")
    model = make_detector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(6)
    img = jnp.asarray(rng.standard_normal((1, 96, 128, 3), np.float32))
    scales = calibrate_act_scales(cfg, params, img)

    with static_act_scales(scales):
        good = model.apply({"params": params}, img, method=model.features)
    with static_act_scales({k: 1e6 for k in scales}):
        bad = model.apply({"params": params}, img, method=model.features)
    fcfg = cfg.replace(quantize="none")
    f32 = make_detector(fcfg).apply({"params": params}, img, method=model.features)

    assert _cos(good["p3"], f32["p3"]) > 0.98
    assert _cos(bad["p3"], f32["p3"]) < 0.9  # huge scales -> all-zero int8


def test_static_int8_query_path_close_to_dynamic():
    """End-to-end: build_inference_fn(int8_static, act_scales) detections ≈
    the dynamic-int8 preset's on the same image/params/cache."""
    from faster_orefsdet_tpu.config import get_config
    from faster_orefsdet_tpu.pipelines.inference import build_inference_fn, make_detector
    from faster_orefsdet_tpu.pipelines.quant_calib import calibrate_act_scales
    from faster_orefsdet_tpu.pipelines.support_cache import SupportCache
    from faster_orefsdet_tpu.utils.params import init_params

    base = get_config("finetune_vovnet")
    model = make_detector(base)
    params = init_params(model, base, jax.random.PRNGKey(0))
    c = base.fpn.out_channels
    rng = np.random.default_rng(7)
    cache = SupportCache(
        p3=jnp.asarray(rng.standard_normal((32, 32, c), np.float32)),
        p4=jnp.asarray(rng.standard_normal((16, 16, c), np.float32)),
        p5=jnp.asarray(rng.standard_normal((8, 8, c), np.float32)),
        rcnn_8=jnp.asarray(rng.standard_normal((8, 8, c), np.float32)),
        rcnn_4=jnp.asarray(rng.standard_normal((4, 4, c), np.float32)),
    )
    img = jnp.asarray(rng.standard_normal((96, 128, 3), np.float32))
    hw = jnp.asarray([96.0, 121.0])

    dyn_cfg = base.replace(quantize="int8")
    stat_cfg = base.replace(quantize="int8_static")
    scales = calibrate_act_scales(stat_cfg, params, img[None])

    det_d = build_inference_fn(dyn_cfg)(params, cache, img, hw)
    det_s = build_inference_fn(stat_cfg, act_scales=scales)(params, cache, img, hw)

    # same image calibrated -> static grid ≈ dynamic grid; boxes within px
    np.testing.assert_allclose(
        np.asarray(det_s.scores), np.asarray(det_d.scores), atol=0.05
    )
    sel = np.asarray(det_d.valid) & np.asarray(det_s.valid)
    if sel.any():
        np.testing.assert_allclose(
            np.asarray(det_s.boxes)[sel], np.asarray(det_d.boxes)[sel], atol=3.0
        )


def test_int8_static_requires_scales():
    import pytest as _pytest

    from faster_orefsdet_tpu.config import get_config
    from faster_orefsdet_tpu.pipelines.inference import build_inference_fn

    cfg = get_config("serving_vovnet_int8_static")
    assert cfg.quantize == "int8_static"
    with _pytest.raises(ValueError, match="act_scales"):
        build_inference_fn(cfg)


def test_act_scales_save_load_roundtrip(tmp_path):
    from faster_orefsdet_tpu.pipelines.quant_calib import (
        load_act_scales,
        save_act_scales,
    )

    scales = {"backbone/stem1/conv": 0.125, "fpn/lateral3": 0.5}
    p = str(tmp_path / "scales.json")
    save_act_scales(p, scales)
    assert load_act_scales(p) == scales


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


def test_static_missing_scale_raises():
    """A conv path absent from the calibration dict must raise at trace
    time — a silent per-conv fallback to dynamic quantization would mix
    static+dynamic without warning (round-4 self-review)."""
    from faster_orefsdet_tpu.config import get_config
    from faster_orefsdet_tpu.ops.quant import static_act_scales
    from faster_orefsdet_tpu.pipelines.inference import make_detector
    from faster_orefsdet_tpu.pipelines.quant_calib import calibrate_act_scales
    from faster_orefsdet_tpu.utils.params import init_params

    cfg = get_config("finetune_vovnet").replace(quantize="int8_static")
    model = make_detector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(6)
    imgs = jnp.asarray(rng.standard_normal((1, 96, 128, 3), np.float32))
    scales = calibrate_act_scales(cfg, params, imgs)
    stale = dict(scales)
    missing = sorted(stale)[0]
    del stale[missing]
    with pytest.raises(ValueError, match="no calibrated activation scale"):
        with static_act_scales(stale):
            model.apply({"params": params}, imgs, method=model.features)


def test_unknown_quantize_string_raises():
    from faster_orefsdet_tpu.config import get_config
    from faster_orefsdet_tpu.pipelines.inference import make_detector
    from faster_orefsdet_tpu.utils.params import init_params

    bad = get_config("finetune_vovnet").replace(quantize="int8-static")
    with pytest.raises(ValueError, match="cfg.quantize"):
        init_params(make_detector(bad), bad, jax.random.PRNGKey(0))
