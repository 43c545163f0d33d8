"""Sharded serving on the virtual 8-device mesh.

Asserts the data-parallel serving program (parallel.serve_dp) produces
EXACTLY the single-device fused serving program's detections — DP serving has
no collectives, so the per-image programs must be bitwise-identical graphs.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tiny_cfg():
    from faster_orefsdet_tpu.config import get_config

    cfg = get_config("finetune_vovnet")
    return cfg.replace(
        centernet=dataclasses.replace(
            cfg.centernet, pre_nms_topk_test=128, post_nms_topk_test=32
        ),
        roi=dataclasses.replace(cfg.roi, detections_per_image=10),
        input=dataclasses.replace(cfg.input, min_size_test=96, max_size_test=160),
    )


def _params_and_cache(cfg):
    from faster_orefsdet_tpu.pipelines.inference import make_detector
    from faster_orefsdet_tpu.pipelines.support_cache import SupportCache
    from faster_orefsdet_tpu.utils.params import init_params

    model = make_detector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    c = cfg.fpn.out_channels
    rng = np.random.default_rng(7)
    cache = SupportCache(
        p3=jnp.asarray(rng.standard_normal((32, 32, c), np.float32)),
        p4=jnp.asarray(rng.standard_normal((16, 16, c), np.float32)),
        p5=jnp.asarray(rng.standard_normal((8, 8, c), np.float32)),
        rcnn_8=jnp.asarray(rng.standard_normal((8, 8, c), np.float32)),
        rcnn_4=jnp.asarray(rng.standard_normal((4, 4, c), np.float32)),
    )
    return model, params, cache


def test_sharded_serving_matches_single_device():
    from faster_orefsdet_tpu.parallel import make_mesh, make_sharded_serving
    from faster_orefsdet_tpu.pipelines.inference import build_serving_fn, make_detector

    cfg = _tiny_cfg()
    model, params, cache = _params_and_cache(cfg)
    mesh = make_mesh(8)

    input_hw = (120, 160)
    serve, canvas_hw = make_sharded_serving(
        cfg, input_hw, mesh, params, cache, model=model
    )
    assert canvas_hw[0] % 32 == 0 and canvas_hw[1] % 32 == 0

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (8, *input_hw, 3), dtype=np.uint8)
    det_dp = serve(jnp.asarray(raw))

    single_fn, _ = build_serving_fn(cfg, input_hw, model)
    det_1 = single_fn(params, cache, jnp.asarray(raw))

    np.testing.assert_array_equal(np.asarray(det_dp.valid), np.asarray(det_1.valid))
    v = np.asarray(det_dp.valid)
    # the sharded program is a DIFFERENT XLA compilation (per-shard shapes),
    # so fusion/reassociation may differ in the last float ulps — observed
    # up to ~5e-5 px on box coords. 1e-3 px is still far below any
    # detection-meaningful difference; valid masks above must match exactly.
    np.testing.assert_allclose(
        np.asarray(det_dp.boxes)[v], np.asarray(det_1.boxes)[v], rtol=0, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(det_dp.scores)[v], np.asarray(det_1.scores)[v], rtol=0, atol=1e-5
    )
    # output really was computed sharded: the batch axis sharding must span
    # the mesh, not a single device
    shard_devs = {s.device for s in det_dp.boxes.addressable_shards}
    assert len(shard_devs) == 8


def test_sharded_serving_rejects_indivisible_batch():
    from faster_orefsdet_tpu.parallel import make_mesh, make_sharded_serving

    cfg = _tiny_cfg()
    model, params, cache = _params_and_cache(cfg)
    mesh = make_mesh(8)
    serve, _ = make_sharded_serving(cfg, (120, 160), mesh, params, cache, model=model)
    with pytest.raises(ValueError, match="not divisible"):
        serve(jnp.zeros((3, 120, 160, 3), jnp.uint8))


def test_sharded_serving_resident_preset():
    """int8_resident serves data-parallel: act_scales thread through
    make_sharded_serving (round 5) and the sharded program matches the
    single-device resident program."""
    from faster_orefsdet_tpu.parallel import make_mesh, make_sharded_serving
    from faster_orefsdet_tpu.pipelines.inference import build_serving_fn, make_detector
    from faster_orefsdet_tpu.pipelines.quant_calib import calibrate_act_scales

    cfg = _tiny_cfg().replace(quantize="int8_resident")
    model, params, cache = _params_and_cache(cfg)
    mesh = make_mesh(8)

    rng = np.random.default_rng(3)
    calib = jnp.asarray(
        rng.standard_normal((2, 96, 128, 3)).astype(np.float32)
    )
    scales = calibrate_act_scales(cfg, params, calib, model=model)

    input_hw = (120, 160)
    serve, _ = make_sharded_serving(
        cfg, input_hw, mesh, params, cache, model=model, act_scales=scales
    )
    raw = rng.integers(0, 256, (8, *input_hw, 3), dtype=np.uint8)
    det_dp = serve(jnp.asarray(raw))

    single_fn, _ = build_serving_fn(cfg, input_hw, model, act_scales=scales)
    det_1 = single_fn(params, cache, jnp.asarray(raw))

    np.testing.assert_array_equal(np.asarray(det_dp.valid), np.asarray(det_1.valid))
    v = np.asarray(det_dp.valid)
    np.testing.assert_allclose(
        np.asarray(det_dp.boxes)[v], np.asarray(det_1.boxes)[v], rtol=0, atol=1e-3
    )
