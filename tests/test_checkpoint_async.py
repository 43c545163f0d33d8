"""Checkpoint round-trip + async predictor tests."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_orbax_roundtrip(tmp_path):
    import optax

    from faster_orefsdet_tpu.config import get_config
    from faster_orefsdet_tpu.pipelines.inference import make_detector
    from faster_orefsdet_tpu.pipelines.train_step import TrainState
    from faster_orefsdet_tpu.solver import build_optimizer
    from faster_orefsdet_tpu.utils.checkpoint import (
        latest_step,
        resume_or_load,
        save_checkpoint,
    )
    from faster_orefsdet_tpu.utils.params import init_params

    cfg = get_config("finetune_vovnet")
    model = make_detector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    tx = build_optimizer(cfg.solver, params)
    state = TrainState(params, tx.init(params), jnp.asarray(7))

    d = str(tmp_path / "ckpt")
    save_checkpoint(d, state, 7)
    assert latest_step(d) == 7

    # fresh template with different values, then restore
    params2 = jax.tree.map(lambda x: jnp.zeros_like(x), params)
    blank = TrainState(params2, tx.init(params2), jnp.asarray(0))
    restored = resume_or_load(d, blank)
    assert int(restored.step) == 7
    a = jax.tree.leaves(params)
    b = jax.tree.leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # resume from empty dir is a no-op
    untouched = resume_or_load(str(tmp_path / "nope"), blank)
    assert int(untouched.step) == 0


def test_orbax_roundtrip_with_batch_stats(tmp_path):
    """TrainState.batch_stats (trainable-BN configs) survives save/restore."""
    import optax

    from faster_orefsdet_tpu.pipelines.train_step import TrainState
    from faster_orefsdet_tpu.utils.checkpoint import resume_or_load, save_checkpoint

    params = {"w": jnp.asarray([1.0, 2.0])}
    stats = {"backbone": {"base": {"bn": {"mean": jnp.asarray([0.3, -0.1]),
                                          "var": jnp.asarray([1.5, 0.9])}}}}
    tx = optax.sgd(0.1)
    state = TrainState(params, tx.init(params), jnp.asarray(3), stats)
    d = str(tmp_path / "ckpt_bn")
    save_checkpoint(d, state, 3)

    blank = TrainState(
        jax.tree.map(jnp.zeros_like, params),
        tx.init(params),
        jnp.asarray(0),
        jax.tree.map(jnp.zeros_like, stats),
    )
    restored = resume_or_load(d, blank)
    assert int(restored.step) == 3
    np.testing.assert_array_equal(
        np.asarray(restored.batch_stats["backbone"]["base"]["bn"]["mean"]),
        np.asarray(stats["backbone"]["base"]["bn"]["mean"]),
    )
    np.testing.assert_array_equal(
        np.asarray(restored.batch_stats["backbone"]["base"]["bn"]["var"]),
        np.asarray(stats["backbone"]["base"]["bn"]["var"]),
    )


def test_npz_roundtrip(tmp_path):
    from faster_orefsdet_tpu.config import get_config
    from faster_orefsdet_tpu.pipelines.inference import make_detector
    from faster_orefsdet_tpu.utils.checkpoint import load_params_npz, save_params_npz
    from faster_orefsdet_tpu.utils.params import init_params

    cfg = get_config("finetune_vovnet")
    model = make_detector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    p = str(tmp_path / "m.npz")
    save_params_npz(p, params)
    loaded = load_params_npz(p, params)
    for x, y in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_async_predictor_order_and_results():
    from faster_orefsdet_tpu.config import get_config
    from faster_orefsdet_tpu.pipelines.async_predictor import AsyncPredictor
    from faster_orefsdet_tpu.pipelines.inference import make_detector
    from faster_orefsdet_tpu.pipelines.support_cache import SupportCache
    from faster_orefsdet_tpu.utils.params import init_params

    cfg = get_config("finetune_vovnet")
    cfg = cfg.replace(
        centernet=dataclasses.replace(
            cfg.centernet, pre_nms_topk_test=128, post_nms_topk_test=32
        ),
        roi=dataclasses.replace(cfg.roi, detections_per_image=10),
        input=dataclasses.replace(cfg.input, min_size_test=96, max_size_test=128),
    )
    model = make_detector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    c = cfg.fpn.out_channels
    cache = SupportCache(
        p3=jnp.ones((32, 32, c)), p4=jnp.ones((16, 16, c)), p5=jnp.ones((8, 8, c)),
        rcnn_8=jnp.ones((8, 8, c)), rcnn_4=jnp.ones((4, 4, c)),
    )
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (100, 130, 3)).astype(np.uint8) for _ in range(5)]
    pred = AsyncPredictor(cfg, params, cache, model, depth=2,
                          canvas_hw=(96, 128))
    outs = list(pred.run(imgs))
    assert len(outs) == 5
    for o in outs:
        assert o["boxes"].shape[1] == 4
        assert np.isfinite(o["boxes"]).all()

    # pooled-readback path: same results, same order (results are fetched on
    # worker threads but yielded in dispatch order)
    pred2 = AsyncPredictor(cfg, params, cache, model, depth=3,
                           canvas_hw=(96, 128), readback_workers=4)
    outs2 = list(pred2.run(imgs))
    assert len(outs2) == 5
    for a, b in zip(outs, outs2):
        np.testing.assert_allclose(a["boxes"], b["boxes"], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(a["scores"], b["scores"], rtol=1e-5, atol=1e-5)


def test_pinned_inference_matches_unpinned():
    """build_pinned_inference_fn (weights as compile-time captures) must be
    numerically identical to the arg-passing builder."""
    from faster_orefsdet_tpu.config import get_config
    from faster_orefsdet_tpu.pipelines.inference import (
        build_inference_fn,
        build_pinned_inference_fn,
        make_detector,
    )
    from faster_orefsdet_tpu.pipelines.support_cache import SupportCache
    from faster_orefsdet_tpu.utils.params import init_params

    cfg = get_config("finetune_vovnet")
    cfg = cfg.replace(
        centernet=dataclasses.replace(
            cfg.centernet, pre_nms_topk_test=128, post_nms_topk_test=32
        ),
        roi=dataclasses.replace(cfg.roi, detections_per_image=10),
        input=dataclasses.replace(cfg.input, min_size_test=96, max_size_test=128),
    )
    model = make_detector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    c = cfg.fpn.out_channels
    rng = np.random.default_rng(1)
    cache = SupportCache(
        p3=jnp.asarray(rng.standard_normal((32, 32, c), dtype=np.float32)),
        p4=jnp.asarray(rng.standard_normal((16, 16, c), dtype=np.float32)),
        p5=jnp.asarray(rng.standard_normal((8, 8, c), dtype=np.float32)),
        rcnn_8=jnp.asarray(rng.standard_normal((8, 8, c), dtype=np.float32)),
        rcnn_4=jnp.asarray(rng.standard_normal((4, 4, c), dtype=np.float32)),
    )
    image = jnp.asarray(rng.standard_normal((96, 128, 3), dtype=np.float32))
    hw = jnp.asarray([96.0, 120.0])
    a = build_inference_fn(cfg, model)(params, cache, image, hw)
    b = build_pinned_inference_fn(cfg, params, cache, model=model)(image, hw)
    np.testing.assert_allclose(np.asarray(a.boxes), np.asarray(b.boxes),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.scores), np.asarray(b.scores),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))


def test_profiling_cost_analysis():
    from faster_orefsdet_tpu.utils.profiling import cost_analysis, device_memory

    import jax.numpy as jnp

    def f(x):
        return (x @ x).sum()

    ca = cost_analysis(f, jnp.ones((64, 64)))
    assert ca.get("flops", 0) > 0
    device_memory()  # must not raise


def test_pack_unpack_detections_roundtrip():
    """pack_detections ([K,7] incl. classes) / unpack_detections_np inverse
    pair — single and batched shapes (the one-readback-per-result contract,
    multiclass-capable)."""
    from faster_orefsdet_tpu.pipelines.inference import (
        pack_detections,
        unpack_detections_np,
    )
    from faster_orefsdet_tpu.structures.instances import Detections

    rng = np.random.default_rng(3)
    for shape in ((7,), (4, 7)):
        boxes = rng.standard_normal((*shape, 4)).astype(np.float32)
        scores = rng.random(shape).astype(np.float32)
        classes = rng.integers(0, 3, shape).astype(np.int32)
        valid = rng.random(shape) > 0.5
        det = Detections(
            boxes=jnp.asarray(boxes),
            scores=jnp.asarray(scores),
            classes=jnp.asarray(classes),
            valid=jnp.asarray(valid),
        )
        packed = pack_detections(det)
        assert packed.shape == (*shape, 7)
        d = unpack_detections_np(packed)
        np.testing.assert_array_equal(d["boxes"], boxes)
        np.testing.assert_array_equal(d["scores"], scores)
        np.testing.assert_array_equal(d["classes"], classes)
        np.testing.assert_array_equal(d["valid"], valid)
