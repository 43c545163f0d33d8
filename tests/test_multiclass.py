"""Multi-class query path tests (stacked support cache, cross-class NMS)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from faster_orefsdet_tpu.config import get_config
from faster_orefsdet_tpu.pipelines.inference import (
    make_detector,
    query_path_multiclass,
    query_path_single,
)
from faster_orefsdet_tpu.pipelines.support_cache import (
    SupportCache,
    stack_support_caches,
)
from faster_orefsdet_tpu.utils.params import init_params


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("finetune_vovnet")
    cfg = cfg.replace(
        centernet=dataclasses.replace(
            cfg.centernet, pre_nms_topk_test=128, post_nms_topk_test=32
        ),
        roi=dataclasses.replace(cfg.roi, detections_per_image=24),
    )
    model = make_detector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    return cfg, model, params


def _cache(rng, c=128):
    g = np.random.default_rng(rng)
    return SupportCache(
        p3=jnp.asarray(g.standard_normal((32, 32, c), dtype=np.float32)),
        p4=jnp.asarray(g.standard_normal((16, 16, c), dtype=np.float32)),
        p5=jnp.asarray(g.standard_normal((8, 8, c), dtype=np.float32)),
        rcnn_8=jnp.asarray(g.standard_normal((8, 8, c), dtype=np.float32)),
        rcnn_4=jnp.asarray(g.standard_normal((4, 4, c), dtype=np.float32)),
    )


def test_multiclass_runs_and_assigns_classes(setup):
    cfg, model, params = setup
    mcache = stack_support_caches([_cache(0), _cache(1), _cache(2)])
    img = jnp.asarray(np.random.default_rng(3).standard_normal((96, 128, 3), dtype=np.float32))
    det = query_path_multiclass(model, params, mcache, img, jnp.asarray([96.0, 128.0]), cfg)
    assert det.boxes.shape == (24, 4)
    cls = np.asarray(det.classes)[np.asarray(det.valid)]
    assert cls.min() >= 0 and cls.max() <= 2
    assert np.isfinite(np.asarray(det.boxes)).all()


def test_multiclass_single_class_consistency(setup):
    """With one class, the multi-class path's surviving detections must match
    the single-class path (same cache, same image)."""
    cfg, model, params = setup
    cache = _cache(7)
    mcache = stack_support_caches([cache])
    img = jnp.asarray(np.random.default_rng(8).standard_normal((96, 128, 3), dtype=np.float32))
    hw = jnp.asarray([96.0, 128.0])
    a = query_path_single(model, params, cache, img, hw, cfg)
    b = query_path_multiclass(model, params, mcache, img, hw, cfg)
    av, bv = np.asarray(a.valid), np.asarray(b.valid)
    assert av.sum() == bv.sum()
    np.testing.assert_allclose(
        np.asarray(a.boxes)[av], np.asarray(b.boxes)[bv], rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(a.scores)[av], np.asarray(b.scores)[bv], rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow
def test_multiclass_composed_full_budgets():
    """Single-class consistency at the PUBLISHED budgets (pre_nms 1000,
    post_nms 256, 100 detections, 320-short-side canvas) — the composed
    multiclass parity case: with one class the multiclass program must
    reproduce the parity-tested single-class program detection-for-detection
    at real K. Also pins the 3-class Pallas-NMS gate: 3*256 = 768 is inside
    ops.pallas_nms.supported(), so the fast multiclass path keeps the VMEM
    kernel rather than silently falling back (reference per-class loop:
    fsod_cen.py:454-509)."""
    from faster_orefsdet_tpu.ops.pallas_nms import supported

    cfg = get_config("finetune_vovnet")
    model = make_detector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    cache = _cache(11)
    mcache = stack_support_caches([cache])
    img = jnp.asarray(
        np.random.default_rng(12).standard_normal((320, 448, 3), dtype=np.float32)
    )
    hw = jnp.asarray([320.0, 427.0])
    a = query_path_single(model, params, cache, img, hw, cfg)
    b = query_path_multiclass(model, params, mcache, img, hw, cfg)
    av, bv = np.asarray(a.valid), np.asarray(b.valid)
    assert av.sum() == bv.sum() and av.sum() > 0
    np.testing.assert_allclose(
        np.asarray(a.boxes)[av], np.asarray(b.boxes)[bv], rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(a.scores)[av], np.asarray(b.scores)[bv], rtol=1e-4, atol=1e-5
    )
    # the published-budget multiclass NMS sizes stay on the Pallas kernel
    assert supported(1 * cfg.centernet.post_nms_topk_test)
    assert supported(3 * cfg.centernet.post_nms_topk_test)


def test_serving_fn_raw_to_boxes(setup):
    """End-to-end serving program: raw uint8 frames → original-frame boxes."""
    from faster_orefsdet_tpu.pipelines.inference import build_serving_fn

    cfg, model, params = setup
    import dataclasses

    cfg2 = cfg.replace(
        input=dataclasses.replace(cfg.input, min_size_test=96, max_size_test=160)
    )
    fn, canvas_hw = build_serving_fn(cfg2, (120, 160), model)
    assert canvas_hw[0] % 32 == 0 and canvas_hw[1] % 32 == 0
    cache = _cache(9)
    raw = jnp.asarray(
        np.random.default_rng(10).integers(0, 255, (2, 120, 160, 3)).astype(np.float32)
    )
    det = fn(params, cache, raw)
    assert det.boxes.shape[0] == 2
    b = np.asarray(det.boxes)
    v = np.asarray(det.valid)
    # boxes are in the RAW frame: within [0,160]x[0,120]
    assert (b[v[..., None].repeat(4, -1)] <= 160.0 + 1e-2).all()
    assert np.isfinite(b).all()
