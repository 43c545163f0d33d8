"""End-to-end smoke tests: init model, build support cache, run the jitted
query path on a small canvas; shape/finiteness checks (SURVEY.md §4 pyramid)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from faster_orefsdet_tpu.config import get_config
from faster_orefsdet_tpu.pipelines.inference import (
    build_inference_fn,
    make_detector,
    query_path_single,
)
from faster_orefsdet_tpu.pipelines.support_cache import build_support_cache


@pytest.fixture(scope="module")
def small_setup():
    cfg = get_config("finetune_vovnet")
    # shrink static budgets for CPU test speed
    cn = cfg.centernet
    import dataclasses

    cfg = cfg.replace(
        centernet=dataclasses.replace(
            cn, pre_nms_topk_test=200, post_nms_topk_test=64
        ),
        roi=dataclasses.replace(cfg.roi, detections_per_image=20),
    )
    model = make_detector(cfg)
    rng = jax.random.PRNGKey(0)
    canvas = (96, 128)
    img = jnp.asarray(np.random.default_rng(0).standard_normal((*canvas, 3), dtype=np.float32))
    params = model.init(rng, img[None], method=model.features)["params"]
    # init remaining submodule params by tracing each method once
    sup_img = jnp.asarray(
        np.random.default_rng(1).standard_normal((3, 64, 64, 3), dtype=np.float32)
    )
    feats = model.apply({"params": params}, sup_img, method=model.features)
    p2 = model.init(rng, feats, method=model.refine_support)["params"]
    kernels = {
        k: (jnp.ones((128,)), jnp.ones((3, 128)), jnp.ones((3, 128)))
        for k in ("p3", "p4", "p5")
    }
    qf = model.apply({"params": params}, img[None], method=model.features)
    p3 = model.init(rng, qf, kernels, method=model.correlate)["params"]
    pos = model.apply({"params": {**params, **p3}}, qf, kernels, method=model.correlate)
    p4 = model.init(rng, pos, method=model.proposal_head)["params"]
    feat_list = [qf[l][0] for l in ("p3", "p4", "p5")]
    boxes = jnp.asarray([[4.0, 4.0, 40.0, 40.0]] * 8)
    p5 = model.init(
        rng, feat_list, boxes, jnp.ones((8, 8, 128)), jnp.ones((4, 4, 128)), 0,
        method=model.roi_stage,
    )["params"]
    full_params = {**params, **p2, **p3, **p4, **p5}
    return cfg, model, full_params, canvas


def test_param_count_matches_reference_scale(small_setup):
    """Model size parity: reference reports 19 MB (README.md:45)."""
    _, _, params, _ = small_setup
    n = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    mb = n * 4 / 1e6
    # reference model_final.pth is ~19MB fp32; allow slack for the dead
    # fc2/fc3 params we deliberately don't materialize
    assert 2.5e6 < n < 6.0e6, f"param count {n} ({mb:.1f} MB) out of range"


def test_support_cache_shapes(small_setup):
    cfg, model, params, _ = small_setup
    k = 3
    sup = jnp.asarray(
        np.random.default_rng(2).standard_normal((k, 64, 64, 3), dtype=np.float32)
    )
    boxes = jnp.asarray([[2.0, 2.0, 60.0, 60.0]] * k)
    cache = build_support_cache(model, params, sup, boxes, cfg)
    assert cache.p3.shape == (32, 32, 128)
    assert cache.p4.shape == (16, 16, 128)
    assert cache.p5.shape == (8, 8, 128)
    assert cache.rcnn_8.shape == (8, 8, 128)
    assert cache.rcnn_4.shape == (4, 4, 128)
    for v in cache:
        assert np.isfinite(np.asarray(v)).all()


def test_query_path_end_to_end(small_setup):
    cfg, model, params, canvas = small_setup
    k = 3
    rng = np.random.default_rng(3)
    sup = jnp.asarray(rng.standard_normal((k, 64, 64, 3), dtype=np.float32))
    boxes = jnp.asarray([[2.0, 2.0, 60.0, 60.0]] * k)
    cache = build_support_cache(model, params, sup, boxes, cfg)

    img = jnp.asarray(rng.standard_normal((*canvas, 3), dtype=np.float32))
    hw = jnp.asarray([90.0, 120.0])
    det = query_path_single(model, params, cache, img, hw, cfg)
    assert det.boxes.shape == (cfg.roi.detections_per_image, 4)
    assert det.scores.shape == (cfg.roi.detections_per_image,)
    assert np.isfinite(np.asarray(det.boxes)).all()
    assert np.isfinite(np.asarray(det.scores)).all()
    b = np.asarray(det.boxes)
    # clipped to image bounds
    assert (b[:, 0] >= 0).all() and (b[:, 2] <= 120.0 + 1e-3).all()
    assert (b[:, 1] >= 0).all() and (b[:, 3] <= 90.0 + 1e-3).all()


def test_jitted_inference_fn(small_setup):
    cfg, model, params, canvas = small_setup
    fn = build_inference_fn(cfg, model)
    rng = np.random.default_rng(4)
    from faster_orefsdet_tpu.pipelines.support_cache import SupportCache

    cache = SupportCache(
        p3=jnp.ones((32, 32, 128)),
        p4=jnp.ones((16, 16, 128)),
        p5=jnp.ones((8, 8, 128)),
        rcnn_8=jnp.ones((8, 8, 128)),
        rcnn_4=jnp.ones((4, 4, 128)),
    )
    img = jnp.asarray(rng.standard_normal((*canvas, 3), dtype=np.float32))
    det = fn(params, cache, img, jnp.asarray([96.0, 128.0]))
    assert det.boxes.shape == (cfg.roi.detections_per_image, 4)
