"""Multi-stage cascade configuration runs end to end (the [0.5,0.6,0.7]
cascade of the finetune_dla2-style configs)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from faster_orefsdet_tpu.config import get_config
from faster_orefsdet_tpu.pipelines.inference import make_detector, query_path_single
from faster_orefsdet_tpu.pipelines.support_cache import SupportCache
from faster_orefsdet_tpu.pipelines.train_step import loss_fn
from faster_orefsdet_tpu.utils.params import init_params

from test_train_step import make_batch


def three_stage_cfg():
    cfg = get_config("finetune_vovnet")
    return cfg.replace(
        roi=dataclasses.replace(
            cfg.roi,
            cascade_ious=(0.5, 0.6, 0.7),
            cascade_bbox_reg_weights=(
                (10.0, 10.0, 5.0, 5.0),
                (20.0, 20.0, 10.0, 10.0),
                (30.0, 30.0, 15.0, 15.0),
            ),
            batch_size_per_image=32,
            detections_per_image=16,
        ),
        centernet=dataclasses.replace(
            cfg.centernet, pre_nms_topk_test=128, post_nms_topk_test=32,
            pre_nms_topk_train=128, post_nms_topk_train=64,
        ),
        fs=dataclasses.replace(cfg.fs, support_shot=2),
        static=dataclasses.replace(cfg.static, max_gt_per_image=8),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = three_stage_cfg()
    model = make_detector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    return cfg, model, params


def test_three_stage_inference(setup):
    cfg, model, params = setup
    c = cfg.fpn.out_channels
    cache = SupportCache(
        p3=jnp.ones((32, 32, c)), p4=jnp.ones((16, 16, c)), p5=jnp.ones((8, 8, c)),
        rcnn_8=jnp.ones((8, 8, c)), rcnn_4=jnp.ones((4, 4, c)),
    )
    img = jnp.asarray(np.random.default_rng(0).standard_normal((96, 128, 3), dtype=np.float32))
    det = query_path_single(model, params, cache, img, jnp.asarray([96.0, 128.0]), cfg)
    assert det.boxes.shape == (16, 4)
    assert np.isfinite(np.asarray(det.boxes)).all()


def test_three_stage_train_losses(setup):
    cfg, model, params = setup
    batch = make_batch(np.random.default_rng(1))
    total, losses = loss_fn(params, batch, model, cfg, jax.random.PRNGKey(2))
    for s in range(3):
        assert f"loss_cls_stage{s}" in losses
        assert f"loss_box_reg_stage{s}" in losses
        assert np.isfinite(float(losses[f"loss_cls_stage{s}"]))
