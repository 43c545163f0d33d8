"""Train-step tests: loss finiteness, gradient flow, frozen masks, schedule."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from faster_orefsdet_tpu.config import get_config
from faster_orefsdet_tpu.pipelines.inference import make_detector
from faster_orefsdet_tpu.pipelines.train_step import (
    TrainBatch,
    TrainState,
    build_train_step,
    loss_fn,
)
from faster_orefsdet_tpu.solver import (
    build_optimizer,
    param_labels,
    warmup_multistep_schedule,
)
from faster_orefsdet_tpu.utils.params import init_params


def tiny_cfg():
    cfg = get_config("finetune_vovnet")
    return cfg.replace(
        centernet=dataclasses.replace(
            cfg.centernet, pre_nms_topk_train=200, post_nms_topk_train=64
        ),
        roi=dataclasses.replace(cfg.roi, batch_size_per_image=32),
        fs=dataclasses.replace(cfg.fs, support_shot=2),
        static=dataclasses.replace(cfg.static, max_gt_per_image=8),
    )


def make_batch(rng, b=1, canvas=(96, 128), s=2, n=8):
    gt_boxes = np.zeros((b, n, 4), np.float32)
    gt_valid = np.zeros((b, n), bool)
    gt_boxes[:, 0] = [10, 10, 50, 60]
    gt_boxes[:, 1] = [40, 30, 90, 80]
    gt_valid[:, :2] = True
    return TrainBatch(
        images=jnp.asarray(rng.standard_normal((b, *canvas, 3), dtype=np.float32)),
        image_hw=jnp.asarray([[90.0, 120.0]] * b),
        gt_boxes=jnp.asarray(gt_boxes),
        gt_classes=jnp.zeros((b, n), jnp.int32),
        gt_valid=jnp.asarray(gt_valid),
        support_images=jnp.asarray(rng.standard_normal((b, s, 64, 64, 3), dtype=np.float32)),
        support_boxes=jnp.asarray(np.tile([[4.0, 4.0, 60.0, 60.0]], (b, s, 1)).astype(np.float32)),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    model = make_detector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    return cfg, model, params


def test_loss_names_and_finiteness(setup):
    cfg, model, params = setup
    batch = make_batch(np.random.default_rng(0))
    total, losses = loss_fn(params, batch, model, cfg, jax.random.PRNGKey(1))
    expected = {
        "loss_centernet_loc",
        "loss_centernet_agn_pos",
        "loss_centernet_agn_neg",
        "loss_cls_stage0",
        "loss_box_reg_stage0",
    }
    assert set(losses) == expected  # reference loss dict names (SURVEY §3.1)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(total) > 0


def test_gradients_flow_and_freeze(setup):
    cfg, model, params = setup
    batch = make_batch(np.random.default_rng(1))
    grads = jax.grad(
        lambda p: loss_fn(p, batch, model, cfg, jax.random.PRNGKey(2))[0]
    )(params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    labels = param_labels(params)
    flat_labels = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_flatten_with_path(labels)[0]
    }
    nonzero_trainable = 0
    for path, g in flat:
        key = jax.tree_util.keystr(path)
        assert np.isfinite(np.asarray(g)).all(), key
        if flat_labels[key] != "frozen" and np.abs(np.asarray(g)).max() > 0:
            nonzero_trainable += 1
    assert nonzero_trainable > 20  # gradient reaches most trainable tensors


def test_frozen_params_not_updated(setup):
    cfg, model, params = setup
    tx = build_optimizer(cfg.solver, params)
    step_fn = build_train_step(cfg, model, tx)
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    batch = make_batch(np.random.default_rng(2))
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(3))
    labels = param_labels(params)

    def check(path, old, new, label):
        if label == "frozen":
            np.testing.assert_array_equal(np.asarray(old), np.asarray(new))

    jax.tree.map(lambda o, n, l: None, params, new_state.params, labels)
    for (p1, old), (_, new), (_, lab) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(new_state.params)[0],
        jax.tree_util.tree_flatten_with_path(labels)[0],
    ):
        if lab == "frozen":
            np.testing.assert_array_equal(np.asarray(old), np.asarray(new))
    # and the head did move
    moved = any(
        lab != "frozen" and np.abs(np.asarray(o) - np.asarray(n)).max() > 0
        for ((_, o), (_, n), (_, lab)) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(new_state.params)[0],
            jax.tree_util.tree_flatten_with_path(labels)[0],
        )
    )
    assert moved
    assert np.isfinite(float(metrics["total_loss"]))


def test_warmup_multistep_schedule():
    cfg = get_config().solver
    sched = warmup_multistep_schedule(cfg)
    # start: base_lr * warmup_factor
    np.testing.assert_allclose(float(sched(0)), cfg.base_lr * cfg.warmup_factor, rtol=1e-6)
    # end of warmup
    np.testing.assert_allclose(float(sched(500)), cfg.base_lr, rtol=1e-6)
    # after first/second milestones
    np.testing.assert_allclose(float(sched(10500)), cfg.base_lr * 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(sched(11500)), cfg.base_lr * 0.01, rtol=1e-6)


def test_param_labels_partition(setup):
    cfg, model, params = setup
    labels = param_labels(params)
    vals = set(jax.tree.leaves(labels))
    assert vals <= {"frozen", "head", "norm", "base"}
    flat = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_flatten_with_path(labels)[0]
    }
    # stem + stage2/3 frozen (FREEZE_AT=3); stage4/5 trainable
    assert any("stem1" in k and v == "frozen" for k, v in flat.items())
    assert any("stage4" in k and v == "base" for k, v in flat.items())
    # predictor heads get the HEAD_LR_FACTOR group
    assert any(v == "head" for v in flat.values())


def test_empty_gt_image_trains_finite(setup):
    """Images whose gt all got filtered (or padded-out) must still produce
    finite losses (background-only ROI sampling, zero heatmap)."""
    cfg, model, params = setup
    batch = make_batch(np.random.default_rng(5))
    batch = batch._replace(gt_valid=jnp.zeros_like(batch.gt_valid))
    total, losses = loss_fn(params, batch, model, cfg, jax.random.PRNGKey(6))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
