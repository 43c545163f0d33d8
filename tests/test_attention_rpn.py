"""AttentionRPN baseline family tests: anchors vs d2 semantics, RPN matching,
hard-negative CE, and the end-to-end jitted paths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from faster_orefsdet_tpu.models.attention_rpn import (
    generate_anchors,
    positional_encoding_table,
    rpn_label_anchors,
)
from faster_orefsdet_tpu.pipelines.attention_rpn import (
    BaselineConfig,
    baseline_inference_single,
    baseline_loss_fn,
    build_baseline_cache,
    hard_negative_ce,
    init_fsod_rcnn_params,
    make_fsod_rcnn,
)
from faster_orefsdet_tpu.pipelines.train_step import TrainBatch
from faster_orefsdet_tpu.structures.instances import GroundTruth


def test_anchor_generation_matches_d2():
    a = np.asarray(generate_anchors((2, 3), 16))
    assert a.shape == (2 * 3 * 15, 4)
    # first cell anchor: size 32, ratio 0.5 -> w = sqrt(1024/0.5), h = 0.5*w
    w = np.sqrt(32 * 32 / 0.5)
    h = 0.5 * w
    np.testing.assert_allclose(a[0], [-w / 2, -h / 2, w / 2, h / 2], rtol=1e-5)
    # centers shift by stride along x for the next cell (row-major)
    np.testing.assert_allclose(a[15] - a[0], [16, 0, 16, 0], atol=1e-5)
    # anchor ordering: sizes outer, ratios inner
    w1 = np.sqrt(32 * 32 / 1.0)
    np.testing.assert_allclose(a[1], [-w1 / 2, -w1 / 2, w1 / 2, w1 / 2], rtol=1e-5)


def test_positional_encoding_matches_torch_formula():
    import torch

    pe = np.asarray(positional_encoding_table(49, 1024))
    position = torch.arange(0.0, 49).unsqueeze(1)
    div = torch.exp(torch.arange(0.0, 1024, 2) * -(np.log(10000.0) / 1024.0))
    ref = torch.zeros(49, 1024)
    ref[:, 0::2] = torch.sin(position * div)
    ref[:, 1::2] = torch.cos(position * div)
    np.testing.assert_allclose(pe, ref.numpy(), rtol=1e-4, atol=1e-5)


def test_rpn_label_anchors_low_quality_and_bands():
    anchors = jnp.asarray(
        [[0, 0, 10, 10], [0, 0, 9, 10], [50, 50, 60, 60], [100, 100, 110, 110]],
        jnp.float32,
    )
    gt = GroundTruth(
        boxes=jnp.asarray([[0.0, 0, 10, 10]]),
        classes=jnp.zeros((1,), jnp.int32),
        valid=jnp.asarray([True]),
    )
    labels, matched = rpn_label_anchors(
        anchors, gt, jax.random.PRNGKey(0), batch_size=4, positive_fraction=0.5
    )
    labels = np.asarray(labels)
    assert labels[0] == 1  # IoU 1.0 >= 0.7
    assert labels[1] == 1  # IoU 0.9 >= 0.7
    assert labels[2] in (0, -1)  # IoU 0 -> negative (or unsampled)
    np.testing.assert_allclose(np.asarray(matched[0]), [0, 0, 10, 10])


def test_hard_negative_ce_selects_fg_and_hard_bg():
    # 8 proposals: 2 fg, 6 bg; bg with high fg-prob should be selected
    scores = jnp.asarray(
        [[5.0, 0], [4.0, 0],  # fg, confident fg (low loss)
         [3.0, 0], [0, 3.0], [0, 4.0], [0, 5.0],  # bg: one hard, three easy
         [2.0, 0], [0, 6.0]],
    )
    gt = jnp.asarray([0, 0, 1, 1, 1, 1, 1, 1], jnp.int32)
    valid = jnp.ones(8, bool)
    loss = float(hard_negative_ce(scores, gt, valid))
    assert np.isfinite(loss) and loss > 0
    # all-bg case must not NaN
    loss2 = float(hard_negative_ce(scores, jnp.ones(8, jnp.int32), valid))
    assert np.isfinite(loss2)


@pytest.fixture(scope="module")
def baseline_setup():
    cfg = BaselineConfig(
        rpn_pre_nms_topk_test=128, rpn_post_nms_topk_test=32,
        rpn_pre_nms_topk_train=128, rpn_post_nms_topk_train=64,
        roi_batch_size=16, detections_per_image=10, support_shot=2,
    )
    model = make_fsod_rcnn(cfg)
    params = init_fsod_rcnn_params(model, jax.random.PRNGKey(0))
    return cfg, model, params


def test_baseline_cache_and_inference(baseline_setup):
    cfg, model, params = baseline_setup
    rng = np.random.default_rng(0)
    sup = jnp.asarray(rng.standard_normal((2, 64, 64, 3), dtype=np.float32))
    boxes = jnp.asarray([[4.0, 4.0, 60.0, 60.0]] * 2)
    cache = build_baseline_cache(model, params, sup, boxes, cfg)
    assert cache.res4_avg.shape == (1, 1, 14, 14, 1024)
    assert cache.res5_avg.shape == (1, 1, 7, 7, 2048)

    img = jnp.asarray(rng.standard_normal((96, 128, 3), dtype=np.float32))
    det = baseline_inference_single(
        model, params, cache, img, jnp.asarray([96.0, 128.0]), cfg
    )
    assert det.boxes.shape == (cfg.detections_per_image, 4)
    assert np.isfinite(np.asarray(det.boxes)).all()


def test_baseline_train_loss(baseline_setup):
    cfg, model, params = baseline_setup
    rng = np.random.default_rng(1)
    gtb = np.zeros((1, 4, 4), np.float32)
    gtb[:, 0] = [10, 10, 60, 60]
    gtv = np.zeros((1, 4), bool)
    gtv[:, 0] = True
    batch = TrainBatch(
        images=jnp.asarray(rng.standard_normal((1, 96, 128, 3), dtype=np.float32)),
        image_hw=jnp.asarray([[96.0, 128.0]]),
        gt_boxes=jnp.asarray(gtb),
        gt_classes=jnp.zeros((1, 4), jnp.int32),
        gt_valid=jnp.asarray(gtv),
        support_images=jnp.asarray(rng.standard_normal((1, 2, 64, 64, 3), dtype=np.float32)),
        support_boxes=jnp.asarray(np.tile([[4.0, 4.0, 60.0, 60.0]], (1, 2, 1)).astype(np.float32)),
    )
    total, losses = baseline_loss_fn(params, batch, model, cfg, jax.random.PRNGKey(2))
    assert set(losses) == {"loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
