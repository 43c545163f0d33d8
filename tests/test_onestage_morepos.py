"""Tests: one-stage CenterNetDetector path, MORE_POS mining, fed-loss ops."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from faster_orefsdet_tpu.config import get_config


def test_onestage_inference():
    from faster_orefsdet_tpu.pipelines.onestage import build_onestage_inference_fn

    cfg = get_config("finetune_vovnet")
    cfg = cfg.replace(
        centernet=dataclasses.replace(
            cfg.centernet, num_classes=3, pre_nms_topk_test=128,
            post_nms_topk_test=32, only_proposal=False,
        )
    )
    model, fn = build_onestage_inference_fn(cfg)
    img = jnp.asarray(np.random.default_rng(0).standard_normal((96, 128, 3), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), img[None])["params"]
    det = fn(params, img, jnp.asarray([96.0, 128.0]))
    assert det.boxes.shape == (32, 4)
    assert det.classes.shape == (32,)
    assert int(det.classes.max()) < 3
    assert np.isfinite(np.asarray(det.boxes)).all()


def test_more_pos_mining_shapes_and_center():
    from faster_orefsdet_tpu.ops.heatmap import more_pos_inds

    canvas = (96, 128)
    strides = [8, 16, 32]
    soi = [(0, 64), (48, 192), (128, 1e6)]
    n = 4
    gt = np.zeros((n, 4), np.float32)
    gt[0] = [20, 20, 70, 70]  # diag/2 ≈ 35 → level 0 only
    gt[1] = [10, 10, 100, 90]  # diag/2 ≈ 60 → levels 0,1
    valid = np.asarray([True, True, False, False])
    m = sum((canvas[0] // s) * (canvas[1] // s) for s in strides)
    # perfect predictions at the center pixels → center always selected
    reg_pred = np.full((m, 4), 3.0, np.float32)
    inds, mask = more_pos_inds(
        jnp.asarray(gt), jnp.asarray(valid), jnp.asarray(reg_pred),
        canvas, strides, soi,
    )
    inds = np.asarray(inds).reshape(n, len(strides), 9)
    mask = np.asarray(mask).reshape(n, len(strides), 9)
    # invalid gt contribute nothing
    assert not mask[2:].any()
    # gt0 center (k=4) at level 0 must be positive (loss forced to 0 < thresh)
    assert mask[0, 0, 4]
    # gt0 is out of level 2's size range and reg targets there go negative
    # quickly; at minimum its center-3x3 stays within bounds
    assert (inds >= 0).all() and (inds < m).all()


def test_fed_loss_ops():
    from faster_orefsdet_tpu.ops.fed_loss import (
        fed_loss_class_mask,
        sigmoid_cross_entropy_loss,
    )

    rng = jax.random.PRNGKey(0)
    gt = jnp.asarray([0, 2, 5, 80], jnp.int32)  # 80 = background (C=80)
    mask = fed_loss_class_mask(rng, gt, num_classes=80, num_sample_cats=10)
    mask = np.asarray(mask)
    assert mask.shape == (80,)
    assert mask[[0, 2, 5]].all()  # appeared classes always in
    assert 10 <= mask.sum() <= 13

    scores = jnp.asarray(np.random.default_rng(0).standard_normal((4, 81)), jnp.float32)
    valid = jnp.ones(4, bool)
    loss = sigmoid_cross_entropy_loss(scores, gt, valid)
    assert np.isfinite(float(loss))

    # cross-check against torch BCE semantics
    import torch
    import torch.nn.functional as F

    st = torch.from_numpy(np.asarray(scores))
    tgt = torch.zeros(4, 81)
    tgt[torch.arange(4), torch.from_numpy(np.asarray(gt)).long()] = 1
    ref = F.binary_cross_entropy_with_logits(st[:, :80], tgt[:, :80], reduction="none")
    np.testing.assert_allclose(float(loss), float(ref.sum() / 4), rtol=1e-5)


def test_more_pos_wired_into_train_step():
    """Train step with MORE_POS on runs and produces finite losses."""
    from faster_orefsdet_tpu.pipelines.inference import make_detector
    from faster_orefsdet_tpu.pipelines.train_step import loss_fn
    from faster_orefsdet_tpu.utils.params import init_params
    from test_train_step import make_batch, tiny_cfg

    cfg = tiny_cfg()
    cfg = cfg.replace(centernet=dataclasses.replace(cfg.centernet, more_pos=True))
    model = make_detector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    batch = make_batch(np.random.default_rng(0))
    total, losses = loss_fn(params, batch, model, cfg, jax.random.PRNGKey(1))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
