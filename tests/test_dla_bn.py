"""Trainable-BN DLA + GroupNorm BiFPN (the finetune_dla norm semantics).

Reference: detectron2.7z!modeling/backbone/dlafpn.py:43-48 (get_norm
DLA.NORM:"BN") and bifpn_fcos.py:162-190 (GN laterals/output convs).
Known divergence (documented in models/dla.py): torch updates running_var
with the UNBIASED batch variance, flax with the biased one — a N/(N-1)
factor on the update term only; normalization itself matches exactly in
both modes.
"""

import dataclasses

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from faster_orefsdet_tpu.models.dla import _ConvBN


def test_convbn_bn_matches_torch_train_and_eval():
    rng = np.random.default_rng(0)
    c_in, c_out = 6, 8
    x = rng.standard_normal((2, 10, 12, c_in)).astype(np.float32)
    m = _ConvBN(c_out, 3, 1, norm="BN")
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # randomize conv + BN affine
    k = rng.standard_normal(v["params"]["conv"]["kernel"].shape).astype(np.float32) * 0.2
    scale = rng.standard_normal(c_out).astype(np.float32) * 0.1 + 1.0
    bias = rng.standard_normal(c_out).astype(np.float32) * 0.1
    v = {
        "params": {"conv": {"kernel": jnp.asarray(k)},
                   "bn": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}},
        "batch_stats": v["batch_stats"],
    }

    # torch twin
    tw = torch.from_numpy(np.transpose(k, (3, 2, 0, 1)).copy())
    tbn = torch.nn.BatchNorm2d(c_out, eps=1e-5, momentum=0.1)
    tbn.weight.data = torch.from_numpy(scale.copy())
    tbn.bias.data = torch.from_numpy(bias.copy())
    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())

    # train mode: normalization by batch stats must match exactly
    y_jax, upd = m.apply(v, jnp.asarray(x), True, mutable=["batch_stats"])
    tbn.train()
    with torch.no_grad():
        y_t = F.relu(tbn(F.conv2d(tx, tw, padding=1)))
    np.testing.assert_allclose(
        np.asarray(y_jax), np.transpose(y_t.numpy(), (0, 2, 3, 1)), atol=2e-5
    )
    # running mean update matches exactly; running var differs only by the
    # Bessel factor N/(N-1) on the update term
    n = x.shape[0] * x.shape[1] * x.shape[2]
    np.testing.assert_allclose(
        np.asarray(upd["batch_stats"]["bn"]["mean"]),
        tbn.running_mean.numpy(), atol=2e-6,
    )
    flax_var = np.asarray(upd["batch_stats"]["bn"]["var"])
    # torch: 0.9*1 + 0.1*unbiased ; flax: 0.9*1 + 0.1*biased
    expected_torch = 0.9 + (flax_var - 0.9) * n / (n - 1)
    np.testing.assert_allclose(tbn.running_var.numpy(), expected_torch, rtol=1e-5)

    # eval mode with identical loaded stats must match exactly
    stats = {"bn": {"mean": jnp.asarray(tbn.running_mean.numpy()),
                    "var": jnp.asarray(tbn.running_var.numpy())}}
    y_eval = m.apply({"params": v["params"], "batch_stats": stats}, jnp.asarray(x))
    tbn.eval()
    with torch.no_grad():
        y_te = F.relu(tbn(F.conv2d(tx, tw, padding=1)))
    np.testing.assert_allclose(
        np.asarray(y_eval), np.transpose(y_te.numpy(), (0, 2, 3, 1)), atol=2e-5
    )


def test_bifpn_gn_matches_torch():
    """SingleBiFPN cell with GN vs a direct torch transcription
    (bifpn_fcos.py:152-258 with norm='GN')."""
    from faster_orefsdet_tpu.models.bifpn import NODES_3LEVEL, SingleBiFPN

    rng = np.random.default_rng(1)
    cin = (8, 16, 32)
    cout = 32  # GroupNorm(32, 32): group size 1
    feats = [
        jnp.asarray(rng.standard_normal((1, 16 // (2 ** i), 16 // (2 ** i), c))
                    .astype(np.float32))
        for i, c in enumerate(cin)
    ]
    m = SingleBiFPN(cout, cin, norm="GN")
    v = m.init(jax.random.PRNGKey(0), feats)
    params = jax.tree.map(
        lambda p: jnp.asarray(rng.standard_normal(p.shape).astype(np.float32) * 0.1),
        v["params"],
    )
    out = m.apply({"params": params}, feats)

    # ---- torch twin
    def conv_gn(x, sub, kernel, padding, use_bias):
        w = torch.from_numpy(
            np.transpose(np.asarray(sub["conv"]["kernel"]), (3, 2, 0, 1)).copy()
        )
        b = (torch.from_numpy(np.asarray(sub["conv"]["bias"]).copy())
             if use_bias else None)
        x = F.conv2d(x, w, b, padding=padding)
        return F.group_norm(
            x, 32,
            torch.from_numpy(np.asarray(sub["gn"]["scale"]).copy()),
            torch.from_numpy(np.asarray(sub["gn"]["bias"]).copy()), eps=1e-5,
        )

    tfeats = [torch.from_numpy(np.transpose(np.asarray(f), (0, 3, 1, 2)).copy())
              for f in feats]
    node_ch = list(cin)
    for feat_level, offsets in NODES_3LEVEL:
        th, twd = tfeats[feat_level].shape[-2:]
        inputs = []
        for off in offsets:
            node = tfeats[off]
            if node_ch[off] != cout:
                node = conv_gn(node, params[f"lateral_{off}_f{feat_level}"],
                               None, 0, use_bias=True)
            h, w_ = node.shape[-2:]
            if h > th and w_ > twd:
                node = F.max_pool2d(node, 3, stride=2, padding=1)
            elif h < th or w_ < twd:
                node = F.interpolate(node, size=(th, twd), mode="nearest")
            inputs.append(node)
        wname = f"weights_f{feat_level}_" + "_".join(map(str, offsets))
        w = F.relu(torch.from_numpy(np.asarray(params[wname]).copy()))
        w = w / (w.sum() + 1e-4)
        fused = sum(wi * xi for wi, xi in zip(w, inputs))
        fused = fused * torch.sigmoid(fused)
        oname = f"output_f{feat_level}_" + "_".join(map(str, offsets))
        tfeats.append(conv_gn(fused, params[oname], None, 1, use_bias=False))
        node_ch.append(cout)
    t_out = [None, None, None]
    for ni in range(len(NODES_3LEVEL) - 1, -1, -1):
        lvl = NODES_3LEVEL[ni][0]
        if t_out[lvl] is None:
            t_out[lvl] = tfeats[len(cin) + ni]

    for lvl in range(3):
        np.testing.assert_allclose(
            np.asarray(out[lvl]),
            np.transpose(t_out[lvl].detach().numpy(), (0, 2, 3, 1)),
            atol=3e-5,
        )


@pytest.fixture(scope="module")
def dla_setup():
    from faster_orefsdet_tpu.config import get_config
    from faster_orefsdet_tpu.pipelines.inference import make_detector
    from faster_orefsdet_tpu.utils.params import init_variables

    cfg = get_config("finetune_dla")
    cfg = cfg.replace(
        centernet=dataclasses.replace(
            cfg.centernet, pre_nms_topk_test=64, post_nms_topk_test=16,
            pre_nms_topk_train=64, post_nms_topk_train=32,
        ),
        roi=dataclasses.replace(cfg.roi, detections_per_image=8,
                                batch_size_per_image=32),
        fpn=dataclasses.replace(cfg.fpn, bifpn_repeats=1),
    )
    model = make_detector(cfg)
    params, batch_stats = init_variables(model, cfg, jax.random.PRNGKey(0))
    return cfg, model, params, batch_stats


def test_dla_bn_init_has_batch_stats(dla_setup):
    cfg, model, params, batch_stats = dla_setup
    assert batch_stats is not None
    flat = jax.tree_util.tree_leaves(batch_stats)
    assert len(flat) > 0
    # BN affine must be trainable (labeled 'norm', not 'frozen')
    from faster_orefsdet_tpu.solver import _path_str, param_labels

    labels = param_labels(params)
    bn_labels = {
        _path_str(p): l
        for p, l in jax.tree_util.tree_flatten_with_path(labels)[0]
        if "/bn/" in _path_str(p)
    }
    assert bn_labels, "no BN params found"
    assert all(l == "norm" for l in bn_labels.values()), bn_labels


def test_dla_bn_train_step_updates_stats_and_infers(dla_setup):
    from faster_orefsdet_tpu.pipelines.inference import query_path_single
    from faster_orefsdet_tpu.pipelines.support_cache import build_support_cache
    from faster_orefsdet_tpu.pipelines.train_step import (
        TrainBatch,
        TrainState,
        build_train_step,
    )
    from faster_orefsdet_tpu.solver import build_optimizer

    cfg, model, params, batch_stats = dla_setup
    rng = np.random.default_rng(2)
    b, s, nmax = 1, 2, 4
    gtb = np.zeros((b, nmax, 4), np.float32)
    gtb[:, 0] = [8, 8, 56, 48]
    gtv = np.zeros((b, nmax), bool)
    gtv[:, 0] = True
    batch = TrainBatch(
        images=jnp.asarray(rng.standard_normal((b, 96, 128, 3)).astype(np.float32)),
        image_hw=jnp.asarray([[96.0, 128.0]] * b),
        gt_boxes=jnp.asarray(gtb),
        gt_classes=jnp.zeros((b, nmax), jnp.int32),
        gt_valid=jnp.asarray(gtv),
        support_images=jnp.asarray(
            rng.standard_normal((b, s, 64, 64, 3)).astype(np.float32)
        ),
        support_boxes=jnp.asarray(
            np.tile([[8.0, 8.0, 56.0, 56.0]], (b, s, 1)).astype(np.float32)
        ),
    )
    tx = build_optimizer(cfg.solver, params)
    step = build_train_step(cfg, model, tx)
    state = TrainState(params, tx.init(params), jnp.asarray(0), batch_stats)
    state2, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"]))
    # running stats moved
    before = np.concatenate(
        [np.ravel(x) for x in jax.tree_util.tree_leaves(batch_stats)]
    )
    after = np.concatenate(
        [np.ravel(x) for x in jax.tree_util.tree_leaves(state2.batch_stats)]
    )
    assert not np.allclose(before, after)

    # eval path with running stats
    cache = build_support_cache(
        model, state2.params,
        jnp.asarray(rng.standard_normal((s, 64, 64, 3)).astype(np.float32)),
        jnp.asarray(np.tile([[8.0, 8.0, 56.0, 56.0]], (s, 1)).astype(np.float32)),
        cfg, batch_stats=state2.batch_stats,
    )
    det = query_path_single(
        model, state2.params, cache,
        jnp.asarray(rng.standard_normal((96, 128, 3)).astype(np.float32)),
        jnp.asarray([96.0, 128.0]), cfg, batch_stats=state2.batch_stats,
    )
    assert np.isfinite(np.asarray(det.boxes)).all()


def test_dla_bn_dp_step_syncs_stats(dla_setup):
    """DP train step with BN state: per-replica stat updates pmean-sync so
    the replicated state stays consistent."""
    from faster_orefsdet_tpu.parallel import make_mesh
    from faster_orefsdet_tpu.parallel.train_dp import (
        build_dp_train_step,
        replicate_state,
        shard_batch,
    )
    from faster_orefsdet_tpu.pipelines.train_step import TrainBatch, TrainState
    from faster_orefsdet_tpu.solver import build_optimizer

    cfg, model, params, batch_stats = dla_setup
    rng = np.random.default_rng(5)
    b, s, nmax = 2, 2, 4
    gtb = np.zeros((b, nmax, 4), np.float32)
    gtb[:, 0] = [8, 8, 56, 48]
    gtv = np.zeros((b, nmax), bool)
    gtv[:, 0] = True
    batch = TrainBatch(
        images=jnp.asarray(rng.standard_normal((b, 96, 128, 3)).astype(np.float32)),
        image_hw=jnp.asarray([[96.0, 128.0]] * b),
        gt_boxes=jnp.asarray(gtb),
        gt_classes=jnp.zeros((b, nmax), jnp.int32),
        gt_valid=jnp.asarray(gtv),
        support_images=jnp.asarray(
            rng.standard_normal((b, s, 64, 64, 3)).astype(np.float32)
        ),
        support_boxes=jnp.asarray(
            np.tile([[8.0, 8.0, 56.0, 56.0]], (b, s, 1)).astype(np.float32)
        ),
    )
    mesh = make_mesh(2)
    tx = build_optimizer(cfg.solver, params)
    step = build_dp_train_step(cfg, model, tx, mesh)
    state = replicate_state(
        TrainState(params, tx.init(params), jnp.asarray(0), batch_stats), mesh
    )
    state2, metrics = step(state, shard_batch(batch, mesh), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"]))
    before = np.concatenate(
        [np.ravel(x) for x in jax.tree_util.tree_leaves(batch_stats)]
    )
    after = np.concatenate(
        [np.ravel(np.asarray(x)) for x in jax.tree_util.tree_leaves(state2.batch_stats)]
    )
    assert not np.allclose(before, after)
