"""Data-parallel training tests on the 8-device virtual CPU mesh.

The JAX-native replacement for distributed testing the reference lacks
entirely (SURVEY.md §4: multi-GPU exercised only via real process spawn)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from faster_orefsdet_tpu.config import get_config
from faster_orefsdet_tpu.parallel import (
    build_dp_train_step,
    make_mesh,
    replicate_state,
    shard_batch,
)
from faster_orefsdet_tpu.pipelines.inference import make_detector
from faster_orefsdet_tpu.pipelines.train_step import TrainState, build_train_step
from faster_orefsdet_tpu.solver import build_optimizer
from faster_orefsdet_tpu.utils.params import init_params

from test_train_step import make_batch, tiny_cfg


def test_dp_step_runs_on_8_devices():
    assert len(jax.devices()) >= 8
    cfg = tiny_cfg()
    model = make_detector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    tx = build_optimizer(cfg.solver, params)
    mesh = make_mesh(8)
    step = build_dp_train_step(cfg, model, tx, mesh)

    state = replicate_state(TrainState(params, tx.init(params), jnp.asarray(0)), mesh)
    batch = shard_batch(make_batch(np.random.default_rng(0), b=8), mesh)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(new_state.step) == 1
    # params must remain identical across replicas (pmean'd grads)
    p0 = jax.tree.leaves(new_state.params)[0]
    assert np.isfinite(np.asarray(p0)).all()


def test_dp_grads_match_single_device_when_batch_identical():
    """With identical per-replica batches, DP pmean == single-device grads →
    one step must produce (nearly) identical params."""
    cfg = tiny_cfg()
    model = make_detector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    tx = build_optimizer(cfg.solver, params)

    b1 = make_batch(np.random.default_rng(3), b=1)
    # replicate the same example 8x so every replica sees the same data
    b8 = jax.tree.map(lambda x: jnp.concatenate([x] * 8, axis=0), b1)

    mesh = make_mesh(8)
    dp_step = build_dp_train_step(cfg, model, tx, mesh)
    state = replicate_state(TrainState(params, tx.init(params), jnp.asarray(0)), mesh)
    # NOTE: per-replica rng folding differs from the single-device path, so
    # ROI sampling differs; compare the CenterNet losses (sampling-free).
    _, metrics_dp = dp_step(state, shard_batch(b8, mesh), jax.random.PRNGKey(7))

    single = build_train_step(cfg, model, tx)
    s1 = TrainState(params, tx.init(params), jnp.asarray(0))
    _, metrics_1 = single(s1, b1, jax.random.PRNGKey(7))

    for k in ("loss_centernet_loc", "loss_centernet_agn_pos", "loss_centernet_agn_neg"):
        np.testing.assert_allclose(
            float(metrics_dp[k]), float(metrics_1[k]), rtol=2e-4, atol=1e-5
        )


def test_dp_trajectory_matches_single_device_b8(tmp_path):
    """N-step loss-TRAJECTORY equality: 8-device DP over B=8 batches vs a
    single-device B=8 run on the same data order, plus orbax checkpoint
    interchange across the two topologies (the reference's DDP +
    DetectionCheckpointer story, engine/launch.py:27-125 +
    checkpoint/detection_checkpoint.py, made provable).

    The rng contract (loss_fn: ROI-sampling keys folded by GLOBAL example
    index) makes the two runs draw identical proposal subsamples;
    deterministic=True disables SM-block dropout (whose mask shapes are
    topology-dependent). Remaining deltas are float reduction order only."""
    from faster_orefsdet_tpu.utils.checkpoint import resume_or_load, save_checkpoint

    cfg = tiny_cfg()
    model = make_detector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    tx = build_optimizer(cfg.solver, params)
    n_steps = 4
    batches = [make_batch(np.random.default_rng(100 + i), b=8) for i in range(n_steps)]
    keys = [jax.random.PRNGKey(200 + i) for i in range(n_steps)]

    single = build_train_step(cfg, model, tx, deterministic=True)
    s1 = TrainState(params, tx.init(params), jnp.asarray(0))
    traj1 = []
    for b, k in zip(batches, keys):
        s1, m = single(s1, b, k)
        traj1.append({kk: float(v) for kk, v in m.items()})

    mesh = make_mesh(8)
    dp_step = build_dp_train_step(cfg, model, tx, mesh, deterministic=True)
    sdp = replicate_state(TrainState(params, tx.init(params), jnp.asarray(0)), mesh)
    trajdp = []
    for b, k in zip(batches, keys):
        sdp, m = dp_step(sdp, shard_batch(b, mesh), k)
        trajdp.append({kk: float(v) for kk, v in m.items()})

    for i, (m1, mdp) in enumerate(zip(traj1, trajdp)):
        assert m1.keys() == mdp.keys()
        for kk in m1:
            np.testing.assert_allclose(
                mdp[kk], m1[kk], rtol=5e-4, atol=1e-5,
                err_msg=f"step {i} metric {kk}",
            )
    # final params equal across topologies (up to float reduction order)
    for p1, pdp in zip(jax.tree.leaves(s1.params), jax.tree.leaves(sdp.params)):
        np.testing.assert_allclose(
            np.asarray(pdp), np.asarray(p1), rtol=1e-4, atol=1e-6
        )

    # ---- checkpoint interchange: DP-written -> single-device resume
    dp_dir = str(tmp_path / "dp_ckpt")
    save_checkpoint(dp_dir, jax.device_get(sdp), n_steps)
    template = TrainState(params, tx.init(params), jnp.asarray(0))
    restored = resume_or_load(dp_dir, template)
    for p1, pr in zip(jax.tree.leaves(sdp.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(pr), np.asarray(p1))
    s_next, m = single(restored, batches[0], jax.random.PRNGKey(999))
    assert np.isfinite(float(m["total_loss"]))
    assert int(s_next.step) == n_steps + 1

    # ---- single-device-written -> DP resume
    sd_dir = str(tmp_path / "sd_ckpt")
    save_checkpoint(sd_dir, jax.device_get(s1), n_steps)
    restored2 = replicate_state(resume_or_load(sd_dir, template), mesh)
    sdp2, mdp2 = dp_step(restored2, shard_batch(batches[0], mesh), jax.random.PRNGKey(999))
    assert np.isfinite(float(mdp2["total_loss"]))
    # same batch + same key from the same params: the two topologies'
    # continuation steps must agree too
    np.testing.assert_allclose(
        float(mdp2["total_loss"]), float(m["total_loss"]), rtol=5e-4, atol=1e-5
    )
