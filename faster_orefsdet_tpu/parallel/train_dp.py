"""Data-parallel training over a device mesh via shard_map.

Reproduces the reference's three collective uses (SURVEY.md §5) the XLA way:
  - gradient all-reduce (DDP backward, engine/defaults.py:60-80) → psum-mean
    of grads inside the shard_mapped step;
  - loss-normalizer all-reduce (reduce_sum of num_pos,
    CenterNet2/.../dense_heads/utils.py:32-38 used at fsod_rpn.py:719-754)
    → jax.lax.psum inside loss_fn (wired via axis_name);
  - eval gather (detectron2.utils.comm) → host-side concat of per-device
    results (evaluation shards the image list).

Params are replicated; the batch is sharded on its leading axis. The whole
step is ONE jitted program — XLA schedules the collectives on ICI.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import Config
from ..models.detector import CenterNet2Detector
from ..pipelines.train_step import TrainBatch, TrainState, loss_fn


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), state)


def shard_batch(batch: TrainBatch, mesh: Mesh, axis_name: str = "data") -> TrainBatch:
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def build_dp_train_step(
    cfg: Config,
    model: CenterNet2Detector,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    axis_name: str = "data",
    deterministic: bool = False,
):
    """Returns jitted (state, batch, rng) -> (state, metrics).

    state: replicated; batch: leading dim divisible by mesh size; rng: a
    PRNGKey (replicated). Per-replica decorrelation happens INSIDE loss_fn:
    dropout keys fold in the axis index, ROI-sampling keys fold in the
    global example index — so the DP run draws the same proposal subsamples
    as a single-device run over the same global batch (the trajectory-
    equality contract, tests/test_parallel_dp.py)."""

    def per_replica(state: TrainState, batch: TrainBatch, rng: jax.Array):
        if state.batch_stats is None:
            (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, model, cfg, rng, axis_name,
                deterministic=deterministic,
            )
            new_stats = None
        else:
            (total, (losses, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, batch, model, cfg, rng, axis_name, state.batch_stats,
              deterministic=deterministic)
            # keep the replicated state consistent: average the per-replica BN
            # stat updates (cross-replica stat averaging — the yaml's multi-card
            # variant uses SyncBN, finetune_dla.yaml DLA.NORM comment)
            new_stats = jax.lax.pmean(new_stats, axis_name)
        grads = jax.lax.pmean(grads, axis_name)  # DDP gradient all-reduce
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"total_loss": total, **losses}
        metrics = jax.lax.pmean(metrics, axis_name)
        return TrainState(params, opt_state, state.step + 1, new_stats), metrics

    def make_step(state, batch):
        state_specs = jax.tree.map(lambda _: P(), state)
        batch_specs = jax.tree.map(lambda _: P(axis_name), batch)
        return shard_map(
            per_replica,
            mesh=mesh,
            in_specs=(state_specs, batch_specs, P()),
            out_specs=(state_specs, P()),
            check_vma=False,
        )

    @jax.jit
    def step(state: TrainState, batch: TrainBatch, rng: jax.Array):
        return make_step(state, batch)(state, batch, rng)

    return step
