"""Scan-fused multi-step training == K single steps (pipelines/train_step.
build_train_step_scan). The K-step program exists to amortize per-dispatch
relay RTT (no reference analog — a torch trainer must dispatch per step);
it must be numerically identical to the sequential loop given the same
per-step rng keys and batches."""

import numpy as np

import jax
import jax.numpy as jnp

from faster_orefsdet_tpu.pipelines.inference import make_detector
from faster_orefsdet_tpu.pipelines.train_step import (
    TrainState,
    build_train_step,
    build_train_step_scan,
)
from faster_orefsdet_tpu.solver import build_optimizer
from faster_orefsdet_tpu.utils.params import init_params

from test_train_step import make_batch, tiny_cfg


def test_scan_k_steps_match_sequential():
    cfg = tiny_cfg()
    model = make_detector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    tx = build_optimizer(cfg.solver, params)

    rng_np = np.random.default_rng(0)
    k = 3
    batches = [make_batch(rng_np) for _ in range(k)]
    keys = jax.random.split(jax.random.PRNGKey(42), k)

    # sequential
    step = build_train_step(cfg, model, tx)
    st_seq = TrainState(params, tx.init(params), jnp.asarray(0))
    seq_losses = []
    for i in range(k):
        st_seq, m = step(st_seq, batches[i], keys[i])
        seq_losses.append(float(m["total_loss"]))

    # scan-fused
    step_k = build_train_step_scan(cfg, model, tx)
    st_scan = TrainState(params, tx.init(params), jnp.asarray(0))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    st_scan, mk = step_k(st_scan, stacked, keys)

    np.testing.assert_allclose(
        np.asarray(mk["total_loss"]), np.asarray(seq_losses), rtol=1e-5
    )
    assert int(st_scan.step) == k
    # final params identical (same SGD trajectory)
    for pth, v in jax.tree_util.tree_flatten_with_path(st_seq.params)[0]:
        v2 = st_scan.params
        for p in pth:
            v2 = v2[p.key]
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(v2), rtol=2e-5, atol=1e-7,
            err_msg=str(pth),
        )
