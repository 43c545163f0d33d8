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


def test_event_logger_chunk_counts(tmp_path):
    """K-step chunks log once per chunk with count=K: time_per_iter must
    divide by optimizer STEPS, and the explicit drain-time flush must write
    rows even when chunk-end steps never hit step % period == 0."""
    import json
    import time

    from faster_orefsdet_tpu.utils.events import EventLogger

    lg = EventLogger(str(tmp_path), period=20, printer=lambda *a: None)
    t0 = lg._last_time
    for chunk in range(3):  # 3 chunks of k=8 -> steps 7, 15, 23 (never %20==0)
        lg.log(chunk * 8 + 7, {"total_loss": 1.0}, count=8)
    lg.flush(24)
    rows = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert len(rows) == 1 and rows[0]["iteration"] == 24
    elapsed = lg._last_time - t0
    # divided by the 24 steps, not the 3 buffered entries
    assert abs(rows[0]["time_per_iter"] - elapsed / 24) < 1e-9
    assert lg._nsteps == 0  # reset after flush


def test_event_logger_no_mid_drain_flush(tmp_path):
    """The k=1 drain pattern (one log per step, one explicit flush per
    window) must write exactly ONE row per window: log() has no internal
    step%period flush, so a step landing on a period boundary mid-drain
    cannot split the window into duplicate-iteration rows with
    misattributed wall time."""
    import json

    from faster_orefsdet_tpu.utils.events import EventLogger

    lg = EventLogger(str(tmp_path), period=20, printer=lambda *a: None)
    for window_end in (20, 40, 60):
        # steps window_end-20 .. window_end-1; several hit step%20==0
        for s in range(window_end - 20, window_end):
            lg.log(s, {"total_loss": 1.0})
        lg.flush(window_end)
    rows = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert [r["iteration"] for r in rows] == [20, 40, 60]


def test_event_logger_weighted_means_and_eval_entries(tmp_path):
    """Unequal chunk sizes weight by step count (per-step mean, not
    mean-of-chunk-means); count=0 eval entries join the row without
    inflating _nsteps; exclude_wall removes eval time from time_per_iter."""
    import json
    import time

    from faster_orefsdet_tpu.utils.events import EventLogger

    lg = EventLogger(str(tmp_path), period=19, printer=lambda *a: None)
    lg.log(7, {"total_loss": 1.0}, count=8)
    lg.log(15, {"total_loss": 1.0}, count=8)
    lg.log(18, {"total_loss": 2.0}, count=3)  # tail chunk, 3 steps
    lg.log(19, {"eval/AP": 50.0}, count=0)  # in-training eval result
    t0 = lg._last_time
    lg.exclude_wall(100.0)  # pretend the eval took 100 s
    assert lg._last_time == t0 + 100.0
    lg._last_time = t0  # undo so time_per_iter stays tiny/positive
    lg.flush(19)
    (row,) = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    # (8*1 + 8*1 + 3*2) / 19, NOT (1+1+2)/3
    assert abs(row["total_loss"] - 22.0 / 19.0) < 1e-9
    assert row["eval/AP"] == 50.0
    assert row["iteration"] == 19
    # 19 optimizer steps in the window (the count=0 entry adds none)
    assert row["time_per_iter"] > 0


def test_train_step_rejects_quantized_config():
    """PTQ presets are serving-only: the quantized convs have no straight-
    through estimator, so training with quantize!='none' must fail fast
    instead of silently learning nothing (pipelines/train_step._check_trainable)."""
    import dataclasses

    import optax
    import pytest

    cfg = dataclasses.replace(tiny_cfg(), quantize="int8")
    model = make_detector(cfg)
    tx = optax.sgd(0.1)
    with pytest.raises(ValueError, match="serving-only"):
        build_train_step(cfg, model, tx)
    with pytest.raises(ValueError, match="serving-only"):
        build_train_step_scan(cfg, model, tx)


def test_inference_builders_memoized():
    """Repeat builds (periodic in-training eval) must return the SAME jitted
    callable so jit's compile cache hits — a fresh closure per call costs a
    full recompile per eval through the axon relay."""
    from faster_orefsdet_tpu.config import get_config
    from faster_orefsdet_tpu.pipelines.inference import (
        build_batched_inference_fn,
        build_inference_fn,
        make_detector,
    )
    from faster_orefsdet_tpu.pipelines.support_cache import _cache_program

    cfg = get_config("finetune_vovnet")
    model = make_detector(cfg)
    assert build_inference_fn(cfg, model) is build_inference_fn(cfg, model)
    assert build_batched_inference_fn(cfg, model) is build_batched_inference_fn(
        cfg, model
    )
    assert _cache_program(model, cfg, False) is _cache_program(model, cfg, False)


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
