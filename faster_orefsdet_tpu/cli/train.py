"""Train/eval CLI — the fsod_train_net.py equivalent.

Usage:
  python -m faster_orefsdet_tpu.cli.train \
      --config finetune_vovnet \
      --train-json datasets/coco/annotations/instances_train2017.json \
      --train-images datasets/coco/train2017 \
      --support-index datasets/coco/support_index.json \
      [--eval-only --test-json ... --test-images ...] \
      [--resume] [--num-devices N] [fs.support_shot=25 ...]

Mirrors the reference flow (fsod_train_net.py:36-118): build config (+ CLI
key=value overrides), construct loaders/optimizer, train with periodic
checkpoints, or run eval-only. Multi-device data parallelism replaces the
reference's NCCL launch (engine/launch.py) with a jax.sharding Mesh —
single-program, no process spawning.
"""

from __future__ import annotations

import argparse
import os
import time


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="finetune_vovnet")
    p.add_argument(
        "--config-file",
        help="detectron2-style yaml with _BASE_ inheritance (configs/fsod/*.yaml);"
        " overrides --config",
    )
    p.add_argument("--train-json")
    p.add_argument("--train-images")
    p.add_argument("--test-json")
    p.add_argument("--test-images")
    p.add_argument("--support-index", help="support crop index json (data.coco)")
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--init-npz", help="initial params .npz (e.g. converted torch weights)")
    p.add_argument("--num-devices", type=int, default=0, help="0 = all local devices")
    p.add_argument(
        "--eval-batch", type=int, default=8,
        help="eval images per device dispatch (amortizes dispatch latency; "
        "identical detections to batch 1)",
    )
    p.add_argument("--max-iter", type=int, default=0, help="override solver.max_iter")
    p.add_argument(
        "--steps-per-dispatch", type=int, default=1,
        help="fuse K SGD steps into one XLA program (lax.scan) — amortizes "
        "the per-dispatch relay RTT K-fold on remote TPU setups; identical "
        "numerics to K single steps (tests/test_train_scan.py). "
        "Single-device only; metrics log as per-chunk means. Checkpoints "
        "and evals fire at the first chunk BOUNDARY that crosses their "
        "period (e.g. period=1000, K=8 saves at 1004) — pick K dividing "
        "the periods for exact cadence",
    )
    p.add_argument(
        "--eval-period", type=int, default=None,
        help="run eval on --test-json every N train iters (and at max_iter), "
        "like d2's EvalHook (engine/defaults.py:461 wired by TEST.EVAL_PERIOD); "
        "defaults to the config's eval_period (yaml TEST.EVAL_PERIOD); 0 = off "
        "(the reference ships with EVAL_PERIOD commented out, "
        "finetune_vovnet.yaml:73)",
    )
    p.add_argument("--output-dir", default=None)
    p.add_argument("opts", nargs="*", help="config overrides key=value")
    return p.parse_args()


def main():
    args = parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..config import apply_overrides, get_config
    from ..data.coco import load_coco_json, load_support_index, split_per_class
    from ..data.loader import collate, train_canvas, train_loader
    from ..data.mapper import EpisodicMapper, SupportSampler
    from ..pipelines.evaluate import encode_support_set, evaluate
    from ..pipelines.inference import make_detector
    from ..pipelines.train_step import TrainState, build_train_step
    from ..solver import build_optimizer
    from ..utils.checkpoint import (
        load_params_npz,
        resume_or_load,
        save_checkpoint,
        save_params_npz,
    )
    from ..utils.events import EventLogger, drain_device_metrics
    from ..utils.params import init_variables

    if args.config_file:
        from ..config_yaml import load_yaml_config

        cfg = load_yaml_config(args.config_file)
    else:
        cfg = get_config(args.config)
    cfg = apply_overrides(cfg, args.opts)
    if args.output_dir:
        cfg = cfg.replace(output_dir=args.output_dir)
    os.makedirs(cfg.output_dir, exist_ok=True)

    model = make_detector(cfg)
    # batch_stats is None except for trainable-BN backbones (finetune_dla)
    params, batch_stats = init_variables(model, cfg, jax.random.PRNGKey(cfg.seed))
    if args.init_npz:
        params = load_params_npz(args.init_npz, params)
        # trainable-BN configs save running stats next to the params export
        stats_npz = os.path.join(os.path.dirname(args.init_npz), "batch_stats.npz")
        if batch_stats is not None and os.path.exists(stats_npz):
            batch_stats = load_params_npz(stats_npz, batch_stats)

    support_entries = load_support_index(args.support_index) if args.support_index else []

    if args.eval_only:
        records = load_coco_json(args.test_json, args.test_images)
        cache = encode_support_set(
            model, params, support_entries, cfg, batch_stats=batch_stats
        )
        n_dev = args.num_devices or len(jax.devices())
        if n_dev > 1:
            from ..parallel import make_mesh
            from ..parallel.eval_dp import evaluate_sharded

            results = evaluate_sharded(
                model, params, cache, records, cfg, make_mesh(n_dev),
                batch_stats=batch_stats,
            )
        else:
            results = evaluate(
                model, params, cache, records, cfg, batch_stats=batch_stats,
                batch_size=max(1, args.eval_batch),
            )
        print({k: round(v, 3) for k, v in results.items()})
        return results

    # ---- training
    records = split_per_class(load_coco_json(args.train_json, args.train_images))
    sampler = SupportSampler(support_entries)
    mapper = EpisodicMapper(cfg, sampler, is_train=True,
                            canvas_hw=train_canvas(records, cfg))
    loader = train_loader(records, mapper, cfg.solver.ims_per_batch, seed=cfg.seed)

    tx = build_optimizer(cfg.solver, params)
    n_dev = args.num_devices or len(jax.devices())
    mesh = None
    if n_dev > 1:
        # data-parallel over the mesh (replaces the reference's NCCL launch)
        from ..parallel import build_dp_train_step, make_mesh, replicate_state, shard_batch

        assert cfg.solver.ims_per_batch % n_dev == 0, (
            f"ims_per_batch {cfg.solver.ims_per_batch} must divide over {n_dev} devices"
        )
        mesh = make_mesh(n_dev)
        step_fn = build_dp_train_step(cfg, model, tx, mesh)
    else:
        step_fn = build_train_step(cfg, model, tx)
    state = TrainState(params, tx.init(params), jnp.asarray(0), batch_stats)
    ckpt_dir = os.path.join(cfg.output_dir, "checkpoints")
    if args.resume:
        state = resume_or_load(ckpt_dir, state)
    if mesh is not None:
        state = replicate_state(state, mesh)

    eval_period = args.eval_period if args.eval_period is not None else cfg.eval_period
    eval_records = None
    if eval_period > 0:
        assert args.test_json, "--eval-period requires --test-json/--test-images"
        eval_records = load_coco_json(args.test_json, args.test_images)

    def run_eval(st):
        # pull (possibly mesh-replicated) params to host once per eval; the
        # eval programs then stage them on the default device
        p = jax.device_get(st.params)
        bs = jax.device_get(st.batch_stats) if st.batch_stats is not None else None
        cache = encode_support_set(model, p, support_entries, cfg, batch_stats=bs)
        return evaluate(
            model, p, cache, eval_records, cfg, batch_stats=bs,
            batch_size=max(1, args.eval_batch),
        )

    logger = EventLogger(cfg.output_dir)
    max_iter = args.max_iter or cfg.solver.max_iter
    rng = jax.random.PRNGKey(cfg.seed + 1)
    start = int(state.step)
    k = max(1, args.steps_per_dispatch)
    if k > 1:
        assert mesh is None, "--steps-per-dispatch composes with single-device only"
        from ..pipelines.train_step import build_train_step_scan

        step_k_fn = build_train_step_scan(cfg, model, tx)
        if (max_iter - start) % k != 0:
            # no silent compiles: the tail chunk's shorter scan is a brand-
            # new XLA program (minutes through the remote-compile relay)
            print(
                f"note: {max_iter - start} remaining iters not divisible by "
                f"--steps-per-dispatch {k}; the final "
                f"{(max_iter - start) % k}-step chunk compiles a separate "
                f"program — pick a divisible --max-iter to avoid it"
            )

    def crossed(period, it0, it1):
        return period > 0 and (it1 // period > it0 // period or it1 == max_iter)

    pending = []  # (step, device metrics) — drained in one readback per period
    pcounts = []  # optimizer steps each pending entry aggregates
    steps_pending = 0
    it = start
    while it < max_iter:
        kk = min(k, max_iter - it)
        if kk == 1:
            batch = next(loader)
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, batch, sub)
        else:
            # K steps per dispatch: one scan program, same rng split
            # sequence as K single steps (pipelines.train_step.run_scan_chunk)
            from ..pipelines.train_step import run_scan_chunk

            state, rng, mk = run_scan_chunk(step_k_fn, state, loader, rng, kk)
            metrics = {name: jnp.mean(v) for name, v in mk.items()}
        it1 = it + kk
        pending.append((it1 - 1, metrics))
        pcounts.append(kk)
        steps_pending += kk
        if eval_records is not None and crossed(eval_period, it, it1):
            # eval BEFORE the drain/flush: at it1 == max_iter the scalars
            # then join the final row instead of landing in a second row
            # with the same iteration label and a bogus time_per_iter
            t_eval = time.perf_counter()
            results = run_eval(state)
            print(f"eval @{it1}: " + str({k_: round(v, 3) for k_, v in results.items()}))
            # count=0: eval scalars join the next row without inflating its
            # step count; exclude_wall keeps eval minutes out of
            # time_per_iter
            logger.log(it1, {f"eval/{k_}": v for k_, v in results.items()}, count=0)
            logger.exclude_wall(time.perf_counter() - t_eval)
        if steps_pending >= logger.period or it1 == max_iter:
            for (s, m), c in zip(drain_device_metrics(pending), pcounts):
                logger.log(s, m, count=c)
            # explicit flush: with k>1 the logged steps are chunk ends and
            # can miss every step%period==0 point — without this, a whole
            # run produces no terminal progress and no metrics.jsonl rows
            logger.flush(it1)
            pending, pcounts, steps_pending = [], [], 0
        if crossed(cfg.solver.checkpoint_period, it, it1):
            save_checkpoint(ckpt_dir, state, it1)
        it = it1
    logger.flush(max_iter)  # short runs (< period iters) still get metrics.jsonl
    save_params_npz(os.path.join(cfg.output_dir, "model_final.npz"), state.params)
    if state.batch_stats is not None:
        save_params_npz(
            os.path.join(cfg.output_dir, "batch_stats.npz"), state.batch_stats
        )
    print(f"training done: {max_iter} iters; params saved to {cfg.output_dir}/model_final.npz")


if __name__ == "__main__":
    main()
