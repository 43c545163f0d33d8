"""Synthetic-ore convergence run (any named config) on the local accelerator.

Usage: python tools/train_synthetic.py [config_name] [iters] [shot] [scale] [k]
Generates a synthetic ore dataset, fine-tunes the detector episodically, and
reports loss trajectory + train-set AP — the round-1 convergence evidence
harness (RESULTS.md "Training" table). k>1 fuses k SGD steps per dispatch
via build_train_step_scan (amortizes the relay RTT k-fold)."""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "finetune_vovnet"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    shot = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    import dataclasses
    import tempfile

    from faster_orefsdet_tpu.config import get_config
    from faster_orefsdet_tpu.data.loader import train_canvas, train_loader
    from faster_orefsdet_tpu.data.mapper import EpisodicMapper, SupportSampler
    from faster_orefsdet_tpu.data.synthetic import make_synthetic_setup
    from faster_orefsdet_tpu.pipelines.evaluate import encode_support_set, evaluate
    from faster_orefsdet_tpu.pipelines.inference import make_detector
    from faster_orefsdet_tpu.pipelines.train_step import TrainState, build_train_step
    from faster_orefsdet_tpu.solver import build_optimizer
    from faster_orefsdet_tpu.utils.params import init_variables

    cfg = get_config(name)
    cfg = cfg.replace(
        fs=dataclasses.replace(cfg.fs, support_shot=shot),
        solver=dataclasses.replace(cfg.solver, max_iter=iters),
    )
    if len(sys.argv) > 4:  # optional single train scale, e.g. 320
        ms = int(sys.argv[4])
        cfg = cfg.replace(input=dataclasses.replace(cfg.input, min_size_train=(ms,)))
    out = tempfile.mkdtemp(prefix="synth_ore_")
    records, entries = make_synthetic_setup(out, num_images=16, seed=0)

    model = make_detector(cfg)
    params, batch_stats = init_variables(model, cfg, jax.random.PRNGKey(0))
    tx = build_optimizer(cfg.solver, params)
    step = build_train_step(cfg, model, tx)
    state = TrainState(params, tx.init(params), jnp.asarray(0), batch_stats)

    sampler = SupportSampler(entries)
    mapper = EpisodicMapper(cfg, sampler, is_train=True,
                            canvas_hw=train_canvas(records, cfg))
    loader = train_loader(records, mapper, cfg.solver.ims_per_batch, seed=0)

    k = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    if k > 1:
        from faster_orefsdet_tpu.pipelines.train_step import build_train_step_scan

        step_k = build_train_step_scan(cfg, model, tx)
        if iters % k != 0:
            print(f"note: {iters} iters % k={k} != 0 — the {iters % k}-step "
                  "tail chunk compiles one extra program", flush=True)

    rng = jax.random.PRNGKey(1)
    losses = []  # device arrays ([1] or [kk]) — read back in bulk at the end
    tw = time.time()
    last_it = 0
    it = 0
    while it < iters:
        kk = min(k, iters - it)
        if kk == 1:
            batch = next(loader)
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, batch, sub)
            losses.append(metrics["total_loss"][None])
        else:
            from faster_orefsdet_tpu.pipelines.train_step import run_scan_chunk

            state, rng, mk = run_scan_chunk(step_k, state, loader, rng, kk)
            losses.append(mk["total_loss"])  # [kk] — per-STEP losses, so the
            # first20/last20 summary below stays comparable across k values
        it += kk
        if (it - kk) % 20 < kk or it == iters:
            now = time.time()  # marginal window ms/it (first window = compile)
            print(f"it {it - 1:4d}  loss {float(losses[-1][-1]):.3f}  "
                  f"({(now - tw) / max(it - last_it, 1) * 1000:.0f} ms/it)",
                  flush=True)
            tw, last_it = time.time(), it
    losses = np.concatenate(jax.device_get(losses))
    print(f"loss first20 {np.mean(losses[:20]):.3f} -> last20 {np.mean(losses[-20:]):.3f}")

    cache = encode_support_set(model, state.params, entries, cfg,
                               batch_stats=state.batch_stats)
    res = evaluate(model, state.params, cache, records, cfg,
                   batch_stats=state.batch_stats, batch_size=8)
    print({k: round(v, 2) for k, v in res.items() if k.startswith("AP") or k == "fps"})


if __name__ == "__main__":
    main()
