"""Production-config convergence demo: train at the measured throughput
peak (ims_per_batch=8, the round-3 sweep's knee) for N iters on a larger
synthetic train set, then held-out eval — stability + AP evidence for
batched training (the reference can't do this: its python loop only kept
the last image's losses at B>1, fsod_cen.py:279-307).

Usage: python tools/round3_b8_run.py [iters=2000] [b=8] [n_train=64] [n_val=64]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import sys
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_train = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    n_val = int(sys.argv[4]) if len(sys.argv) > 4 else 64

    from faster_orefsdet_tpu.config import get_config
    from faster_orefsdet_tpu.data.coco import load_coco_json
    from faster_orefsdet_tpu.data.loader import train_canvas, train_loader
    from faster_orefsdet_tpu.data.mapper import EpisodicMapper, SupportSampler
    from faster_orefsdet_tpu.data.synthetic import (
        generate_ore_dataset,
        make_synthetic_setup,
    )
    from faster_orefsdet_tpu.pipelines.evaluate import encode_support_set, evaluate
    from faster_orefsdet_tpu.pipelines.inference import make_detector
    from faster_orefsdet_tpu.pipelines.train_step import TrainState, build_train_step
    from faster_orefsdet_tpu.solver import build_optimizer
    from faster_orefsdet_tpu.utils.params import init_variables

    cfg = get_config("finetune_vovnet")
    cfg = cfg.replace(
        fs=dataclasses.replace(cfg.fs, support_shot=5),
        solver=dataclasses.replace(cfg.solver, max_iter=iters, ims_per_batch=b),
        input=dataclasses.replace(cfg.input, min_size_train=(320,)),
    )
    out = tempfile.mkdtemp(prefix="r3_b8_")
    records, entries = make_synthetic_setup(out, num_images=n_train, seed=0)
    vj, vi = generate_ore_dataset(tempfile.mkdtemp(prefix="r3_b8_val_"),
                                  num_images=n_val, seed=9)
    val_records = load_coco_json(vj, vi)
    print(f"train {len(records)} imgs (B={b}), held-out val {len(val_records)}",
          flush=True)

    model = make_detector(cfg)
    params, batch_stats = init_variables(model, cfg, jax.random.PRNGKey(0))
    tx = build_optimizer(cfg.solver, params)
    step = build_train_step(cfg, model, tx)
    state = TrainState(params, tx.init(params), jnp.asarray(0), batch_stats)
    sampler = SupportSampler(entries)
    mapper = EpisodicMapper(cfg, sampler, is_train=True,
                            canvas_hw=train_canvas(records, cfg))
    loader = train_loader(records, mapper, b, seed=0)
    rng = jax.random.PRNGKey(1)
    losses = []
    t_start = time.time()
    tw, last_it = time.time(), 0
    for it in range(iters):
        batch = next(loader)
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub)
        losses.append(metrics["total_loss"])
        if it % 200 == 0 or it == iters - 1:
            now = time.time()
            print(f"it {it:4d} loss {float(losses[-1]):.3f} "
                  f"({(now - tw) / max(it - last_it, 1) * 1000:.0f} ms/it, "
                  f"{b * max(it - last_it, 1) / max(now - tw, 1e-9):.0f} img/s)",
                  flush=True)
            tw, last_it = now, it
    losses = np.asarray(jax.device_get(jnp.stack(losses)))
    wall = time.time() - t_start
    print(f"loss first20 {losses[:20].mean():.3f} -> last20 {losses[-20:].mean():.3f}; "
          f"{iters} iters x B={b} = {iters*b} images in {wall:.0f}s "
          f"(incl. compile) = {iters*b/wall:.0f} img/s wall", flush=True)
    assert np.isfinite(losses).all(), "non-finite loss"

    cfg24 = cfg.replace(fs=dataclasses.replace(cfg.fs, support_shot=24))
    cache = encode_support_set(model, state.params, entries, cfg24,
                               batch_stats=state.batch_stats)
    res = evaluate(model, state.params, cache, val_records, cfg24,
                   batch_stats=state.batch_stats, batch_size=32)
    print("HELD-OUT:",
          {k: round(v, 2) for k, v in res.items() if k.startswith(("AP", "AR"))},
          flush=True)


if __name__ == "__main__":
    main()
