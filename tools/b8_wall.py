"""B=8 training WALL-clock vs device-step throughput (round-4 loader work).

Round 3 measured a 15.5 ms/it device step at B=8 (517 img/s) but wall
throughput of only 46-217 img/s session-dependent: on the 1-core host the
mapper re-rendered 8 episode canvases per step and re-uploaded ~3.5 MB of
canvas bytes through the relay. Round 4 added (a) the mapper's
(file, scale, flip) canvas cache and (b) the loader's device-resident canvas
memo (data/mapper.py, data/loader.py). This measures the wall/device ratio
after warmup.

Usage: python tools/b8_wall.py [iters=300] [b=8]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np

import jax

from _harness import train_synthetic_fsod


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    # the harness prints wall img/s every log_every; use a short log period
    # so the warm (cache-hit) steady state is visible separately from the
    # first cold epoch
    t0 = time.time()
    run = train_synthetic_fsod(iters=iters, b=b, prefix="b8wall_", log_every=50)
    wall = time.time() - t0
    print(f"total wall {wall:.1f}s for {iters} iters at B={b} "
          f"(incl. compile + cold epoch)", flush=True)

    # warm steady-state: time 50 more steps through the live loader with
    # losses kept on device (one readback at the end)
    from faster_orefsdet_tpu.data.loader import train_canvas, train_loader
    from faster_orefsdet_tpu.data.mapper import EpisodicMapper, SupportSampler
    from faster_orefsdet_tpu.pipelines.train_step import build_train_step
    from faster_orefsdet_tpu.solver import build_optimizer

    import jax.numpy as jnp

    cfg = run.cfg
    tx = build_optimizer(cfg.solver, run.state.params)
    step = build_train_step(cfg, run.model, tx)
    mapper = EpisodicMapper(cfg, SupportSampler(run.entries), is_train=True,
                            canvas_hw=train_canvas(run.records, cfg))
    loader = train_loader(run.records, mapper, b, seed=1)
    state = run.state
    rng = jax.random.PRNGKey(9)
    # warmup: one pass to fill the host+device caches and compile
    for _ in range(30):
        batch = next(loader)
        rng, sub = jax.random.split(rng)
        state, m = step(state, batch, sub)
    float(m["total_loss"])
    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        batch = next(loader)
        rng, sub = jax.random.split(rng)
        state, m = step(state, batch, sub)
    float(m["total_loss"])  # force the chain
    dt = time.perf_counter() - t0
    print(f"warm wall: {dt/n*1000:.1f} ms/it = {b*n/dt:.0f} img/s at B={b} "
          f"(round-3 device step: 15.5 ms/it = 517 img/s)", flush=True)


if __name__ == "__main__":
    main()
