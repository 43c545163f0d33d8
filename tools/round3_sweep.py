"""Round-3 follow-up sweeps on the fast serving preset + batched training.

1. serving_vovnet_fast (post_nms=64, bf16, Pallas NMS) batch sweep — where
   is the knee now that the ROI stage is 4x lighter?
2. batched training: B=8 single dispatch vs B=4 (round-2: 26-33 ms/it).

Usage: python tools/round3_sweep.py [batches...] (default 128 256 512)
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from _harness import (
    chained_serving_fps,
    measure_rtt,
    random_serving_batch,
    random_support_cache,
)

from faster_orefsdet_tpu.config import get_config
from faster_orefsdet_tpu.pipelines.inference import make_detector
from faster_orefsdet_tpu.utils.params import init_params


def main():
    batches = [int(a) for a in sys.argv[1:] if a.isdigit()] or [128, 256, 512]
    cfg = get_config("serving_vovnet_fast")
    model = make_detector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    cache = random_support_cache(cfg)

    rtt = measure_rtt()
    for batch in batches:
        images, hws = random_serving_batch(batch)
        chained_serving_fps(model, cfg, params, cache, images, hws, rtt,
                            label=f"batch {batch} fast preset")

    # ---- batched training: B=8 vs B=4 (f32 train config, 5-shot, 320x448)
    from faster_orefsdet_tpu.pipelines.train_step import (
        TrainBatch,
        TrainState,
        build_train_step,
    )
    from faster_orefsdet_tpu.solver import build_optimizer

    rng_np = np.random.default_rng(0)
    canvas = (320, 448)
    tcfg = get_config("finetune_vovnet")
    tmodel = make_detector(tcfg)
    tparams = init_params(tmodel, tcfg, jax.random.PRNGKey(0))
    for b in (4, 8):
        s, nmax = 5, 20
        gtb = np.zeros((b, nmax, 4), np.float32)
        gtb[:, 0] = [20, 20, 120, 100]
        gtb[:, 1] = [150, 60, 260, 170]
        gtv = np.zeros((b, nmax), bool)
        gtv[:, :2] = True
        tb = TrainBatch(
            images=jnp.asarray(
                rng_np.standard_normal((b, *canvas, 3), dtype=np.float32)
            ),
            image_hw=jnp.asarray([[320.0, 427.0]] * b),
            gt_boxes=jnp.asarray(gtb),
            gt_classes=jnp.zeros((b, nmax), jnp.int32),
            gt_valid=jnp.asarray(gtv),
            support_images=jnp.asarray(
                rng_np.standard_normal((b, s, 256, 256, 3), dtype=np.float32)
            ),
            support_boxes=jnp.asarray(
                np.tile([[20.0, 20.0, 220.0, 220.0]], (b, s, 1)).astype(np.float32)
            ),
        )
        tx = build_optimizer(tcfg.solver, tparams)
        step = build_train_step(tcfg, tmodel, tx)
        state = TrainState(tparams, tx.init(tparams), jnp.asarray(0))
        key = jax.random.PRNGKey(0)
        t0 = time.perf_counter()
        state, m = step(state, tb, key)
        float(m["total_loss"])
        print(f"[train B={b}] compile {time.perf_counter()-t0:.0f}s", flush=True)
        nt = 30
        t0 = time.perf_counter()
        for _ in range(nt - 1):
            state, m = step(state, tb, key)
        state, m = step(state, tb, key)
        float(m["total_loss"])
        dt = (time.perf_counter() - t0) / nt
        print(f"[train B={b}] {dt*1000:.1f} ms/it = {b/dt:.0f} img/s trained",
              flush=True)


if __name__ == "__main__":
    main()
