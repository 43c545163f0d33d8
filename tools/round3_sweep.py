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

from faster_orefsdet_tpu.config import get_config
from faster_orefsdet_tpu.pipelines.inference import make_detector, query_path_single
from faster_orefsdet_tpu.pipelines.support_cache import SupportCache
from faster_orefsdet_tpu.utils.params import init_params


def main():
    batches = [int(a) for a in sys.argv[1:] if a.isdigit()] or [128, 256, 512]
    reps = 10
    cfg = get_config("serving_vovnet_fast")
    model = make_detector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    c = cfg.fpn.out_channels
    rng = np.random.default_rng(0)
    cache = SupportCache(
        p3=jnp.asarray(rng.standard_normal((32, 32, c), dtype=np.float32)),
        p4=jnp.asarray(rng.standard_normal((16, 16, c), dtype=np.float32)),
        p5=jnp.asarray(rng.standard_normal((8, 8, c), dtype=np.float32)),
        rcnn_8=jnp.asarray(rng.standard_normal((8, 8, c), dtype=np.float32)),
        rcnn_4=jnp.asarray(rng.standard_normal((4, 4, c), dtype=np.float32)),
    )
    canvas = (320, 448)

    @jax.jit
    def trivial(x):
        return jnp.sum(x) * 1e-12

    probe = jnp.zeros((8,), jnp.float32)
    float(trivial(probe))
    rtts = []
    for _ in range(8):
        t0 = time.perf_counter()
        float(trivial(probe))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(f"rtt {rtt*1000:.1f} ms")

    for batch in batches:
        images = jnp.asarray(
            rng.standard_normal((batch, *canvas, 3), dtype=np.float32)
        )
        hws = jnp.tile(jnp.asarray([320.0, 427.0])[None], (batch, 1))

        @jax.jit
        def chained(params, cache, images, hws):
            def body(i, carry):
                det = jax.vmap(
                    lambda im, hw: query_path_single(
                        model, params, cache, im + carry, hw, cfg
                    )
                )(images, hws)
                return jnp.sum(det.scores) * 1e-12
            return jax.lax.fori_loop(0, reps, body, jnp.asarray(0.0, images.dtype))

        t0 = time.perf_counter()
        float(chained(params, cache, images, hws))
        print(f"[batch {batch}] compile {time.perf_counter()-t0:.0f}s", flush=True)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(params, cache, images, hws))
            runs.append(time.perf_counter() - t0)
        fps = reps * batch / max(min(runs) - rtt, 1e-9)
        print(f"[batch {batch}] fast preset pure compute: {fps:.0f} img/s "
              f"({1000.0/fps*1:.4f} ms/img x{batch})  vs_baseline {fps/50:.1f}x",
              flush=True)

    # ---- batched training: B=8 vs B=4 (f32 train config, 5-shot, 320x448)
    from faster_orefsdet_tpu.pipelines.train_step import (
        TrainBatch,
        TrainState,
        build_train_step,
    )
    from faster_orefsdet_tpu.solver import build_optimizer

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
            images=jnp.asarray(rng.standard_normal((b, *canvas, 3), dtype=np.float32)),
            image_hw=jnp.asarray([[320.0, 427.0]] * b),
            gt_boxes=jnp.asarray(gtb),
            gt_classes=jnp.zeros((b, nmax), jnp.int32),
            gt_valid=jnp.asarray(gtv),
            support_images=jnp.asarray(
                rng.standard_normal((b, s, 256, 256, 3), dtype=np.float32)
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
