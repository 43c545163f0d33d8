"""Measure the round-4 pipelined dispatch levers on the live accelerator.

Round-3 VERDICT weak #2: the bench dispatch loop ran at ~2/3 of pure
compute because every dispatch ships the full ~170-leaf param pytree
through the relay RPC. This tool A/Bs, at batch 1 on the parity config:

  1. plain dispatch loop   — build_inference_fn(params, cache, image, hw)
  2. pinned dispatch loop  — build_pinned_inference_fn (weights captured)
  3. pipelined served loop — pinned + ThreadPoolExecutor readbacks: every
     result fetched to the host while later dispatches proceed
     (the AsyncPredictor mechanism, pipelines/async_predictor.py)

plus the pure-compute chained figure for the same program as the ceiling.

Usage: python tools/pipelined_bench.py [n=300]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

import jax
import jax.numpy as jnp

from _harness import SERVING_HW, measure_rtt, random_support_cache


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 300
    batched_only = "--batched-only" in sys.argv

    from faster_orefsdet_tpu.config import get_config
    from faster_orefsdet_tpu.pipelines.inference import (
        build_inference_fn,
        build_pinned_inference_fn,
        make_detector,
        query_path_single,
    )
    from faster_orefsdet_tpu.utils.params import init_params

    cfg = get_config("finetune_vovnet").replace(compute_dtype="bfloat16")
    model = make_detector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    cache = random_support_cache(cfg)
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.standard_normal((320, 448, 3), dtype=np.float32))
    hw = jnp.asarray(list(SERVING_HW))

    rtt = measure_rtt()

    if batched_only:
        _batched_row(cfg, params, cache, hw)
        return

    # pure-compute ceiling (chained)
    @jax.jit
    def chained(params, cache, image, hw):
        def body(i, carry):
            det = query_path_single(model, params, cache, image + carry, hw, cfg)
            return jnp.sum(det.scores) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, image.dtype))

    float(chained(params, cache, image, hw))
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(params, cache, image, hw))
        runs.append(time.perf_counter() - t0)
    pure = n / max(min(runs) - rtt, 1e-9)
    print(f"pure compute (chained {n}): {pure:.0f} img/s", flush=True)

    # 1. plain dispatch loop
    infer = build_inference_fn(cfg, model)
    float(jnp.sum(infer(params, cache, image, hw).scores))
    t0 = time.perf_counter()
    for _ in range(n - 1):
        infer(params, cache, image, hw)
    float(jnp.sum(infer(params, cache, image, hw).scores))
    plain = n / (time.perf_counter() - t0)
    print(f"plain dispatch loop: {plain:.0f} img/s "
          f"({plain/pure:.2f}x of pure)", flush=True)

    # 2. pinned dispatch loop (packed single-array result)
    pinned = build_pinned_inference_fn(cfg, params, cache, model=model, packed=True)
    float(jnp.sum(pinned(image, hw)))
    t0 = time.perf_counter()
    for _ in range(n - 1):
        pinned(image, hw)
    float(jnp.sum(pinned(image, hw)))
    pin = n / (time.perf_counter() - t0)
    print(f"pinned dispatch loop: {pin:.0f} img/s "
          f"({pin/pure:.2f}x of pure)", flush=True)

    # 2b. AOT-compiled executable call (bypasses the jit dispatch cache)
    aot = jax.jit(lambda im, hw: pinned(im, hw)).lower(image, hw).compile()
    float(jnp.sum(aot(image, hw)))
    t0 = time.perf_counter()
    for _ in range(n - 1):
        aot(image, hw)
    float(jnp.sum(aot(image, hw)))
    aotr = n / (time.perf_counter() - t0)
    print(f"AOT dispatch loop: {aotr:.0f} img/s "
          f"({aotr/pure:.2f}x of pure)", flush=True)

    # 3. pipelined served loop — every result fetched to the host. packed
    # result = ONE readback per image (scores+valid+boxes in one array)
    def read(packed):
        return np.asarray(packed)

    for workers, window in ((32, 96), (64, 192)):
        got = 0
        with ThreadPoolExecutor(max_workers=workers) as pool:
            t0 = time.perf_counter()
            futs = []
            for _ in range(n):
                futs.append(pool.submit(read, pinned(image, hw)))
                if len(futs) > window:
                    futs.pop(0).result()
                    got += 1
            for f in futs:
                f.result()
                got += 1
            served = got / (time.perf_counter() - t0)
        print(f"pipelined served loop (workers={workers}, window={window}): "
              f"{served:.0f} img/s ({served/pure:.2f}x of pure, every result "
              "on host)", flush=True)

    # 4. host-driven BATCHED serving (fast preset, batch 128): dispatch
    # loop + pooled per-batch readbacks — the ">=3k img/s host-driven" row
    _batched_row(cfg, params, cache, hw)


def _batched_row(cfg, params, cache, hw):
    from faster_orefsdet_tpu.config import get_config
    from faster_orefsdet_tpu.pipelines.inference import (
        build_batched_inference_fn,
        make_detector,
        pack_detections,
    )

    fcfg = get_config("serving_vovnet_fast")
    fmodel = make_detector(fcfg)
    binfer = build_batched_inference_fn(fcfg, fmodel)

    @jax.jit
    def bpacked(params, cache, images, hws):
        return pack_detections(binfer(params, cache, images, hws))

    def read(packed):
        return np.asarray(packed)

    batch = 128
    images = jnp.asarray(
        np.random.default_rng(1).standard_normal((batch, 320, 448, 3),
                                                 dtype=np.float32))
    hws = jnp.tile(hw[None], (batch, 1))
    np.asarray(bpacked(params, cache, images, hws))  # compile
    nb = 40
    for workers, window in ((1, 0), (4, 4)):
        got = 0
        with ThreadPoolExecutor(max_workers=workers) as pool:
            t0 = time.perf_counter()
            futs = []
            for _ in range(nb):
                futs.append(pool.submit(read, bpacked(params, cache, images, hws)))
                if len(futs) > window:
                    futs.pop(0).result()
                    got += 1
            for f in futs:
                f.result()
                got += 1
            served = got * batch / (time.perf_counter() - t0)
        print(f"host-driven batched serving (fast preset, batch {batch}, "
              f"workers={workers}, window={window}): {served:.0f} img/s",
              flush=True)


if __name__ == "__main__":
    main()
