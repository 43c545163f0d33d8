"""Benchmark: ore detection query-path throughput on the local accelerator.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
Baseline: the reference's 50 FPS batch-1 pure-compute inference on an RTX
2080 Ti at 320-short-side input (BASELINE.md; log :813).

Measures the full jitted query path (backbone → CGM correlation vs support
cache → CenterNet decode+NMS → cascade ROI → final NMS) at the published
eval scale (320x427 content on a 320x448 canvas, 25-shot support cache),
batch 1 — apples-to-apples with the reference's timed loop — plus a batched
serving measurement reported in the "extra" field.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from faster_orefsdet_tpu.config import get_config
    from faster_orefsdet_tpu.pipelines.inference import (
        build_batched_inference_fn,
        build_inference_fn,
        make_detector,
    )
    from faster_orefsdet_tpu.pipelines.support_cache import SupportCache
    from faster_orefsdet_tpu.utils.params import init_params

    cfg = get_config("finetune_vovnet")
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
    image = jnp.asarray(rng.standard_normal((*canvas, 3), dtype=np.float32))
    hw = jnp.asarray([320.0, 427.0])

    # ---- batch-1 latency
    infer = build_inference_fn(cfg, model)
    det = infer(params, cache, image, hw)
    det.boxes.block_until_ready()  # compile
    times = []
    for _ in range(50):
        t0 = time.perf_counter()
        det = infer(params, cache, image, hw)
        det.boxes.block_until_ready()
        times.append(time.perf_counter() - t0)
    p50 = float(np.percentile(times, 50))
    fps1 = 1.0 / p50

    # ---- batched serving throughput
    batch = 16
    binfer = build_batched_inference_fn(cfg, model)
    images = jnp.asarray(rng.standard_normal((batch, *canvas, 3), dtype=np.float32))
    hws = jnp.tile(hw[None], (batch, 1))
    det = binfer(params, cache, images, hws)
    det.boxes.block_until_ready()
    bt = []
    for _ in range(10):
        t0 = time.perf_counter()
        det = binfer(params, cache, images, hws)
        det.boxes.block_until_ready()
        bt.append(time.perf_counter() - t0)
    batched_fps = batch / float(np.median(bt))

    result = {
        "metric": "ore images/sec, batch-1 query path @320px (25-shot cache)",
        "value": round(fps1, 2),
        "unit": "img/s",
        "vs_baseline": round(fps1 / 50.0, 3),
        "extra": {
            "p50_latency_ms": round(p50 * 1000, 3),
            "batch16_images_per_sec": round(batched_fps, 2),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
