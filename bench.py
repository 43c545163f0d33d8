"""Benchmark: ore detection query-path throughput on the local accelerator.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
Baseline: the reference's 50 FPS batch-1 pure-compute inference on an RTX
2080 Ti at 320-short-side input (BASELINE.md; log :813).

Measures the full jitted query path (backbone → CGM correlation vs support
cache → CenterNet decode+NMS → cascade ROI → final NMS) at the published
eval scale (320x427 content on a 320x448 canvas, 25-shot support cache) in
the bf16 serving configuration.

Timing methodology: on relayed/async backends `block_until_ready` can return
before execution finishes, so every measurement forces a HOST READBACK of the
result. Round-trip latency is measured separately on a trivial op and
subtracted; throughput amortizes the RTT over many dispatches per readback.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def _force(x):
    """Force completion via host readback (works on async relay backends)."""
    return float(jnp.sum(x.scores) + jnp.sum(x.boxes))


def main():
    from faster_orefsdet_tpu.config import get_config
    from faster_orefsdet_tpu.pipelines.inference import (
        build_batched_inference_fn,
        build_inference_fn,
        make_detector,
    )
    from faster_orefsdet_tpu.pipelines.support_cache import SupportCache
    from faster_orefsdet_tpu.utils.params import init_params

    cfg = get_config("finetune_vovnet").replace(compute_dtype="bfloat16")
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

    # ---- RTT of a trivial readback
    tiny = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros(())
    float(tiny(z))
    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(tiny(z))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    # ---- batch-1 latency: single dispatch + readback, RTT-compensated
    infer = build_inference_fn(cfg, model)
    _force(infer(params, cache, image, hw))  # compile
    lats = []
    for _ in range(30):
        t0 = time.perf_counter()
        _force(infer(params, cache, image, hw))
        lats.append(time.perf_counter() - t0)
    lat_raw = float(np.percentile(lats, 50))
    lat = max(lat_raw - rtt, 1e-6)
    fps1 = 1.0 / lat

    # ---- batch-1 sustained throughput: many dispatches per readback
    n = 100
    t0 = time.perf_counter()
    for _ in range(n - 1):
        infer(params, cache, image, hw)
    _force(infer(params, cache, image, hw))
    sustained_fps = n / (time.perf_counter() - t0)

    # ---- batched serving throughput
    batch = 16
    binfer = build_batched_inference_fn(cfg, model)
    images = jnp.asarray(rng.standard_normal((batch, *canvas, 3), dtype=np.float32))
    hws = jnp.tile(hw[None], (batch, 1))
    _force(binfer(params, cache, images, hws))
    nb = 10
    t0 = time.perf_counter()
    for _ in range(nb - 1):
        binfer(params, cache, images, hws)
    _force(binfer(params, cache, images, hws))
    batched_fps = nb * batch / (time.perf_counter() - t0)

    result = {
        "metric": "ore images/sec, batch-1 query path @320px (25-shot cache)",
        "value": round(sustained_fps, 2),
        "unit": "img/s",
        "vs_baseline": round(sustained_fps / 50.0, 3),
        "extra": {
            "p50_latency_ms_rtt_compensated": round(lat * 1000, 3),
            "p50_latency_ms_raw": round(lat_raw * 1000, 3),
            "relay_rtt_ms": round(rtt * 1000, 3),
            "batch16_images_per_sec": round(batched_fps, 2),
            "compute_dtype": cfg.compute_dtype,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
