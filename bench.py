"""Benchmark: ore detection query-path throughput on the local accelerator.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
Baseline: the reference's 50 FPS batch-1 pure-compute inference on an RTX
2080 Ti at 320-short-side input (BASELINE.md; log :813).

Measures the full jitted query path (backbone → CGM correlation vs support
cache → CenterNet decode+NMS → cascade ROI → final NMS) at the published
eval scale (320x427 content on a 320x448 canvas, 25-shot support cache) in
the bf16 serving configuration.

Timing methodology: on relayed/async backends `block_until_ready` can return
before execution finishes, so measurements force HOST READBACKS. The
HEADLINE number is pure device compute: N query-path iterations chained with
a data dependency inside ONE XLA program, one dispatch + one readback —
matching the reference's own "pure compute time" telemetry (log :813) and
immune to the relay's session-dependent per-dispatch RPC cost. `extra`
carries the host-driven rows: the plain dispatch loop, the PIPELINED loop
(pinned-weights program + overlapped readbacks, every result fetched to the
host — the served-system figure), single-dispatch latency, and the
AP-neutral fast preset's batch-128 pure-compute serving figure
(RESULTS.md budget ablation).
Set BENCH_BATCHED=1 (+BENCH_BATCH_SIZE) for the parity-config batched path
and BENCH_TRAIN=1 for train-step timing — each adds a slow compile. The
pinned/pipelined rows and the fast-preset batch-128 row each also cost one
extra multi-minute relay compile; they default ON (they are the round's
headline evidence) but BENCH_PIPELINED=0 / BENCH_FAST=0 skip them for a
minimal run.
Round-3 figures on TPU v5e: batch-1 pure compute ~1450-1540 img/s (~30x
baseline, RTT subtracted); fast-preset batch-128 serving 3613-3698 img/s
(72-74x; roofline analysis in RESULTS.md).
"""

import json
import os
import sys
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

    def force(det):
        return float(jnp.sum(det.scores))

    # ---- PURE-COMPUTE throughput: N sequential query-path iterations chained
    # INSIDE one XLA program (data-dependent perturbation prevents CSE/DCE),
    # one dispatch + one readback. This is the analog of the reference's
    # "pure compute time" telemetry (log :813) and is immune to per-dispatch
    # relay-RPC throughput, which varies heavily between sessions.
    # The dispatch+readback RTT (~30-40 ms through the relay) is measured on
    # a trivial program and SUBTRACTED — attributing it to the chain inflated
    # round-1's batch-1 latency (a trivial chained sum "costs" ~0.8 ms/rep).
    from faster_orefsdet_tpu.pipelines.inference import query_path_single

    n_chain = 300

    @jax.jit
    def trivial(image):
        return jnp.sum(image) * 1e-12

    float(trivial(image))  # compile
    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(trivial(image))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    @jax.jit
    def chained(params, cache, image, hw):
        def body(i, carry):
            det = query_path_single(model, params, cache, image + carry, hw, cfg)
            return jnp.sum(det.scores) * 1e-12
        return jax.lax.fori_loop(0, n_chain, body, jnp.asarray(0.0, image.dtype))

    float(chained(params, cache, image, hw))  # compile
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(params, cache, image, hw))
        runs.append(time.perf_counter() - t0)
    pure_fps = n_chain / max(min(runs) - rtt, 1e-9)
    # session-variance band over the reps (the shared relay makes sustained
    # throughput vary ~5% between sessions; the band makes the headline
    # self-describing — RESULTS.md quotes 1450-1520 across round-2 sessions)
    fps_band = sorted(n_chain / max(r - rtt, 1e-9) for r in runs)

    infer = build_inference_fn(cfg, model)
    force(infer(params, cache, image, hw))  # compile

    # single-dispatch + readback latency (upper bound: includes relay RTT)
    lats = []
    for _ in range(15):
        t0 = time.perf_counter()
        force(infer(params, cache, image, hw))
        lats.append(time.perf_counter() - t0)
    lat_single = float(np.percentile(lats, 50))

    # sustained dispatch-loop throughput (includes per-dispatch relay RPC —
    # session-dependent; the pure-compute figure above is the stable one)
    n = 200
    t0 = time.perf_counter()
    for _ in range(n - 1):
        infer(params, cache, image, hw)
    force(infer(params, cache, image, hw))
    sustained_fps = n / (time.perf_counter() - t0)

    # PINNED dispatch loop: params/cache are compile-time captures, so the
    # per-dispatch host cost is just the two image tensors instead of the
    # ~170-leaf param pytree — measured 0.93-0.94x of pure compute vs the
    # plain loop's 0.66-0.75x (tools/pipelined_bench.py, RESULTS.md r4).
    # BENCH_PIPELINED=0 skips this block's extra multi-minute relay compile
    # (the pinned program is a fresh jit program) for a minimal bench run.
    pinned_fps = pipelined_fps = None
    if os.environ.get("BENCH_PIPELINED") != "0":
        from concurrent.futures import ThreadPoolExecutor

        from faster_orefsdet_tpu.pipelines.inference import build_pinned_inference_fn

        pinned = build_pinned_inference_fn(cfg, params, cache, model=model, packed=True)
        float(jnp.sum(pinned(image, hw)))  # compile
        t0 = time.perf_counter()
        for _ in range(n - 1):
            pinned(image, hw)
        float(jnp.sum(pinned(image, hw)))
        pinned_fps = n / (time.perf_counter() - t0)

        # PIPELINED served-system loop: pinned program + a readback thread
        # pool fetching EVERY result (packed [K,7] = one relay round-trip
        # each) while later dispatches proceed — the AsyncPredictor mechanism
        # (pipelines/async_predictor.py; reference predictor.py:150-238).
        def read(packed):
            return np.asarray(packed)

        np_read = 0
        with ThreadPoolExecutor(max_workers=32) as pool:
            t0 = time.perf_counter()
            futs = []
            for _ in range(n):
                futs.append(pool.submit(read, pinned(image, hw)))
                if len(futs) > 96:
                    futs.pop(0).result()
                    np_read += 1
            for f in futs:
                f.result()
                np_read += 1
            pipelined_fps = np_read / (time.perf_counter() - t0)

    extra = {
        "per_image_ms_pure": round(1000.0 / pure_fps, 3),
        "pure_fps_min_max_over_reps": [round(fps_band[0], 1), round(fps_band[-1], 1)],
        "session_variance_note": "shared-relay sessions vary ~5%; the min/max band above is this session's measured spread",
        "relay_rtt_ms_subtracted": round(rtt * 1000, 2),
        "dispatch_loop_images_per_sec": round(sustained_fps, 1),
        "single_dispatch_readback_ms": round(lat_single * 1000, 2),
        "compute_dtype": cfg.compute_dtype,
        "device": str(jax.devices()[0]),
    }
    if pinned_fps is not None:
        extra["pinned_dispatch_images_per_sec"] = round(pinned_fps, 1)
        extra["pinned_dispatch_vs_pure_compute"] = round(pinned_fps / pure_fps, 3)
        extra["pipelined_served_images_per_sec"] = round(pipelined_fps, 1)
        extra["pipelined_served_vs_pure_compute"] = round(pipelined_fps / pure_fps, 3)

    # ---- AP-neutral fast preset (post_nms=64, Pallas NMS), batch-128 pure
    # compute — the repo's best sustained serving figure (RESULTS.md budget
    # ablation), emitted by default so the round artifact self-documents it.
    # Reuses tools/_harness.chained_serving_fps: ONE copy of the chained-
    # program + RTT-subtraction methodology shared with every tools/ bench.
    # BENCH_FAST=0 skips this block's extra batch-128 relay compile.
    if os.environ.get("BENCH_FAST") != "0":
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
        from _harness import chained_serving_fps

        from faster_orefsdet_tpu.config import get_config as _get_config

        fcfg = _get_config("serving_vovnet_fast")
        fb, freps = 128, 8
        fimages = jnp.asarray(rng.standard_normal((fb, *canvas, 3), dtype=np.float32))
        fhws = jnp.tile(hw[None], (fb, 1))
        note = (
            "serving_vovnet_fast (post_nms_topk_test=64, AP-neutral on the "
            "RESULTS.md ablation protocol), batch-128 chained pure compute"
        )
        try:
            fast_fps = chained_serving_fps(
                make_detector(fcfg), fcfg, params, cache, fimages, fhws, rtt, reps=freps
            )
        except Exception as e:  # noqa: BLE001
            # round-5's padded Pallas kernel newly covers the fast preset's
            # non-multiple-of-256 NMS sizes (the 64-box ROI final NMS; the
            # decode NMS runs at the 1024 budget and was already covered);
            # if THIS backend rejects the padded kernel (e.g. VMEM
            # pressure), degrade to the XLA-fixpoint NMS rather than
            # redden the whole round artifact
            import dataclasses

            fcfg = fcfg.replace(
                centernet=dataclasses.replace(fcfg.centernet, use_pallas_nms=False),
                roi=dataclasses.replace(fcfg.roi, use_pallas_nms=False),
            )
            fast_fps = chained_serving_fps(
                make_detector(fcfg), fcfg, params, cache, fimages, fhws, rtt, reps=freps
            )
            note += f" [XLA-fixpoint NMS fallback; pallas error: {type(e).__name__}]"
        extra["fast_preset_batch128_images_per_sec"] = round(fast_fps, 1)
        extra["fast_preset_vs_baseline"] = round(fast_fps / 50.0, 2)
        extra["fast_preset_note"] = note

    if os.environ.get("BENCH_BATCHED") == "1":
        import dataclasses

        batch = int(os.environ.get("BENCH_BATCH_SIZE", "16"))
        # batched serving takes the Pallas VMEM NMS live path: +5% at batch
        # 128 (1906 -> 1993 img/s); at batch 1 the per-call setup does not
        # amortize, so the batch-1 headline keeps the XLA fixpoint.
        bcfg = cfg.replace(
            centernet=dataclasses.replace(cfg.centernet, use_pallas_nms=True),
            roi=dataclasses.replace(cfg.roi, use_pallas_nms=True),
        )
        binfer = build_batched_inference_fn(bcfg, make_detector(bcfg))
        images = jnp.asarray(rng.standard_normal((batch, *canvas, 3), dtype=np.float32))
        hws = jnp.tile(hw[None], (batch, 1))
        float(jnp.sum(binfer(params, cache, images, hws).scores))
        nb = 20
        t0 = time.perf_counter()
        for _ in range(nb - 1):
            binfer(params, cache, images, hws)
        float(jnp.sum(binfer(params, cache, images, hws).scores))
        extra[f"batch{batch}_images_per_sec"] = round(nb * batch / (time.perf_counter() - t0), 1)

    if os.environ.get("BENCH_TRAIN") == "1":
        # episodic fine-tune step throughput (synthetic batch, 5-shot)
        from faster_orefsdet_tpu.pipelines.train_step import (
            TrainBatch,
            TrainState,
            build_train_step,
        )
        from faster_orefsdet_tpu.solver import build_optimizer

        b, s, nmax = 1, 5, 20
        gtb = np.zeros((b, nmax, 4), np.float32)
        gtb[:, 0] = [20, 20, 120, 100]
        gtv = np.zeros((b, nmax), bool)
        gtv[:, 0] = True
        tb = TrainBatch(
            images=jnp.asarray(rng.standard_normal((b, 256, 352, 3), dtype=np.float32)),
            image_hw=jnp.asarray([[240.0, 320.0]] * b),
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
        tx = build_optimizer(cfg.solver, params)
        step = build_train_step(cfg, model, tx)
        state = TrainState(params, tx.init(params), jnp.asarray(0))
        key = jax.random.PRNGKey(0)
        state, m = step(state, tb, key)
        float(m["total_loss"])  # compile + force
        nt = 30
        t0 = time.perf_counter()
        for _ in range(nt - 1):
            state, m = step(state, tb, key)
        state, m = step(state, tb, key)
        float(m["total_loss"])
        extra["train_step_ms"] = round((time.perf_counter() - t0) / nt * 1000, 2)

    result = {
        "metric": "ore images/sec, batch-1 query path @320px (25-shot cache, pure compute)",
        "value": round(pure_fps, 2),
        "unit": "img/s",
        "vs_baseline": round(pure_fps / 50.0, 3),
        "extra": extra,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
