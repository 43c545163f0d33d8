"""int8 W8A8 serving A/B vs the bf16 fast preset (round-3/4 follow-up).

One synthetic training run (round-2 protocol: 800 it, 5-shot, 320
single-scale), then on the trained weights:
  1. AP on an N_VAL-image synthetic val set (24-shot cache, eval-batch 32)
     for serving_vovnet_fast (bf16) vs serving_vovnet_int8 (dynamic scales)
     vs serving_vovnet_int8_static (calibrated scales) — the accuracy cost
     of quantization at the same post_nms=64 budget;
  2. batch-128 pure-compute serving throughput for all presets (chained
     reps in ONE program, relay RTT subtracted — bench.py methodology).

Static calibration uses the first 8 val canvases (same preprocessing the
eval loop applies) via pipelines.quant_calib.calibrate_act_scales.

Measured round-3 result (RESULTS.md): dynamic int8 is AP-neutral
(63.78 vs 63.90) but 35% SLOWER — serving is HBM-roofline-bound and the
dynamic requant passes add activation traffic every conv, which the int8
MXU's FLOP peak cannot repay. Round 4 tests whether static scales (no
in-program reductions) flip the sign.

Usage: python tools/int8_ab.py [iters=800] [n_val=256]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import sys
import time

from _harness import (
    chained_serving_fps,
    eval_cache,
    make_val_records,
    measure_rtt,
    random_serving_batch,
    train_synthetic_fsod,
)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    n_val = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    import jax.numpy as jnp
    import numpy as np

    from faster_orefsdet_tpu.config import get_config
    from faster_orefsdet_tpu.data.loader import eval_canvas, eval_loader
    from faster_orefsdet_tpu.pipelines.evaluate import evaluate
    from faster_orefsdet_tpu.pipelines.inference import make_detector
    from faster_orefsdet_tpu.pipelines.quant_calib import calibrate_act_scales

    run = train_synthetic_fsod(iters=iters, prefix="int8_train_")
    val_records = make_val_records(n_val, prefix="int8_val_")
    cfg24, cache = eval_cache(run)

    presets = ("serving_vovnet_fast", "serving_vovnet_int8",
               "serving_vovnet_int8_static")

    # ---- calibrate static scales on the first 8 val canvases (the same
    # preprocessing the eval loop applies)
    calib_cfg = get_config("serving_vovnet_int8_static").replace(input=cfg24.input)
    chw = eval_canvas(val_records[:8], calib_cfg)
    canvases = [c for _, c, _, _ in eval_loader(val_records[:8], calib_cfg, chw)]
    scales = calibrate_act_scales(
        calib_cfg, run.state.params, jnp.asarray(np.stack(canvases)),
        batch_stats=run.state.batch_stats,
    )
    print(f"calibrated {len(scales)} conv scales "
          f"(min {min(scales.values()):.2e}, max {max(scales.values()):.2e})",
          flush=True)

    def scales_for(preset):
        return scales if preset.endswith("_static") else None

    # ---- AP A/B at the published eval protocol
    for preset in presets:
        ecfg = get_config(preset)
        ecfg = ecfg.replace(
            fs=dataclasses.replace(ecfg.fs, support_shot=24),
            input=cfg24.input,
        )
        emodel = make_detector(ecfg)
        t0 = time.time()
        res = evaluate(emodel, run.state.params, cache, val_records, ecfg,
                       batch_stats=run.state.batch_stats, batch_size=32,
                       act_scales=scales_for(preset))
        wall = time.time() - t0
        ap = {k: round(v, 3) for k, v in res.items() if k.startswith(("AP", "AR"))}
        print(f"\n[{preset}] {len(val_records)} images: {ap}  wall {wall:.1f}s",
              flush=True)

    # ---- serving throughput A/B (batch 128, chained, RTT-subtracted)
    images, hws = random_serving_batch(128)
    rtt = measure_rtt()
    for preset in presets:
        scfg = get_config(preset)
        smodel = make_detector(scfg)
        chained_serving_fps(smodel, scfg, run.state.params, cache, images, hws,
                            rtt, label=preset, act_scales=scales_for(preset))


if __name__ == "__main__":
    main()
