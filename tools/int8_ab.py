"""int8 W8A8 serving A/B vs the bf16 fast preset (round-3 follow-up).

One synthetic training run (round-2 protocol: 800 it, 5-shot, 320
single-scale), then on the trained weights:
  1. AP on an N_VAL-image synthetic val set (24-shot cache, eval-batch 32)
     for serving_vovnet_fast (bf16) vs serving_vovnet_int8 — the accuracy
     cost of quantization at the same post_nms=64 budget;
  2. batch-128 pure-compute serving throughput for both presets (chained
     reps in ONE program, relay RTT subtracted — bench.py methodology).

Measured result (RESULTS.md): AP-neutral (63.78 vs 63.90) but 35% SLOWER —
serving is HBM-roofline-bound and the dynamic requant passes add
activation traffic every conv, which the int8 MXU's FLOP peak cannot
repay.

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

    from faster_orefsdet_tpu.config import get_config
    from faster_orefsdet_tpu.pipelines.evaluate import evaluate
    from faster_orefsdet_tpu.pipelines.inference import make_detector

    run = train_synthetic_fsod(iters=iters, prefix="int8_train_")
    val_records = make_val_records(n_val, prefix="int8_val_")
    cfg24, cache = eval_cache(run)

    # ---- AP A/B at the published eval protocol
    for preset in ("serving_vovnet_fast", "serving_vovnet_int8"):
        ecfg = get_config(preset)
        ecfg = ecfg.replace(
            fs=dataclasses.replace(ecfg.fs, support_shot=24),
            input=cfg24.input,
        )
        emodel = make_detector(ecfg)
        t0 = time.time()
        res = evaluate(emodel, run.state.params, cache, val_records, ecfg,
                       batch_stats=run.state.batch_stats, batch_size=32)
        wall = time.time() - t0
        ap = {k: round(v, 3) for k, v in res.items() if k.startswith(("AP", "AR"))}
        print(f"\n[{preset}] {len(val_records)} images: {ap}  wall {wall:.1f}s",
              flush=True)

    # ---- serving throughput A/B (batch 128, chained, RTT-subtracted)
    images, hws = random_serving_batch(128)
    rtt = measure_rtt()
    for preset in ("serving_vovnet_fast", "serving_vovnet_int8"):
        scfg = get_config(preset)
        smodel = make_detector(scfg)
        chained_serving_fps(smodel, scfg, run.state.params, cache, images, hws,
                            rtt, label=preset)


if __name__ == "__main__":
    main()
