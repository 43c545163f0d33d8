"""Round-3 TPU session: proposal-budget ablation + reference-scale eval
rehearsal (VERDICT r2 next #6 and #7).

One training run (synthetic ore, round-2 protocol: 800 it, 5-shot episodes,
320 single-scale), then:
  1. eval at the reference's set size — N_VAL synthetic val images (the
     published protocol evaluates 1060, log :797-813) at --eval-batch 32
     with the 24-shot cache (all.sh SHOT=24), for each
     post_nms_topk_test in {256, 128, 64}: AP table + wall fps + p50 —
     the budget-vs-AP trade-off on a real eval pipeline at real scale;
  2. pure-compute serving throughput (batch-128 chained, bf16 + Pallas NMS
     preset) at the same three budgets — the img/s side of the trade-off.

Usage: python tools/round3_ablation.py [iters=800] [n_val=1060] [--skip-serving]
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
    n_val = int(sys.argv[2]) if len(sys.argv) > 2 else 1060
    skip_serving = "--skip-serving" in sys.argv

    from faster_orefsdet_tpu.config import get_config
    from faster_orefsdet_tpu.pipelines.evaluate import evaluate
    from faster_orefsdet_tpu.pipelines.inference import make_detector

    run = train_synthetic_fsod(iters=iters, prefix="r3_train_")
    val_records = make_val_records(n_val, prefix="r3_val_")
    cfg24, cache = eval_cache(run)

    # ---- budget ablation on the full val set at eval-batch 32
    for post in (256, 128, 64):
        ecfg = cfg24.replace(
            centernet=dataclasses.replace(cfg24.centernet, post_nms_topk_test=post)
        )
        t0 = time.time()
        res = evaluate(run.model, run.state.params, cache, val_records, ecfg,
                       batch_stats=run.state.batch_stats, batch_size=32)
        wall = time.time() - t0
        ap = {k: round(v, 3) for k, v in res.items()
              if k.startswith(("AP", "AR"))}
        print(f"\n[post_nms={post}] {len(val_records)} images, eval-batch 32")
        print(f"  AP table: {ap}")
        if "latency_p50_s" in res:
            print(f"  pure-compute: {res['latency_p50_s']*1000:.2f} ms/img p50, "
                  f"{res['fps']:.1f} img/s mean "
                  f"(reference: 0.0200 s/iter pure = 50 img/s, log :813)")
        print(f"  wall (incl. compile on first budget): {wall:.1f}s = "
              f"{len(val_records)/wall:.1f} img/s end-to-end "
              f"(reference total: 0.0217 s/iter = 46 img/s, log :812)",
              flush=True)

    if skip_serving:
        return

    # ---- serving img/s at each budget (bf16 + Pallas NMS, batch 128,
    # chained reps in ONE program; bench.py methodology)
    images, hws = random_serving_batch(128)
    rtt = measure_rtt()
    for post in (256, 128, 64):
        scfg = get_config("serving_vovnet")
        scfg = scfg.replace(
            centernet=dataclasses.replace(scfg.centernet, post_nms_topk_test=post)
        )
        smodel = make_detector(scfg)
        chained_serving_fps(smodel, scfg, run.state.params, cache, images, hws,
                            rtt, label=f"serving post_nms={post}")


if __name__ == "__main__":
    main()
