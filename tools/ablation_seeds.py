"""Round-4 variance study: fast-preset AP-neutrality across seeds + regimes.

VERDICT r3 weak #3: the AP-neutral claim for serving_vovnet_fast
(post_nms_topk_test=64) rested on ONE training run / ONE synthetic regime /
ONE seed. This re-runs the budget ablation across:

  - 3 training seeds (data gen + init + episode stream all reseeded)
  - 2 data regimes: the round-3 base regime (1-6 blobs, 28-90 px) and a
    DENSE-SMALL regime (8-16 blobs, 14-40 px) — object density/size is the
    knob that moves proposal-count sensitivity (reference budget:
    fsod_rpn.py:1199-1206)

evaluating each trained model at post_nms in {256, 64} on a 512-image
held-out val set of the SAME regime, 24-shot cache, eval-batch 32.
Prints a per-(regime, budget) mean +/- band over seeds at the end.

Usage: python tools/ablation_seeds.py [iters=800] [n_val=512]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import sys
import time

import numpy as np

from _harness import eval_cache, train_synthetic_fsod

REGIMES = {
    "base": {},
    "dense_small": {"min_blobs": 8, "max_blobs": 16, "blob_size": (14.0, 40.0)},
}
# env overrides: ABL_SEEDS="0,1" ABL_REGIMES="base" (split long runs /
# CPU smoke); defaults are the full VERDICT-r3-#4 protocol
SEEDS = tuple(int(s) for s in _os.environ.get("ABL_SEEDS", "0,1,2").split(","))
if _os.environ.get("ABL_REGIMES"):
    REGIMES = {k: REGIMES[k] for k in _os.environ["ABL_REGIMES"].split(",")}
BUDGETS = (256, 64)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    n_val = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    import tempfile

    from faster_orefsdet_tpu.data.coco import load_coco_json
    from faster_orefsdet_tpu.data.synthetic import generate_ore_dataset
    from faster_orefsdet_tpu.pipelines.evaluate import evaluate

    results = {}  # (regime, budget) -> [AP per seed]
    for regime, gen_kwargs in REGIMES.items():
        vj, vi = generate_ore_dataset(
            tempfile.mkdtemp(prefix=f"abl_{regime}_val_"), num_images=n_val,
            seed=97, **gen_kwargs)
        val_records = load_coco_json(vj, vi)
        print(f"[{regime}] val {len(val_records)} imgs", flush=True)
        for seed in SEEDS:
            t0 = time.time()
            run = train_synthetic_fsod(
                iters=iters, prefix=f"abl_{regime}_s{seed}_", seed=seed,
                data_kwargs=gen_kwargs, log_every=400)
            cfg24, cache = eval_cache(run)
            print(f"[{regime} seed {seed}] trained in {time.time()-t0:.0f}s",
                  flush=True)
            for post in BUDGETS:
                ecfg = cfg24.replace(
                    centernet=dataclasses.replace(
                        cfg24.centernet, post_nms_topk_test=post)
                )
                res = evaluate(run.model, run.state.params, cache, val_records,
                               ecfg, batch_stats=run.state.batch_stats,
                               batch_size=32)
                ap = {k: round(v, 3) for k, v in res.items()
                      if k in ("AP", "AP50", "AP75")}
                results.setdefault((regime, post), []).append(res["AP"])
                print(f"[{regime} seed {seed} post_nms={post}] {ap}",
                      flush=True)

    print("\n==== summary (AP mean +/- half-band over seeds) ====")
    for (regime, post), aps in sorted(results.items()):
        aps = np.asarray(aps)
        print(f"{regime:12s} post_nms={post:3d}: "
              f"{aps.mean():.2f} +/- {(aps.max()-aps.min())/2:.2f} "
              f"(seeds: {[round(a, 2) for a in aps]})", flush=True)
    for regime in REGIMES:
        a256 = np.asarray(results[(regime, 256)])
        a64 = np.asarray(results[(regime, 64)])
        d = a64 - a256
        print(f"{regime:12s} delta(64-256): mean {d.mean():+.2f}, "
              f"per-seed {[round(x, 2) for x in d]}", flush=True)


if __name__ == "__main__":
    main()
