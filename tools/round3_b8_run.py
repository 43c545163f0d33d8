"""Production-config convergence demo: train at the measured throughput
peak (ims_per_batch=8, the round-3 sweep's knee) for N iters on a larger
synthetic train set, then held-out eval — stability + AP evidence for
batched training (the reference can't do this: its python loop only kept
the last image's losses at B>1, fsod_cen.py:279-307).

Usage: python tools/round3_b8_run.py [iters=2000] [b=8] [n_train=64] [n_val=64]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

from _harness import eval_cache, make_val_records, train_synthetic_fsod


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_train = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    n_val = int(sys.argv[4]) if len(sys.argv) > 4 else 64

    from faster_orefsdet_tpu.pipelines.evaluate import evaluate

    t_start = time.time()
    run = train_synthetic_fsod(iters=iters, n_train=n_train, b=b,
                               prefix="r3_b8_")
    wall = time.time() - t_start
    print(f"{iters} iters x B={b} = {iters*b} images in {wall:.0f}s "
          f"(incl. compile) = {iters*b/wall:.0f} img/s wall", flush=True)

    val_records = make_val_records(n_val, seed=9, prefix="r3_b8_val_")
    cfg24, cache = eval_cache(run)
    res = evaluate(run.model, run.state.params, cache, val_records, cfg24,
                   batch_stats=run.state.batch_stats, batch_size=32)
    print("HELD-OUT:",
          {k: round(v, 2) for k, v in res.items() if k.startswith(("AP", "AR"))},
          flush=True)


if __name__ == "__main__":
    main()
