"""Micro-bench: Pallas in-VMEM NMS vs XLA fixpoint on the TPU.

TWO-POINT SLOPE methodology: the relay's dispatch+readback RTT (~30-40 ms)
dwarfs any small chained program, so single-total/reps attribution is a
floor artifact (a trivial chained jnp.sum "costs" 800 us/rep that way).
Timing the same program at R and 4R chained reps and taking the slope
cancels the RTT exactly. Usage:
  python tools/nms_bench.py [K] [reps]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

from faster_orefsdet_tpu.ops.nms import nms_mask
from faster_orefsdet_tpu.ops.pallas_nms import nms_mask_pallas


def main():
    k = int(_sys.argv[1]) if len(_sys.argv) > 1 else 1024
    reps = int(_sys.argv[2]) if len(_sys.argv) > 2 else 50
    rng = np.random.default_rng(0)
    centers = rng.uniform(0, 300, (k, 2)).astype(np.float32)
    wh = rng.uniform(8.0, 60.0, (k, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([centers - wh / 2, centers + wh / 2], 1))
    scores = jnp.asarray(rng.uniform(0.01, 1.0, (k,)).astype(np.float32))
    valid = jnp.ones((k,), bool)

    def chained(fn, n):
        @jax.jit
        def run(boxes, scores, valid):
            def body(i, carry):
                keep = fn(boxes + carry, scores, valid, 0.6)
                return jnp.sum(keep).astype(jnp.float32) * 1e-9
            return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, jnp.float32))
        return run

    def best(run):
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(boxes, scores, valid))
            runs.append(time.perf_counter() - t0)
        return min(runs)

    for name, fn in (("xla-fixpoint", nms_mask), ("pallas-vmem", nms_mask_pallas)):
        lo, hi = chained(fn, reps), chained(fn, 4 * reps)
        t0 = time.perf_counter()
        float(lo(boxes, scores, valid))
        float(hi(boxes, scores, valid))
        print(f"[{name}] compile+first {time.perf_counter()-t0:.1f}s")
        t_lo, t_hi = best(lo), best(hi)
        us = (t_hi - t_lo) / (3 * reps) * 1e6
        print(f"[{name}] K={k}: {us:.2f} us/NMS (slope; totals "
              f"{t_lo*1e3:.1f}/{t_hi*1e3:.1f} ms)", flush=True)
    # agreement on-device
    a = np.asarray(nms_mask(boxes, scores, valid, 0.6))
    b = np.asarray(nms_mask_pallas(boxes, scores, valid, 0.6))
    print("agree:", bool((a == b).all()), "kept:", int(a.sum()))


if __name__ == "__main__":
    main()
