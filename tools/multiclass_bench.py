"""Multi-class serving throughput on the current presets (round-4 re-measure).

Round 1 measured 473 img/s for 3-class serving on the parity config before
the fast preset, Pallas NMS gating and bf16 residency landed. This re-runs
the chained pure-compute methodology for the multiclass query path
(pipelines.inference.query_path_multiclass: one backbone pass, support
stages vmapped over the class axis, cross-class NMS) at:

  - parity config (post_nms=256 -> multiclass NMS size 768, inside the
    Pallas supported() set)
  - fast preset (post_nms=64 -> NMS size 192 <= 256, Pallas tile = K)

for n_cls in {1, 3}, batch 32 (vmapped over images).

Usage: python tools/multiclass_bench.py [reps=10]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from _harness import SERVING_HW, measure_rtt, random_support_cache


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from faster_orefsdet_tpu.config import get_config
    from faster_orefsdet_tpu.pipelines.inference import (
        make_detector,
        query_path_multiclass,
    )
    from faster_orefsdet_tpu.pipelines.support_cache import stack_support_caches
    from faster_orefsdet_tpu.utils.params import init_params

    rtt = measure_rtt()
    batch = 32
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((batch, 320, 448, 3), dtype=np.float32))
    hws = jnp.tile(jnp.asarray(list(SERVING_HW))[None], (batch, 1))

    for preset in ("serving_vovnet", "serving_vovnet_fast"):
        cfg = get_config(preset)
        model = make_detector(cfg)
        params = init_params(model, cfg, jax.random.PRNGKey(0))
        for n_cls in (1, 3):
            mcache = stack_support_caches(
                [random_support_cache(cfg, seed=s) for s in range(n_cls)]
            )

            @jax.jit
            def chained(params, mcache, images, hws):
                def body(i, carry):
                    det = jax.vmap(
                        lambda im, hw: query_path_multiclass(
                            model, params, mcache, im + carry, hw, cfg
                        )
                    )(images, hws)
                    return jnp.sum(det.scores) * 1e-12

                return jax.lax.fori_loop(0, reps, body,
                                         jnp.asarray(0.0, images.dtype))

            t0 = time.perf_counter()
            float(chained(params, mcache, images, hws))
            print(f"[{preset} n_cls={n_cls}] compile "
                  f"{time.perf_counter()-t0:.0f}s", flush=True)
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(chained(params, mcache, images, hws))
                runs.append(time.perf_counter() - t0)
            fps = reps * batch / max(min(runs) - rtt, 1e-9)
            print(f"[{preset} n_cls={n_cls}] batch-{batch} pure compute: "
                  f"{fps:.0f} img/s ({1000.0/fps:.3f} ms/img) "
                  f"vs_baseline {fps/50.0:.1f}x", flush=True)


if __name__ == "__main__":
    main()
