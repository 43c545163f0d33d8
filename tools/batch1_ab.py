"""Batch-1 serving latency: bf16 vs int8-static vs int8-RESIDENT (VERDICT r4 #5).

The single-image fast-preset program moves ~477 MB/dispatch at ~92% of the
HBM pin (RESULTS.md round-3 latency section) — the traffic is weights +
support cache + fixed-shape intermediates, none of which batch-1 can
amortize. int8-static is the one available byte-reduction lever that needs
no new kernels (activation quantize is fused elementwise; weights quantize
in-program). This measures whether it moves batch-1 latency toward the
0.5 ms/img target, or produces the measured negative that closes the
chapter (the way dynamic int8 was closed in round 3).

TWO-POINT SLOPE methodology (tools/nms_bench.py): time the same chained
program at R and 4R reps and take the slope — cancels the relay RTT
exactly, which at batch 1 would otherwise dominate.

Usage: python tools/batch1_ab.py [reps=100]
Reference bar: 20 ms/img batch-1 (log/fsod_finetune_stone_vovnet_25_test_log.txt:813).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax

if _os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon sitecustomize swallows the env var (CLAUDE.md gotcha);
    # honor it in-process so CPU smokes don't touch the TPU relay
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from faster_orefsdet_tpu.config import get_config
from faster_orefsdet_tpu.ops.quant import static_act_scales
from faster_orefsdet_tpu.pipelines.inference import make_detector, query_path_single
from faster_orefsdet_tpu.pipelines.quant_calib import calibrate_act_scales
from faster_orefsdet_tpu.pipelines.support_cache import SupportCache
from faster_orefsdet_tpu.utils.params import cast_params, init_params


def main():
    reps = int(_sys.argv[1]) if len(_sys.argv) > 1 else 100

    canvas = (320, 448)
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.standard_normal((*canvas, 3), dtype=np.float32))
    hw = jnp.asarray([320.0, 427.0])

    cfg_bf16 = get_config("serving_vovnet_fast")
    cfg_int8 = get_config("serving_vovnet_int8_static")
    params = cast_params(
        init_params(make_detector(cfg_bf16), cfg_bf16, jax.random.PRNGKey(0))
    )
    c = cfg_bf16.fpn.out_channels
    cache = SupportCache(
        p3=jnp.asarray(rng.standard_normal((32, 32, c), dtype=np.float32)),
        p4=jnp.asarray(rng.standard_normal((16, 16, c), dtype=np.float32)),
        p5=jnp.asarray(rng.standard_normal((8, 8, c), dtype=np.float32)),
        rcnn_8=jnp.asarray(rng.standard_normal((8, 8, c), dtype=np.float32)),
        rcnn_4=jnp.asarray(rng.standard_normal((4, 4, c), dtype=np.float32)),
    )
    # speed-only calibration (program structure is scale-invariant)
    scales = calibrate_act_scales(cfg_int8, params, image[None].repeat(8, 0))
    print(f"[calib] {len(scales)} scales")
    cfg_res = get_config("serving_vovnet_int8_resident")
    rscales = calibrate_act_scales(cfg_res, params, image[None].repeat(8, 0))
    print(f"[calib-resident] {len(rscales)} scales")

    def chained(model, cfg, n):
        def fn(params, cache, image, hw):
            def body(i, carry):
                det = query_path_single(model, params, cache, image + carry, hw, cfg)
                return jnp.sum(det.scores).astype(jnp.float32) * 1e-12

            return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, jnp.float32))

        return fn

    def best(compiled, *args):
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(compiled(*args))
            runs.append(time.perf_counter() - t0)
        return min(runs)

    for tag, cfg, ctx in (
        ("bf16", cfg_bf16, static_act_scales(None)),
        ("int8_static", cfg_int8, static_act_scales(scales)),
        # round 5: int8-RESIDENT backbone — int8 materialization between
        # convs (QTensor flow), the actual byte-reduction arm
        ("int8_resident", cfg_res, static_act_scales(rscales)),
    ):
        model = make_detector(cfg)
        args = (params, cache, image, hw)
        with ctx:
            t0 = time.perf_counter()
            lo = jax.jit(chained(model, cfg, reps)).lower(*args).compile()
            hi = jax.jit(chained(model, cfg, 4 * reps)).lower(*args).compile()
            one = (
                jax.jit(
                    lambda p, c, im, h: jnp.sum(
                        query_path_single(model, p, c, im, h, cfg).scores
                    )
                )
                .lower(*args)
                .compile()
            )
        print(f"[{tag}] compile {time.perf_counter()-t0:.0f}s")
        ca = one.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        t_lo, t_hi = best(lo, *args), best(hi, *args)
        ms = (t_hi - t_lo) / (3 * reps) * 1e3
        print(
            f"[{tag}] batch-1: {ms:.3f} ms/img ({1e3/ms:.0f} img/s; totals "
            f"{t_lo*1e3:.0f}/{t_hi*1e3:.0f} ms), program "
            f"{ca.get('flops',0)/1e9:.2f} GFLOP + "
            f"{ca.get('bytes accessed',0)/1e6:.0f} MB",
            flush=True,
        )

    if _os.environ.get("BATCH1_PINNED") != "1":
        return

    # PINNED arms (deployment shape, build_pinned_inference_fn semantics):
    # params + support cache are compile-time captures, so the per-dispatch
    # pytree ship disappears AND XLA can constant-fold the weight
    # quantization — for the resident arm the folded int8 weights are what
    # actually lives in the executable. cost_analysis of the pinned program
    # is the honest batch-1 byte count for a serving deployment.
    def chained_pinned(model, cfg, n, params, cache):
        def fn(image, hw):
            def body(i, carry):
                det = query_path_single(model, params, cache, image + carry, hw, cfg)
                return jnp.sum(det.scores).astype(jnp.float32) * 1e-12

            return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, jnp.float32))

        return fn

    for tag, cfg, ctx in (
        ("bf16_pinned", cfg_bf16, static_act_scales(None)),
        ("int8_resident_pinned", cfg_res, static_act_scales(rscales)),
    ):
        model = make_detector(cfg)
        with ctx:
            t0 = time.perf_counter()
            lo = jax.jit(chained_pinned(model, cfg, reps, params, cache)).lower(
                image, hw).compile()
            hi = jax.jit(chained_pinned(model, cfg, 4 * reps, params, cache)).lower(
                image, hw).compile()
            one = jax.jit(
                lambda im, h, m=model, c=cfg: jnp.sum(
                    query_path_single(m, params, cache, im, h, c).scores
                )
            ).lower(image, hw).compile()
        print(f"[{tag}] compile {time.perf_counter()-t0:.0f}s")
        ca = one.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        t_lo, t_hi = best(lo, image, hw), best(hi, image, hw)
        ms = (t_hi - t_lo) / (3 * reps) * 1e3
        print(
            f"[{tag}] batch-1: {ms:.3f} ms/img ({1e3/ms:.0f} img/s; totals "
            f"{t_lo*1e3:.0f}/{t_hi*1e3:.0f} ms), program "
            f"{ca.get('flops',0)/1e9:.2f} GFLOP + "
            f"{ca.get('bytes accessed',0)/1e6:.0f} MB",
            flush=True,
        )


if __name__ == "__main__":
    main()
