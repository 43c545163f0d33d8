"""Backbone-only bf16 vs int8-static A/B — the roofline tiebreaker.

Round-4 left RESULTS.md self-contradictory about what binds single-chip
serving: the corrected late-round-3 analysis says the fast preset runs at
the HBM roofline (815 GB/s ≈ the 819 GB/s v5e pin), while the round-4
int8-static section explained the bf16 TIE by citing the *withdrawn*
occupancy figures ("4% MXU, 5% HBM"). Both cannot be true: if the path
were HBM-bound and int8 halved activation bytes, int8 must WIN, not tie.

This tool settles it with one decisive pair of programs: the backbone+FPN
phase alone (where every QuantConv lives), compiled at bf16 and at
int8-static, reporting BOTH measured time (chained-reps, RTT-subtracted)
and XLA cost_analysis bytes/FLOPs from the unchained single-rep program.

Outcomes and their readings:
- int8 bytes ~= bf16 bytes AND time ties  -> the dequant boundaries keep
  intermediates wide (bf16 materialization after every conv); HBM-bound
  stands, and the int8 tie is *explained*, not contradictory. Next lever
  would be fusing quant->conv->dequant chains to materialize int8.
- int8 bytes ~halved AND time ties        -> the phase is NOT HBM-bound;
  the occupancy story needs reviving with real utilization numbers.
- int8 time wins                          -> HBM-bound stands and the
  round-4 whole-path tie was masked by the non-backbone phases; re-run
  the whole-path A/B to requantify.

Round 5 adds a THIRD arm, int8_resident (quantize='int8_resident'): the
backbone that actually materializes int8 between convs (QTensor flow,
scale-folded OSA concat — ops/quant.py). It is the constructive test of
the dequant-wide hypothesis: if the path is HBM-bound and resident truly
cuts bytes (cost analysis will say), resident must beat bf16 outright.

Usage: python tools/roofline_ab.py [batch=128] [reps=10]
Needs the TPU (compiles ~7 programs through the relay; run serially).

Reference context: the reference serves torch f32 at 50 FPS
(log/fsod_finetune_stone_vovnet_25_test_log.txt:813); this tool is part
of the beyond-parity perf program, no reference analog.
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
from faster_orefsdet_tpu.pipelines.inference import make_detector
from faster_orefsdet_tpu.pipelines.quant_calib import calibrate_act_scales
from faster_orefsdet_tpu.utils.params import cast_params, init_params


def cost_per_img(compiled, batch):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return {
        "gflops": round(ca.get("flops", 0.0) / 1e9 / batch, 3),
        "hbm_mb": round(ca.get("bytes accessed", 0.0) / 1e6 / batch, 2),
    }


def main():
    batch = int(_sys.argv[1]) if len(_sys.argv) > 1 else 128
    reps = int(_sys.argv[2]) if len(_sys.argv) > 2 else 10

    from _harness import measure_rtt

    rtt = measure_rtt()
    print(f"[rtt] {rtt*1e3:.1f} ms")

    canvas = (320, 448)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((batch, *canvas, 3), dtype=np.float32))

    cfg_bf16 = get_config("serving_vovnet_fast")
    cfg_int8 = get_config("serving_vovnet_int8_static")
    cfg_res = get_config("serving_vovnet_int8_resident")
    params = init_params(make_detector(cfg_bf16), cfg_bf16, jax.random.PRNGKey(0))
    params = cast_params(params)

    # calibration scales: random canvases are fine for a SPEED A/B (the
    # program structure is identical for any positive scales; AP is not
    # being measured here)
    t0 = time.perf_counter()
    scales = calibrate_act_scales(cfg_int8, params, images[:8])
    print(f"[calib] {len(scales)} scales, {time.perf_counter()-t0:.0f}s")
    # the resident mode has its own boundary set (OSA inputs + conv outputs)
    t0 = time.perf_counter()
    rscales = calibrate_act_scales(cfg_res, params, images[:8])
    print(f"[calib-resident] {len(rscales)} scales, {time.perf_counter()-t0:.0f}s")

    results = {}
    for tag, cfg, ctx in (
        ("bf16", cfg_bf16, static_act_scales(None)),
        ("int8_static", cfg_int8, static_act_scales(scales)),
        ("int8_resident", cfg_res, static_act_scales(rscales)),
    ):
        model = make_detector(cfg)

        def backbone_chained(params, images):
            def body(i, carry):
                f = model.apply({"params": params}, images + carry, method=model.features)
                return jnp.sum(f["p5"]).astype(jnp.float32) * 1e-12

            return jax.lax.fori_loop(0, reps, body, jnp.asarray(0.0, jnp.float32))

        def backbone_once(params, images):
            f = model.apply({"params": params}, images, method=model.features)
            return jnp.sum(f["p5"])

        with ctx:
            t0 = time.perf_counter()
            compiled = jax.jit(backbone_chained).lower(params, images).compile()
            compiled_1 = jax.jit(backbone_once).lower(params, images).compile()
        print(f"[{tag}] compile {time.perf_counter()-t0:.0f}s")

        cost = cost_per_img(compiled_1, batch)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(compiled(params, images))
            runs.append(time.perf_counter() - t0)
        sec = max(min(runs) - rtt, 1e-9)
        us_img = sec / reps / batch * 1e6
        results[tag] = (us_img, cost)
        print(
            f"[{tag}] backbone+fpn batch={batch} reps={reps}: "
            f"{us_img:.1f} us/img, cost/img {cost}",
            flush=True,
        )

    b = results["bf16"]
    print("\n[verdict inputs]")
    for tag in ("int8_static", "int8_resident"):
        q = results[tag]
        print(f"  time  {tag}/bf16: {q[0]/b[0]:.3f}")
        print(f"  bytes {tag}/bf16: {q[1]['hbm_mb']/max(b[1]['hbm_mb'],1e-9):.3f}")
        print(f"  flops {tag}/bf16: {q[1]['gflops']/max(b[1]['gflops'],1e-9):.3f}")
    print(
        "  reading: static bytes~1+time~1 -> dequant keeps intermediates "
        "wide (HBM-bound stands). THEN: resident bytes<static AND resident "
        "time < bf16 -> HBM-bound CONFIRMED and the resident preset is the "
        "new fast backbone; resident bytes<static but time~bf16 -> the "
        "phase is not byte-limited after all, occupancy story revives."
    )


if __name__ == "__main__":
    main()
