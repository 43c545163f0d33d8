"""Batched-serving roofline: XLA cost analysis + pure-compute timing.

Round-1 left the batch-128 serving knee unexplained (RESULTS.md:16-17 —
1693 img/s at 128, 1720 at 256, when amortizing the 22 MB of weights should
have bought more). This tool compiles the vmapped batch-B query path, prints
FLOPs / bytes-accessed from compiled.cost_analysis() (the roofline inputs),
and times R repetitions chained inside ONE XLA program (bench.py headline
methodology — one dispatch, one readback, immune to relay RPC variance).

Usage:
  python tools/serving_profile.py [batch] [reps] [bf16|f32|both] [--phases]

--phases adds a per-phase chained breakdown (backbone / cgm+head /
decode+nms / roi) at the same batch — 4 extra compiles, slow on the relay.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np
import jax

if _os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon sitecustomize swallows the env var (CLAUDE.md gotcha);
    # honor it in-process so CPU smokes don't touch the TPU relay
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from faster_orefsdet_tpu.config import get_config
from faster_orefsdet_tpu.pipelines.inference import make_detector, query_path_single
from faster_orefsdet_tpu.pipelines.support_cache import SupportCache
from faster_orefsdet_tpu.utils.params import cast_params, init_params


def cost_summary(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return {
        "gflops": round(ca.get("flops", 0.0) / 1e9, 2),
        "hbm_mb": round(ca.get("bytes accessed", 0.0) / 1e6, 1),
        **{
            k.replace("bytes accessed", "mb"): round(v / 1e6, 1)
            for k, v in ca.items()
            if k.startswith("bytes accessed") and k != "bytes accessed"
        },
    }


def main():
    batch = int(_sys.argv[1]) if len(_sys.argv) > 1 else 128
    reps = int(_sys.argv[2]) if len(_sys.argv) > 2 else 10
    which = _sys.argv[3] if len(_sys.argv) > 3 else "both"
    phases = "--phases" in _sys.argv

    if "--preset" in _sys.argv:  # e.g. serving_vovnet_fast (Pallas NMS+CGM)
        preset = _sys.argv[_sys.argv.index("--preset") + 1]
        cfg = get_config(preset)
        print(f"[preset {preset}]")
    else:
        cfg = get_config("finetune_vovnet").replace(compute_dtype="bfloat16")
    if "--post" in _sys.argv:  # ROI-budget knob (round-3 fast preset: 64)
        import dataclasses

        post = int(_sys.argv[_sys.argv.index("--post") + 1])
        cfg = cfg.replace(
            centernet=dataclasses.replace(cfg.centernet, post_nms_topk_test=post)
        )
        print(f"[post_nms_topk_test={post}]")
    if "--pallas" in _sys.argv:
        import dataclasses

        cfg = cfg.replace(
            centernet=dataclasses.replace(cfg.centernet, use_pallas_nms=True),
            roi=dataclasses.replace(cfg.roi, use_pallas_nms=True),
        )
        print("[pallas NMS on live path]")
    model = make_detector(cfg)
    params_f32 = init_params(model, cfg, jax.random.PRNGKey(0))
    c = cfg.fpn.out_channels
    rng = np.random.default_rng(0)
    if getattr(cfg, "quantize", "none") in ("int8_static", "int8_resident"):
        # speed-only calibration (program structure is scale-invariant);
        # the context must be live for every trace below, so enter it for
        # the rest of the process
        import contextlib

        from faster_orefsdet_tpu.ops.quant import static_act_scales
        from faster_orefsdet_tpu.pipelines.quant_calib import calibrate_act_scales

        calib = jnp.asarray(
            rng.standard_normal((8, 320, 448, 3), dtype=np.float32)
        )
        scales = calibrate_act_scales(cfg, params_f32, calib)
        print(f"[calib] {len(scales)} static scales ({cfg.quantize})")
        _stack = contextlib.ExitStack()
        _stack.enter_context(static_act_scales(scales))
    cache = SupportCache(
        p3=jnp.asarray(rng.standard_normal((32, 32, c), dtype=np.float32)),
        p4=jnp.asarray(rng.standard_normal((16, 16, c), dtype=np.float32)),
        p5=jnp.asarray(rng.standard_normal((8, 8, c), dtype=np.float32)),
        rcnn_8=jnp.asarray(rng.standard_normal((8, 8, c), dtype=np.float32)),
        rcnn_4=jnp.asarray(rng.standard_normal((4, 4, c), dtype=np.float32)),
    )
    canvas = (320, 448)
    images = jnp.asarray(rng.standard_normal((batch, *canvas, 3), dtype=np.float32))
    hws = jnp.tile(jnp.asarray([320.0, 427.0])[None], (batch, 1))

    def batched_chained(params):
        def fn(params, cache, images, hws):
            def body(i, carry):
                det = jax.vmap(
                    lambda img, hw: query_path_single(
                        model, params, cache, img + carry, hw, cfg
                    )
                )(images, hws)
                return jnp.sum(det.scores) * 1e-12
            return jax.lax.fori_loop(0, reps, body, jnp.asarray(0.0, images.dtype))
        return fn

    variants = {"f32": params_f32}
    if which in ("bf16", "both"):
        variants["bf16"] = cast_params(params_f32)
    if which == "bf16":
        variants.pop("f32")

    from _harness import measure_rtt

    rtt = measure_rtt()

    def unchained(params, cache, images, hws):
        det = jax.vmap(
            lambda img, hw: query_path_single(model, params, cache, img, hw, cfg)
        )(images, hws)
        return jnp.sum(det.scores)

    for tag, params in variants.items():
        fn = batched_chained(params)
        t0 = time.perf_counter()
        compiled = jax.jit(fn).lower(params, cache, images, hws).compile()
        print(f"[{tag}] compile {time.perf_counter() - t0:.0f}s")
        # cost analysis on the UNCHAINED single-rep program: XLA counts a
        # rolled fori_loop body ONCE (dividing the chained program's cost by
        # reps understated batch-128 costs 10x, round-3 late fix) but
        # sometimes UNROLLS small-trip loops (making the division correct
        # for some shapes) — so never read costs off the chained program
        compiled_1 = jax.jit(unchained).lower(params, cache, images, hws).compile()
        cs = cost_summary(compiled_1)
        per_img = {k: round(v / batch, 3) for k, v in cs.items()}
        print(f"[{tag}] cost (single-rep program): {cs}")
        print(f"[{tag}] cost per image: {per_img}")
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(compiled(params, cache, images, hws))
            runs.append(time.perf_counter() - t0)
        sec = max(min(runs) - rtt, 1e-9)  # pure compute: one RTT per dispatch
        ips = reps * batch / sec
        print(f"[{tag}] batch={batch} reps={reps}: {min(runs)*1e3:.1f} ms raw "
              f"-> {sec*1e3:.1f} ms compute -> "
              f"{ips:.0f} img/s ({1e3/ips:.3f} ms/img)", flush=True)

    if phases:
        from faster_orefsdet_tpu.models.centernet import decode_proposals
        from faster_orefsdet_tpu.models.cascade_roi import roi_inference
        from faster_orefsdet_tpu.models.detector import support_kernels
        from faster_orefsdet_tpu.structures.boxes import apply_deltas

        params = variants.get("bf16", params_f32)
        variables = {"params": params}
        kernels = {k: support_kernels(getattr(cache, k)) for k in ("p3", "p4", "p5")}
        feats = jax.jit(
            lambda p, im: model.apply({"params": p}, im, method=model.features)
        )(params, images)
        agn_hms, bbox_regs = jax.jit(
            lambda p, f: model.apply(
                {"params": p},
                model.apply({"params": p}, f, kernels, method=model.correlate),
                method=model.proposal_head,
            )
        )(params, feats)
        props = jax.vmap(
            lambda h3, h4, h5, r3, r4, r5, hw: decode_proposals(
                [h3, h4, h5], [r3, r4, r5], cfg.centernet, canvas, hw,
                training=False, nms_budget=cfg.static.nms_budget_test,
            )
        )(agn_hms[0], agn_hms[1], agn_hms[2],
          bbox_regs[0], bbox_regs[1], bbox_regs[2], hws)

        def time_phase(name, body, *args):
            def fn(*a):
                def step(i, carry):
                    return body(carry, *a)
                return jax.lax.fori_loop(0, reps, step,
                                         jnp.asarray(0.0, jnp.float32))

            compiled = jax.jit(fn).lower(*args).compile()
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(compiled(*args))
                runs.append(time.perf_counter() - t0)
            # one dispatch RTT per timed call would otherwise smear
            # RTT/(reps*batch) (~23 us/img at 128x10) into every phase
            sec = max(min(runs) - rtt, 1e-9)
            # cost from the UNCHAINED body (rolled-loop costs count once;
            # see the main-program comment) — phase bytes remain fusion-
            # inflated upper bounds
            comp1 = jax.jit(
                lambda *a: body(jnp.asarray(0.0, jnp.float32), *a)
            ).lower(*args).compile()
            print(f"[phase {name}] {sec/reps/batch*1e6:.0f} us/img "
                  f"(cost/img: {({k: round(v/batch, 3) for k, v in cost_summary(comp1).items()})})",
                  flush=True)

        time_phase(
            "backbone+fpn",
            lambda c_, p, im: jnp.sum(
                model.apply({"params": p}, im + c_, method=model.features)["p5"]
            ).astype(jnp.float32) * 1e-12,
            params, images,
        )
        time_phase(
            "cgm+head",
            lambda c_, p, f: sum(
                jnp.sum(h).astype(jnp.float32) for h in model.apply(
                    {"params": p},
                    model.apply(
                        {"params": p}, {k: v + c_ for k, v in f.items()}, kernels,
                        method=model.correlate,
                    ),
                    method=model.proposal_head,
                )[0]
            ) * 1e-12,
            params, feats,
        )
        time_phase(
            "decode+nms",
            lambda c_, h3, h4, h5, r3, r4, r5: jnp.sum(jax.vmap(
                lambda a, b, cc, d, e, f_, hw: decode_proposals(
                    [a, b, cc], [d, e, f_], cfg.centernet, canvas, hw,
                    training=False, nms_budget=cfg.static.nms_budget_test,
                ).scores
            )(h3 + c_, h4, h5, r3, r4, r5, hws)) * 1e-12,
            agn_hms[0], agn_hms[1], agn_hms[2],
            bbox_regs[0], bbox_regs[1], bbox_regs[2],
        )

        def roi_one(carry, p, f3, f4, f5, boxes, valid, scores, hw):
            feat_list = [f3, f4, f5]
            outs, bx = [], boxes + carry
            for stage in range(len(cfg.roi.cascade_ious)):
                out = model.apply(
                    {"params": p}, feat_list, bx, cache.rcnn_8, cache.rcnn_4,
                    stage, method=model.roi_stage,
                )
                outs.append(out)
                bx = apply_deltas(out.deltas, bx, cfg.roi.cascade_bbox_reg_weights[stage])
            det = roi_inference(outs, bx, valid, hw, cfg.roi, proposal_scores=scores)
            return jnp.sum(det.scores) * 1e-12

        time_phase(
            "roi+final-nms",
            lambda c_, p, f3, f4, f5, bxs, vld, scs: jnp.sum(jax.vmap(
                lambda a, b, cc, d, e, f_, hw: roi_one(c_, p, a, b, cc, d, e, f_, hw)
            )(f3, f4, f5, bxs, vld, scs, hws)),
            params, feats["p3"], feats["p4"], feats["p5"],
            props.boxes, props.valid, props.scores,
        )


if __name__ == "__main__":
    main()
