"""CPU-decidable AP A/Bs on one trained model (round 5): int8-RESIDENT
backbone vs int8_static vs float, AND the pre-NMS candidate-count lever.

The resident mode (quantize="int8_resident") changes WHERE quantization
happens (producer epilogue writes int8; the OSA concat is int8 with scales
folded into the aggregation conv's weights) but keeps the same int8 grid
per boundary as int8_static — so AP should be in the same class. The
pre_nms_topk_test rows (1000→512→256) and nms_budget_test row (1024→512)
measure whether the decode+NMS candidate set (VERDICT r4 weak #4) can be
cut at zero AP cost — the complementary lever to the Pallas NMS kernel.

Protocol: the synthetic round-2 protocol — one 800-iter training run, then
the SAME trained params evaluated under each variant at the fast preset's
post_nms=64 budget on a 512-image held-out val set (24-shot cache,
eval-batch 32), quantized variants calibrated on 8 val canvases. The
support cache is encoded ONCE at f32 (the realistic deployment: supports
precomputed offline; quantization applies to the query stream).
ABL_ROWS=tag1,tag2 filters the variant list (training is seed-pinned, so
split runs reproduce the same model).

CPU-RUNNABLE (self-pins CPU under JAX_PLATFORMS=cpu; ~1.5-2.5 h on the
1-core box — run in background, write /tmp/pytest.pid so the relay
supervisor defers the TPU queue while this hogs the core, CLAUDE.md).

Usage: python tools/resident_ap_ab.py [iters=800] [n_val=512]
Reference budget being held fixed: fsod_rpn.py:1199-1206 (kthvalue trim).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import tempfile
import time

import jax

if _os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon sitecustomize swallows the env var (CLAUDE.md gotcha)
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from _harness import eval_cache, train_synthetic_fsod


def main():
    iters = int(_sys.argv[1]) if len(_sys.argv) > 1 else 800
    n_val = int(_sys.argv[2]) if len(_sys.argv) > 2 else 512

    from faster_orefsdet_tpu.data.coco import load_coco_json
    from faster_orefsdet_tpu.data.loader import eval_canvas, eval_loader
    from faster_orefsdet_tpu.data.synthetic import generate_ore_dataset
    from faster_orefsdet_tpu.pipelines.evaluate import evaluate
    from faster_orefsdet_tpu.pipelines.quant_calib import calibrate_act_scales

    vj, vi = generate_ore_dataset(
        tempfile.mkdtemp(prefix="resident_ap_val_"), num_images=n_val, seed=97
    )
    val_records = load_coco_json(vj, vi)
    print(f"val {len(val_records)} imgs", flush=True)

    t0 = time.time()
    run = train_synthetic_fsod(iters=iters, prefix="resident_ap_train_", seed=0,
                               log_every=400)
    cfg24, cache = eval_cache(run)
    print(f"trained in {time.time()-t0:.0f}s", flush=True)

    # everything held fixed except `quantize`: f32 compute (CPU host), the
    # fast preset's post_nms=64 budget, same params/cache/val set
    base = cfg24.replace(
        centernet=dataclasses.replace(cfg24.centernet, post_nms_topk_test=64)
    )

    # calibration canvases: first 8 val images through the eval preprocessing
    canvas_hw = eval_canvas(val_records, base)
    canvases = []
    for _, canvas, _, _ in eval_loader(val_records[:8], base, canvas_hw):
        canvases.append(canvas)
    calib = jnp.stack(canvases)

    # two CPU-decidable axes on the same trained model:
    #   quantize: none / int8_static / int8_resident  (resident AP-neutrality)
    #   decode candidate budgets (VERDICT r4 item 4's candidate-count lever):
    #     pre_nms_topk_test 1000 -> 512/256 (per-level top-k cap; the fast
    #       canvas's concat is 1000(p3,capped)+~560(p4)+~140(p5))
    #     static.nms_budget_test 1024 -> 512 (the set entering suppression)
    variants = [
        ("float", base),
        ("int8_static", base.replace(quantize="int8_static")),
        ("int8_resident", base.replace(quantize="int8_resident")),
        ("prenms512", base.replace(
            centernet=dataclasses.replace(base.centernet, pre_nms_topk_test=512))),
        ("prenms256", base.replace(
            centernet=dataclasses.replace(base.centernet, pre_nms_topk_test=256))),
        ("budget512", base.replace(
            static=dataclasses.replace(base.static, nms_budget_test=512))),
        # the TURBO preset's COMBINED budgets (prenms256 + budget512) —
        # the individual rows being neutral does not logically imply the
        # combination is; this row decides it on the same trained model
        ("turbo", base.replace(
            centernet=dataclasses.replace(base.centernet, pre_nms_topk_test=256),
            static=dataclasses.replace(base.static, nms_budget_test=512))),
    ]
    rows = _os.environ.get("ABL_ROWS")
    if rows:
        keep = set(rows.split(","))
        variants = [(t, c) for t, c in variants if t in keep]

    from faster_orefsdet_tpu.pipelines.inference import make_detector

    results = {}
    for tag, ecfg in variants:
        scales = None
        # the MODEL must be rebuilt from the variant cfg: a flax module
        # holds its construction-time cfg, so passing the float-built
        # run.model would silently evaluate the float backbone for the
        # quantized rows (caught live in round 5 — the first run produced
        # bit-identical AP for all quantize variants for exactly this
        # reason; params trees are identical so the rebuild is free)
        emodel = make_detector(ecfg) if getattr(ecfg, "quantize", "none") != "none" else run.model
        if getattr(ecfg, "quantize", "none") != "none":
            t0 = time.time()
            scales = calibrate_act_scales(ecfg, run.state.params, calib,
                                          model=emodel)
            print(f"[{tag}] {len(scales)} scales in {time.time()-t0:.0f}s",
                  flush=True)
        t0 = time.time()
        res = evaluate(emodel, run.state.params, cache, val_records, ecfg,
                       batch_stats=run.state.batch_stats, batch_size=32,
                       act_scales=scales)
        ap = {k: round(v, 3) for k, v in res.items() if k.startswith("AP")}
        results[tag] = res["AP"]
        print(f"[{tag}] {ap} ({time.time()-t0:.0f}s)", flush=True)

    print("\n==== summary (AP, post_nms=64, 24-shot, f32 host compute) ====")
    base_ap = results.get("float")
    for tag, ap in results.items():
        delta = f"  (delta vs float: {ap-base_ap:+.3f})" if base_ap is not None else ""
        print(f"{tag:14s} AP {ap:.3f}{delta}", flush=True)


if __name__ == "__main__":
    main()
