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
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    n_val = int(sys.argv[2]) if len(sys.argv) > 2 else 1060
    skip_serving = "--skip-serving" in sys.argv

    from faster_orefsdet_tpu.config import get_config
    from faster_orefsdet_tpu.data.coco import load_coco_json
    from faster_orefsdet_tpu.data.loader import train_canvas, train_loader
    from faster_orefsdet_tpu.data.mapper import EpisodicMapper, SupportSampler
    from faster_orefsdet_tpu.data.synthetic import (
        generate_ore_dataset,
        make_synthetic_setup,
    )
    from faster_orefsdet_tpu.pipelines.evaluate import encode_support_set, evaluate
    from faster_orefsdet_tpu.pipelines.inference import make_detector
    from faster_orefsdet_tpu.pipelines.train_step import TrainState, build_train_step
    from faster_orefsdet_tpu.solver import build_optimizer
    from faster_orefsdet_tpu.utils.params import init_variables

    cfg = get_config("finetune_vovnet")
    cfg = cfg.replace(
        fs=dataclasses.replace(cfg.fs, support_shot=5),
        solver=dataclasses.replace(cfg.solver, max_iter=iters),
        input=dataclasses.replace(cfg.input, min_size_train=(320,)),
    )

    out = tempfile.mkdtemp(prefix="r3_train_")
    records, entries = make_synthetic_setup(out, num_images=16, seed=0)
    val_out = tempfile.mkdtemp(prefix="r3_val_")
    vj, vi = generate_ore_dataset(val_out, num_images=n_val, seed=1)
    val_records = load_coco_json(vj, vi)
    print(f"train 16 imgs, val {len(val_records)} imgs", flush=True)

    model = make_detector(cfg)
    params, batch_stats = init_variables(model, cfg, jax.random.PRNGKey(0))
    tx = build_optimizer(cfg.solver, params)
    step = build_train_step(cfg, model, tx)
    state = TrainState(params, tx.init(params), jnp.asarray(0), batch_stats)
    sampler = SupportSampler(entries)
    mapper = EpisodicMapper(cfg, sampler, is_train=True,
                            canvas_hw=train_canvas(records, cfg))
    loader = train_loader(records, mapper, cfg.solver.ims_per_batch, seed=0)
    rng = jax.random.PRNGKey(1)
    losses = []
    tw = time.time()
    for it in range(iters):
        batch = next(loader)
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub)
        losses.append(metrics["total_loss"])
        if it in (0, 1) or it % 200 == 0 or it == iters - 1:
            print(f"it {it:4d} loss {float(losses[-1]):.3f} "
                  f"({time.time() - tw:.1f}s elapsed)", flush=True)
    losses = np.asarray(jax.device_get(jnp.stack(losses)))
    print(f"loss first20 {losses[:20].mean():.3f} -> last20 {losses[-20:].mean():.3f}",
          flush=True)

    # 24-shot eval cache (all.sh SHOT=24)
    cfg24 = cfg.replace(fs=dataclasses.replace(cfg.fs, support_shot=24))
    cache = encode_support_set(model, state.params, entries, cfg24,
                               batch_stats=state.batch_stats)

    # ---- budget ablation on the full val set at eval-batch 32
    for post in (256, 128, 64):
        ecfg = cfg24.replace(
            centernet=dataclasses.replace(cfg24.centernet, post_nms_topk_test=post)
        )
        t0 = time.time()
        res = evaluate(model, state.params, cache, val_records, ecfg,
                       batch_stats=state.batch_stats, batch_size=32)
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
    from faster_orefsdet_tpu.pipelines.inference import query_path_single
    from faster_orefsdet_tpu.utils.params import init_params

    rng_np = np.random.default_rng(0)
    batch, reps = 128, 10
    canvas = (320, 448)
    images = jnp.asarray(rng_np.standard_normal((batch, *canvas, 3),
                                                dtype=np.float32))
    hws = jnp.tile(jnp.asarray([320.0, 427.0])[None], (batch, 1))

    @jax.jit
    def trivial(x):
        return jnp.sum(x) * 1e-12

    float(trivial(images))
    rtts = []
    for _ in range(8):
        t0 = time.perf_counter()
        float(trivial(images))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    for post in (256, 128, 64):
        scfg = get_config("serving_vovnet")
        scfg = scfg.replace(
            centernet=dataclasses.replace(scfg.centernet, post_nms_topk_test=post)
        )
        smodel = make_detector(scfg)

        @jax.jit
        def chained(params, cache, images, hws):
            def body(i, carry):
                det = jax.vmap(
                    lambda im, hw: query_path_single(
                        smodel, params, cache, im + carry, hw, scfg
                    )
                )(images, hws)
                return jnp.sum(det.scores) * 1e-12
            return jax.lax.fori_loop(0, reps, body,
                                     jnp.asarray(0.0, images.dtype))

        float(chained(state.params, cache, images, hws))  # compile
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(state.params, cache, images, hws))
            runs.append(time.perf_counter() - t0)
        fps = reps * batch / max(min(runs) - rtt, 1e-9)
        print(f"[serving post_nms={post}] batch-128 pure compute: "
              f"{fps:.0f} img/s ({1000.0*batch*reps/fps/batch/reps:.3f} ms/img)"
              f"  vs_baseline {fps/50.0:.1f}x", flush=True)


if __name__ == "__main__":
    main()
