"""int8 W8A8 serving A/B vs the bf16 fast preset (round-3 follow-up).

One synthetic training run (round-2 protocol: 800 it, 5-shot, 320
single-scale), then on the trained weights:
  1. AP on an N_VAL-image synthetic val set (24-shot cache, eval-batch 32)
     for serving_vovnet_fast (bf16) vs serving_vovnet_int8 — the accuracy
     cost of quantization at the same post_nms=64 budget;
  2. batch-128 pure-compute serving throughput for both presets (chained
     reps in ONE program, relay RTT subtracted — bench.py methodology).

Usage: python tools/int8_ab.py [iters=800] [n_val=256]
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
    n_val = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    from faster_orefsdet_tpu.config import get_config
    from faster_orefsdet_tpu.data.coco import load_coco_json
    from faster_orefsdet_tpu.data.loader import train_canvas, train_loader
    from faster_orefsdet_tpu.data.mapper import EpisodicMapper, SupportSampler
    from faster_orefsdet_tpu.data.synthetic import (
        generate_ore_dataset,
        make_synthetic_setup,
    )
    from faster_orefsdet_tpu.pipelines.evaluate import encode_support_set, evaluate
    from faster_orefsdet_tpu.pipelines.inference import make_detector, query_path_single
    from faster_orefsdet_tpu.pipelines.train_step import TrainState, build_train_step
    from faster_orefsdet_tpu.solver import build_optimizer
    from faster_orefsdet_tpu.utils.params import init_variables

    cfg = get_config("finetune_vovnet")
    cfg = cfg.replace(
        fs=dataclasses.replace(cfg.fs, support_shot=5),
        solver=dataclasses.replace(cfg.solver, max_iter=iters),
        input=dataclasses.replace(cfg.input, min_size_train=(320,)),
    )

    out = tempfile.mkdtemp(prefix="int8_train_")
    records, entries = make_synthetic_setup(out, num_images=16, seed=0)
    val_out = tempfile.mkdtemp(prefix="int8_val_")
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
    tw = time.time()
    last = None
    for it in range(iters):
        batch = next(loader)
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub)
        last = metrics["total_loss"]
        if it in (0, 1) or it % 200 == 0 or it == iters - 1:
            print(f"it {it:4d} loss {float(last):.3f} "
                  f"({time.time() - tw:.1f}s elapsed)", flush=True)

    cfg24 = cfg.replace(fs=dataclasses.replace(cfg.fs, support_shot=24))
    cache = encode_support_set(model, state.params, entries, cfg24,
                               batch_stats=state.batch_stats)

    # ---- AP A/B at the published eval protocol
    for preset in ("serving_vovnet_fast", "serving_vovnet_int8"):
        ecfg = get_config(preset)
        ecfg = ecfg.replace(
            fs=dataclasses.replace(ecfg.fs, support_shot=24),
            input=cfg24.input,
        )
        emodel = make_detector(ecfg)
        t0 = time.time()
        res = evaluate(emodel, state.params, cache, val_records, ecfg,
                       batch_stats=state.batch_stats, batch_size=32)
        wall = time.time() - t0
        ap = {k: round(v, 3) for k, v in res.items() if k.startswith(("AP", "AR"))}
        print(f"\n[{preset}] {len(val_records)} images: {ap}  wall {wall:.1f}s",
              flush=True)

    # ---- serving throughput A/B (batch 128, chained, RTT-subtracted)
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
    print(f"\nrelay RTT {rtt*1000:.1f} ms", flush=True)

    for preset in ("serving_vovnet_fast", "serving_vovnet_int8"):
        scfg = get_config(preset)
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
            return jax.lax.fori_loop(0, reps, body, jnp.asarray(0.0, images.dtype))

        float(chained(state.params, cache, images, hws))  # compile
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(state.params, cache, images, hws))
            runs.append(time.perf_counter() - t0)
        fps = reps * batch / max(min(runs) - rtt, 1e-9)
        print(f"[{preset}] batch-128 pure compute: {fps:.0f} img/s "
              f"vs_baseline {fps/50.0:.1f}x", flush=True)


if __name__ == "__main__":
    main()
