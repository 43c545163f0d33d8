"""Shared measurement harness for the tools/ TPU scripts.

One copy of the methodology the round-2/3 RESULTS.md numbers were produced
with, so a fix (e.g. to RTT subtraction or the chained-rep program) lands
everywhere at once:

  - train_synthetic_fsod: the synthetic-ore training run (round-2 protocol
    defaults: 800 it, 5-shot episodes, 320 single-scale, 16 images).
  - make_val_records: a held-out synthetic val set.
  - eval_cache: the 24-shot support cache (all.sh SHOT=24).
  - measure_rtt: relay dispatch+readback RTT on a trivial program —
    `block_until_ready` does NOT block through the axon relay, so every
    timing here forces a host readback and subtracts this RTT.
  - chained_serving_fps: pure-compute serving throughput — `reps` chained
    evaluations inside ONE program (lax.fori_loop with a data dependency
    between reps), timed by host readback, RTT-subtracted. Identical to
    bench.py's methodology.

Keep scripts runnable from anywhere: each tool carries the repo-root
sys.path shim (CLAUDE.md), and `import _harness` resolves because
`python tools/<script>.py` puts tools/ first on sys.path.
"""

import dataclasses
import tempfile
import time
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_FPS = 50.0  # the reference's published headline (BASELINE.md)
SERVING_CANVAS = (320, 448)  # 320-short-side eval canvas, padded to 448
SERVING_HW = (320.0, 427.0)  # true pre-pad image extent on that canvas


class TrainRun(NamedTuple):
    cfg: object
    model: object
    state: object
    entries: list
    records: list
    losses: np.ndarray


def train_synthetic_fsod(iters=800, n_train=16, b=1, shot=5, scale=320,
                         config="finetune_vovnet", prefix="r3_train_",
                         log_every=200, seed=0, data_kwargs=None):
    """Round-2 protocol synthetic training run; returns the trained state.

    Losses stay on-device during the loop (one bulk readback at the end) so
    the loop is not host-sync-bound; progress prints force a readback only
    every `log_every` iters.
    """
    from faster_orefsdet_tpu.config import get_config
    from faster_orefsdet_tpu.data.loader import train_canvas, train_loader
    from faster_orefsdet_tpu.data.mapper import EpisodicMapper, SupportSampler
    from faster_orefsdet_tpu.data.synthetic import make_synthetic_setup
    from faster_orefsdet_tpu.pipelines.inference import make_detector
    from faster_orefsdet_tpu.pipelines.train_step import TrainState, build_train_step
    from faster_orefsdet_tpu.solver import build_optimizer
    from faster_orefsdet_tpu.utils.params import init_variables

    cfg = get_config(config)
    cfg = cfg.replace(
        fs=dataclasses.replace(cfg.fs, support_shot=shot),
        solver=dataclasses.replace(cfg.solver, max_iter=iters, ims_per_batch=b),
        input=dataclasses.replace(cfg.input, min_size_train=(scale,)),
    )
    out = tempfile.mkdtemp(prefix=prefix)
    records, entries = make_synthetic_setup(out, num_images=n_train, seed=seed,
                                            **(data_kwargs or {}))
    print(f"train {len(records)} imgs (B={b}, seed={seed})", flush=True)

    model = make_detector(cfg)
    params, batch_stats = init_variables(model, cfg, jax.random.PRNGKey(seed))
    tx = build_optimizer(cfg.solver, params)
    step = build_train_step(cfg, model, tx)
    state = TrainState(params, tx.init(params), jnp.asarray(0), batch_stats)
    sampler = SupportSampler(entries)
    mapper = EpisodicMapper(cfg, sampler, is_train=True,
                            canvas_hw=train_canvas(records, cfg))
    loader = train_loader(records, mapper, b, seed=seed)
    rng = jax.random.PRNGKey(seed + 1)
    losses = []
    tw, last_it = time.time(), 0
    for it in range(iters):
        batch = next(loader)
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub)
        losses.append(metrics["total_loss"])
        if it in (0, 1) or it % log_every == 0 or it == iters - 1:
            now = time.time()
            print(f"it {it:4d} loss {float(losses[-1]):.3f} "
                  f"({(now - tw) / max(it - last_it, 1) * 1000:.0f} ms/it, "
                  f"{b * max(it - last_it, 1) / max(now - tw, 1e-9):.0f} img/s)",
                  flush=True)
            tw, last_it = now, it
    losses = np.asarray(jax.device_get(jnp.stack(losses)))
    print(f"loss first20 {losses[:20].mean():.3f} -> "
          f"last20 {losses[-20:].mean():.3f}", flush=True)
    assert np.isfinite(losses).all(), "non-finite loss"
    return TrainRun(cfg, model, state, entries, records, losses)


def make_val_records(n_val, seed=1, prefix="r3_val_"):
    from faster_orefsdet_tpu.data.coco import load_coco_json
    from faster_orefsdet_tpu.data.synthetic import generate_ore_dataset

    vj, vi = generate_ore_dataset(tempfile.mkdtemp(prefix=prefix),
                                  num_images=n_val, seed=seed)
    val_records = load_coco_json(vj, vi)
    print(f"val {len(val_records)} imgs", flush=True)
    return val_records


def eval_cache(run: TrainRun, shot=24):
    """(cfg_shot, cache): the SHOT=24 eval support cache (all.sh)."""
    from faster_orefsdet_tpu.pipelines.evaluate import encode_support_set

    cfg_s = run.cfg.replace(fs=dataclasses.replace(run.cfg.fs, support_shot=shot))
    cache = encode_support_set(run.model, run.state.params, run.entries, cfg_s,
                               batch_stats=run.state.batch_stats)
    return cfg_s, cache


def measure_rtt(n=8):
    """Median dispatch+readback RTT of a trivial program (subtract from any
    single-dispatch wall time; NEVER divide one program's wall by its
    chained-rep count without this — CLAUDE.md)."""
    probe = jnp.zeros((8,), jnp.float32)

    @jax.jit
    def trivial(x):
        return jnp.sum(x) * 1e-12

    float(trivial(probe))
    rtts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(trivial(probe))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(f"relay RTT {rtt*1000:.1f} ms", flush=True)
    return rtt


def random_serving_batch(batch, canvas=SERVING_CANVAS, seed=0):
    rng_np = np.random.default_rng(seed)
    images = jnp.asarray(rng_np.standard_normal((batch, *canvas, 3),
                                                dtype=np.float32))
    hws = jnp.tile(jnp.asarray(list(SERVING_HW))[None], (batch, 1))
    return images, hws


def chained_serving_fps(model, cfg, params, cache, images, hws, rtt,
                        reps=10, timed_runs=3, label="", act_scales=None):
    """Pure-compute img/s: `reps` chained full query paths in ONE program
    (data dependency between reps defeats dead-code elimination), best of
    `timed_runs` host-readback timings, RTT subtracted.

    act_scales: static int8 activation scales (pipelines.quant_calib) for
    cfg.quantize == "int8_static" programs."""
    from faster_orefsdet_tpu.ops.quant import static_act_scales
    from faster_orefsdet_tpu.pipelines.inference import query_path_single

    batch = images.shape[0]

    @jax.jit
    def chained(params, cache, images, hws):
        def body(i, carry):
            det = jax.vmap(
                lambda im, hw: query_path_single(
                    model, params, cache, im + carry, hw, cfg
                )
            )(images, hws)
            return jnp.sum(det.scores) * 1e-12

        with static_act_scales(act_scales):
            return jax.lax.fori_loop(0, reps, body, jnp.asarray(0.0, images.dtype))

    t0 = time.perf_counter()
    float(chained(params, cache, images, hws))  # compile
    if label:
        print(f"[{label}] compile {time.perf_counter()-t0:.0f}s", flush=True)
    runs = []
    for _ in range(timed_runs):
        t0 = time.perf_counter()
        float(chained(params, cache, images, hws))
        runs.append(time.perf_counter() - t0)
    fps = reps * batch / max(min(runs) - rtt, 1e-9)
    if label:
        print(f"[{label}] batch-{batch} pure compute: {fps:.0f} img/s "
              f"({1000.0/fps:.3f} ms/img)  vs_baseline "
              f"{fps/BASELINE_FPS:.1f}x", flush=True)
    return fps


def random_support_cache(cfg, seed=0):
    """A synthetic SupportCache with the serving cache's exact shapes (for
    throughput-only runs where the numbers don't depend on cache content)."""
    from faster_orefsdet_tpu.pipelines.support_cache import SupportCache

    c = cfg.fpn.out_channels
    rng = np.random.default_rng(seed)
    return SupportCache(
        p3=jnp.asarray(rng.standard_normal((32, 32, c), dtype=np.float32)),
        p4=jnp.asarray(rng.standard_normal((16, 16, c), dtype=np.float32)),
        p5=jnp.asarray(rng.standard_normal((8, 8, c), dtype=np.float32)),
        rcnn_8=jnp.asarray(rng.standard_normal((8, 8, c), dtype=np.float32)),
        rcnn_4=jnp.asarray(rng.standard_normal((4, 4, c), dtype=np.float32)),
    )
