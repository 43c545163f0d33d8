"""Train-step decomposition: where do the 15.5 ms/it at B=8 go?

Times three chained programs on a fixed synthetic batch (chained reps with
a data dependency, RTT-subtracted — _harness methodology):
  1. forward   — loss_fn only
  2. fwd+bwd   — jax.value_and_grad(loss_fn)
  3. full step — build_train_step (grad + optax update + clip)
plus XLA cost analysis (GFLOPs / bytes) for each, so fwd:bwd:update
ratios and the optimizer overhead are visible.

Usage: python tools/train_profile.py [b=8] [reps=20] [shot=5] [f32|bf16]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from _harness import measure_rtt

from faster_orefsdet_tpu.config import get_config
from faster_orefsdet_tpu.pipelines.inference import make_detector
from faster_orefsdet_tpu.pipelines.train_step import (
    TrainBatch,
    TrainState,
    build_train_step,
    loss_fn,
)
from faster_orefsdet_tpu.solver import build_optimizer
from faster_orefsdet_tpu.utils.params import init_params


def fixed_batch(rng_np, b, s, canvas):
    nmax = 20
    gtb = np.zeros((b, nmax, 4), np.float32)
    gtb[:, 0] = [20, 20, 120, 100]
    gtb[:, 1] = [150, 60, 260, 170]
    gtv = np.zeros((b, nmax), bool)
    gtv[:, :2] = True
    return TrainBatch(
        images=jnp.asarray(rng_np.standard_normal((b, *canvas, 3), dtype=np.float32)),
        image_hw=jnp.asarray([[320.0, 427.0]] * b),
        gt_boxes=jnp.asarray(gtb),
        gt_classes=jnp.zeros((b, nmax), jnp.int32),
        gt_valid=jnp.asarray(gtv),
        support_images=jnp.asarray(
            rng_np.standard_normal((b, s, 256, 256, 3), dtype=np.float32)
        ),
        support_boxes=jnp.asarray(
            np.tile([[20.0, 20.0, 220.0, 220.0]], (b, s, 1)).astype(np.float32)
        ),
    )


def cost_of(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return (ca.get("flops", 0.0) / 1e9, ca.get("bytes accessed", 0.0) / 1e6)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    s = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    dtype = sys.argv[4] if len(sys.argv) > 4 else "f32"

    cfg = get_config("finetune_vovnet")
    if dtype == "bf16":
        # round-2 measured bf16 mixed-precision training AP-neutral; params
        # stay f32, compute casts to bf16
        cfg = cfg.replace(compute_dtype="bfloat16")
    print(f"[train_profile] B={b} shot={s} dtype={dtype}", flush=True)
    model = make_detector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    tx = build_optimizer(cfg.solver, params)
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    rng_np = np.random.default_rng(0)
    batch = fixed_batch(rng_np, b, s, (320, 448))
    key = jax.random.PRNGKey(0)
    rtt = measure_rtt()

    def chained(body):
        # data dependency between reps via an image perturbation
        def fn(params, batch, key):
            def step(i, carry):
                pb = batch._replace(images=batch.images + carry)
                return body(params, pb, key) * 1e-12

            return jax.lax.fori_loop(0, reps, step, jnp.asarray(0.0, jnp.float32))

        return fn

    def fwd(params, pb, key):
        total, _ = loss_fn(params, pb, model, cfg, key)
        return total

    def fwdbwd(params, pb, key):
        total, grads = jax.value_and_grad(lambda p: loss_fn(p, pb, model, cfg, key)[0])(
            params
        )
        return total + sum(jnp.sum(jnp.abs(g)) for g in jax.tree.leaves(grads)) * 1e-20

    programs = {"forward": fwd, "fwd+bwd": fwdbwd}
    results = {}
    for name, body in programs.items():
        f = chained(body)
        t0 = time.perf_counter()
        compiled = jax.jit(f).lower(params, batch, key).compile()
        # cost from the UNCHAINED program: XLA counts a rolled fori_loop
        # body ONCE, so dividing the chained cost by reps understates by
        # reps-x (round-3 late fix, same as serving_profile)
        comp1 = jax.jit(lambda p, pb, k: body(p, pb, k)).lower(
            params, batch, key).compile()
        gflops, mb = cost_of(comp1)
        print(f"[{name}] compile {time.perf_counter()-t0:.0f}s  "
              f"cost/it: {gflops:.1f} GFLOP, {mb:.0f} MB", flush=True)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(compiled(params, batch, key))
            runs.append(time.perf_counter() - t0)
        ms = max(min(runs) - rtt, 1e-9) / reps * 1e3
        results[name] = ms
        print(f"[{name}] {ms:.2f} ms/it ({b/ms*1e3:.0f} img/s)", flush=True)

    # full step: sequential dispatches (state-carrying; can't chain in one
    # program without scan — use build_train_step_scan's measurement for
    # that), so subtract RTT per dispatch
    step = build_train_step(cfg, model, tx)
    t0 = time.perf_counter()
    st, m = step(state, batch, key)
    float(m["total_loss"])
    print(f"[full step] compile+first {time.perf_counter()-t0:.0f}s", flush=True)
    n = reps
    t0 = time.perf_counter()
    for _ in range(n - 1):
        st, m = step(st, batch, key)
    st, m = step(st, batch, key)
    float(m["total_loss"])
    ms = (time.perf_counter() - t0) / n * 1e3
    results["full step (incl dispatch)"] = ms
    print(f"[full step] {ms:.2f} ms/it ({b/ms*1e3:.0f} img/s) incl. dispatch",
          flush=True)
    print("summary:", {k: round(v, 2) for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
