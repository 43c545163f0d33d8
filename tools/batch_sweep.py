"""Batched serving sweep: dispatch-loop + pure-compute throughput per batch."""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from faster_orefsdet_tpu.config import get_config
from faster_orefsdet_tpu.pipelines.inference import (
    build_batched_inference_fn,
    make_detector,
    query_path_single,
)
from faster_orefsdet_tpu.pipelines.support_cache import SupportCache
from faster_orefsdet_tpu.utils.params import init_params

cfg = get_config("finetune_vovnet").replace(compute_dtype="bfloat16")
model = make_detector(cfg)
params = init_params(model, cfg, jax.random.PRNGKey(0))
c = cfg.fpn.out_channels
rng = np.random.default_rng(0)
cache = SupportCache(
    p3=jnp.asarray(rng.standard_normal((32, 32, c), dtype=np.float32)),
    p4=jnp.asarray(rng.standard_normal((16, 16, c), dtype=np.float32)),
    p5=jnp.asarray(rng.standard_normal((8, 8, c), dtype=np.float32)),
    rcnn_8=jnp.asarray(rng.standard_normal((8, 8, c), dtype=np.float32)),
    rcnn_4=jnp.asarray(rng.standard_normal((4, 4, c), dtype=np.float32)),
)
canvas = (320, 448)
hw = jnp.asarray([320.0, 427.0])

for batch in [int(a) for a in sys.argv[1:]] or [64, 96, 128]:
    images = jnp.asarray(
        rng.standard_normal((batch, *canvas, 3), dtype=np.float32))
    hws = jnp.tile(hw[None], (batch, 1))

    # pure compute: chain K batched iterations in one program
    K = 10

    @jax.jit
    def chained(params, cache, images, hws):
        def body(i, carry):
            det = jax.vmap(
                lambda img, h: query_path_single(model, params, cache,
                                                 img + carry, h, cfg)
            )(images, hws)
            return jnp.sum(det.scores).astype(jnp.float32) * 1e-12
        return jax.lax.fori_loop(0, K, body, jnp.asarray(0.0, jnp.float32))

    float(chained(params, cache, images, hws))
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(params, cache, images, hws))
        runs.append(time.perf_counter() - t0)
    pure = batch * K / min(runs)

    binfer = build_batched_inference_fn(cfg, model)
    float(jnp.sum(binfer(params, cache, images, hws).scores))
    nb = 20
    t0 = time.perf_counter()
    for _ in range(nb - 1):
        binfer(params, cache, images, hws)
    float(jnp.sum(binfer(params, cache, images, hws).scores))
    disp = nb * batch / (time.perf_counter() - t0)
    print(f"batch {batch:4d}: pure {pure:8.1f} img/s   dispatch-loop {disp:8.1f} img/s",
          flush=True)
