"""Profiling and cost-analysis utilities.

TPU-native replacements for the reference's ad-hoc telemetry (SURVEY.md §5):
wall-clock prints (predictor.py:50-54), the eval-loop s/iter telemetry
(d2 evaluation/evaluator.py) — covered by pipelines.evaluate — and the unused
FLOPs/param counter (fewx/utils/measures.py:158 `measure_model`):

  trace(...)        — context manager around jax.profiler.trace; view with
                      tensorboard or xprof
  cost_analysis(fn) — XLA-reported FLOPs/bytes for a jitted function
  measure_model(..) — FLOPs + param count of the flagship query path
  device_memory()   — live/peak HBM stats
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    with jax.profiler.trace(log_dir):
        yield
    print(f"profile written to {log_dir}")


def cost_analysis(fn, *args) -> Dict[str, float]:
    """XLA cost analysis of jit(fn)(*args): flops, bytes accessed, etc."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns a list per computation
        ca = ca[0]
    return {k: float(v) for k, v in ca.items() if isinstance(v, (int, float))}


def measure_model(cfg=None) -> Dict[str, float]:
    """FLOPs + params of the flagship single-image query path (the
    measure_model analog, fewx/utils/measures.py:158)."""
    import jax.numpy as jnp

    from ..config import get_config
    from ..pipelines.inference import make_detector, query_path_single
    from ..pipelines.support_cache import SupportCache
    from ..utils.params import init_params, param_count

    cfg = cfg or get_config("finetune_vovnet")
    model = make_detector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    c = cfg.fpn.out_channels
    cache = SupportCache(
        p3=jnp.zeros((32, 32, c)), p4=jnp.zeros((16, 16, c)), p5=jnp.zeros((8, 8, c)),
        rcnn_8=jnp.zeros((8, 8, c)), rcnn_4=jnp.zeros((4, 4, c)),
    )
    image = jnp.zeros((320, 448, 3))
    hw = jnp.asarray([320.0, 427.0])

    def fn(p, img):
        return query_path_single(model, p, cache, img, hw, cfg)

    ca = cost_analysis(fn, params, image)
    return {
        "params": param_count(params),
        "flops": ca.get("flops", float("nan")),
        "bytes_accessed": ca.get("bytes accessed", float("nan")),
    }


def device_memory() -> Dict[str, Any]:
    stats = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
        except Exception:
            s = None
        if s:
            stats[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
    return stats
