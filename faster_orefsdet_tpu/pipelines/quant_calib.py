"""Static int8 activation-scale calibration for serving (quantize="int8_static").

Round-3 measurement showed the serving path is HBM-bandwidth-bound and that
DYNAMIC int8 activation quantization loses throughput: the per-conv abs-max
reduction adds a full read+broadcast pass over every conv input
(RESULTS.md round-3, 2,367 vs 3,611 img/s). The static variant measures each
conv's input abs-max ONCE on a calibration batch and bakes `scale = amax/127`
into the serving program as a constant, so the quantize step is pure
elementwise (fusable, no reduction) and inter-conv activations can
materialize as int8.

Flow (see also tools/int8_ab.py):

    scales = calibrate_act_scales(cfg, params, calib_canvases)
    fn, canvas = build_serving_fn(cfg_int8_static, input_hw, act_scales=scales)

Calibration images should go through the SAME preprocessing as serving
(normalized canvases); a handful of representative frames is enough — the
scales only set the int8 grid, and symmetric per-channel weight scales do the
accuracy-heavy lifting (tests/test_quant.py A/B).

No reference analog: the reference serves f32 torch (predictor.py). This is
TPU-serving infrastructure in the spirit of its 50 FPS speed goal (log :813).
"""

from __future__ import annotations

import json
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config import Config

_EPS = 1e-8


def amax_tree_to_scales(tree) -> Dict[str, float]:
    """Flatten a mutable 'act_amax' collection into {module_path: scale}.

    The collection nests exactly like the module tree (QuantConv sows under
    its own scope), so "/".join(keys minus the trailing 'amax' leaf) equals
    "/".join(module.path) that QuantConv uses for lookup at trace time."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(tree)
    out = {}
    for key, value in flat.items():
        path = "/".join(k for k in key[:-1])
        out[path] = max(float(value) / 127.0, _EPS)
    return out


def calibrate_act_scales(
    cfg: Config,
    params,
    images: jnp.ndarray,
    batch_stats=None,
    model=None,
    max_batch: int = 8,
) -> Dict[str, float]:
    """Run the backbone+FPN over calibration canvases recording per-conv
    input abs-max; returns the static-scale dict for build_*_fn(act_scales=).

    images: [N, Hc, Wc, 3] normalized canvases (serving preprocessing
    applied). Chunked to max_batch per dispatch; abs-max accumulates across
    chunks. cfg must have quantize in ("int8", "int8_static") so the model
    instantiates QuantConv layers (which do the sowing).
    """
    from .inference import make_detector

    if getattr(cfg, "quantize", "none") == "none":
        raise ValueError(
            "calibrate_act_scales needs a quantized config "
            "(cfg.quantize='int8_static') so QuantConv layers record amax"
        )
    model = model or make_detector(cfg)
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats

    @jax.jit
    def amax_fn(variables, imgs):
        _, col = model.apply(
            variables, imgs, method=model.features, mutable=["act_amax"]
        )
        return col["act_amax"]

    n = images.shape[0]
    if n == 0:
        raise ValueError("no calibration images")
    tree = None
    step = max(1, min(max_batch, n))
    for i in range(0, n, step):
        chunk = images[i : i + step]
        if chunk.shape[0] < step:
            # pad the tail by repetition (abs-max is idempotent under
            # repeats) so every dispatch reuses the one compiled shape
            pad = jnp.repeat(chunk[:1], step - chunk.shape[0], axis=0)
            chunk = jnp.concatenate([chunk, pad], axis=0)
        col = amax_fn(variables, chunk)
        tree = col if tree is None else jax.tree.map(jnp.maximum, tree, col)
    return amax_tree_to_scales(jax.device_get(tree))


def save_act_scales(path: str, scales: Dict[str, float]) -> None:
    with open(path, "w") as f:
        json.dump(scales, f, indent=1, sort_keys=True)


def load_act_scales(path: str) -> Dict[str, float]:
    with open(path) as f:
        return {str(k): float(v) for k, v in json.load(f).items()}
