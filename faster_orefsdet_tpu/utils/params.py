"""Parameter initialization covering every detector method.

linen only materializes parameters for modules that are actually called, so a
single `model.init` on one method misses the others; this helper traces each
phase once on tiny dummy inputs and merges the resulting trees. Weight-init
distributions follow the reference where it specifies them (CenterNet head
N(0, 0.01) + bias constants; elsewhere d2 defaults caffe2-style fills, which
only matter for from-scratch training — the published flow loads pretrained
VoVNet weights anyway).

Backbones with trainable BatchNorm (dla.norm="BN", finetune_dla) also carry a
`batch_stats` collection: use `init_variables` to get (params, batch_stats);
`init_params` stays the params-only entry point (batch_stats discarded —
fine for frozen/stateless-norm configs where it is None).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..models.detector import CenterNet2Detector


def init_variables(
    model: CenterNet2Detector, cfg: Config, rng: jax.Array
) -> Tuple[Dict, Optional[Dict]]:
    """Returns (params, batch_stats); batch_stats is None when the model has
    no mutable norm state (every config except dla.norm="BN" families)."""
    c = cfg.fpn.out_channels
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    r1, r2, r3, r4, r5 = jax.random.split(rng, 5)

    v1 = model.init(r1, img, method=model.features)
    params = v1["params"]
    batch_stats = v1.get("batch_stats")
    base_vars = dict(v1)
    feats = model.apply(base_vars, img, method=model.features)
    p_sup = model.init(r2, feats, method=model.refine_support)["params"]
    kernels = {
        k: (jnp.zeros((c,)), jnp.zeros((3, c)), jnp.zeros((3, c)))
        for k in ("p3", "p4", "p5")
    }
    p_cor = model.init(r3, feats, kernels, method=model.correlate)["params"]
    pos = model.apply({"params": {**params, **p_cor}}, feats, kernels, method=model.correlate)
    p_head = model.init(r4, pos, method=model.proposal_head)["params"]
    feat_list = [feats[l][0] for l in ("p3", "p4", "p5")]
    boxes = jnp.asarray([[1.0, 1.0, 30.0, 30.0]] * 4)
    p_roi = model.init(
        r5,
        feat_list,
        boxes,
        jnp.zeros((cfg.roi.pooler_resolution, cfg.roi.pooler_resolution, c)),
        jnp.zeros((cfg.roi.pooler_resolution2, cfg.roi.pooler_resolution2, c)),
        0,
        method=model.roi_stage,
    )["params"]
    # extra cascade stages share the DSA convs but have per-stage fc/predictors
    for stage in range(1, len(cfg.roi.cascade_ious)):
        p_roi_s = model.init(
            jax.random.fold_in(r5, stage), feat_list, boxes,
            jnp.zeros((cfg.roi.pooler_resolution, cfg.roi.pooler_resolution, c)),
            jnp.zeros((cfg.roi.pooler_resolution2, cfg.roi.pooler_resolution2, c)),
            stage, method=model.roi_stage,
        )["params"]
        p_roi = merge_params(p_roi, p_roi_s)
    return merge_params(params, p_sup, p_cor, p_head, p_roi), batch_stats


def init_params(model: CenterNet2Detector, cfg: Config, rng: jax.Array) -> Dict:
    return init_variables(model, cfg, rng)[0]


def merge_params(*trees) -> Dict:
    out: Dict = {}
    for t in trees:
        _merge_into(out, t)
    return out


def _merge_into(dst: Dict, src: Dict) -> None:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _merge_into(dst[k], v)
        else:
            dst[k] = v


def param_count(params) -> int:
    import numpy as np

    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))


def cast_params(params: Dict, dtype=jnp.bfloat16) -> Dict:
    """Serving-time weight residency cast (float leaves only).

    Flax modules built with dtype=bfloat16 cast f32 params AT USE — the HBM
    read is still 4 bytes/weight every dispatch. Casting the stored tree once
    makes the resident copy 2 bytes/weight; modules that compute in f32
    upcast bf16 weights exactly, so the numerics match the at-use cast.
    This is the TPU analog of serving the reference model in fp16."""
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        params,
    )
