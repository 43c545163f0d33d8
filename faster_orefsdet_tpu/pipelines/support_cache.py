"""Support feature cache: the `support_feature.pkl` analog as device arrays.

The reference builds a per-class support cache on first eval/demo invocation
and then *exits the process* (fsod_cen.py:313-415, sys.exit at :408 — the
canonical flow runs eval twice). We keep the artifact and its amortization
(K-shot support encoding costs zero per query) but drop the exit-on-build
quirk: `build_support_cache` returns the cache and `save/load` persist it as
an .npz, so one invocation both builds and evals.

Cache contents per class (single class "ore" on the live path), mirroring the
pkl keys {'p3','p4','p5','rcnn_8','rcnn_4'} (fsod_cen.py:329,384-389):
  p3/p4/p5: shot-mean SM-refined (and spatially transposed) maps [S, S, C]
  rcnn_8/rcnn_4: shot-mean 8x8/4x4 multilevel ROI pools [P, P, C]
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models.detector import CenterNet2Detector
from ..ops.roi_align import multilevel_roi_align


class SupportCache(NamedTuple):
    p3: jnp.ndarray  # [32, 32, C] transposed shot-mean map
    p4: jnp.ndarray  # [16, 16, C]
    p5: jnp.ndarray  # [8, 8, C]
    rcnn_8: jnp.ndarray  # [8, 8, C] shot-mean ROI pool
    rcnn_4: jnp.ndarray  # [4, 4, C]


def build_support_cache(
    model: CenterNet2Detector,
    params,
    support_images: jnp.ndarray,
    support_boxes: jnp.ndarray,
    cfg: Config,
    batch_stats=None,
) -> SupportCache:
    """support_images: [K, Hs, Ws, 3] normalized, padded to ÷32 canvas
    (240px crops → 256); support_boxes: [K, 4] xyxy in crop coords.
    batch_stats: BN running stats for dla.norm="BN" models (eval mode)."""
    run = _cache_program(model, cfg, batch_stats is not None)
    return run(params, support_images, support_boxes, batch_stats)


@functools.lru_cache(maxsize=16)
def _cache_program(model, cfg: Config, has_stats: bool):
    """Memoized jitted cache-build program: repeated builds (e.g. the
    in-training --eval-period hook) must reuse one jit cache — a fresh
    closure per call forces a full retrace+recompile, minutes each through
    the axon remote-compile relay."""
    strides = [8, 16, 32]

    @jax.jit
    def run(params, imgs, boxes, batch_stats):
        variables = {"params": params}
        if has_stats:
            variables["batch_stats"] = batch_stats
        feats = model.apply(variables, imgs, method=model.features)
        refined = model.apply({"params": params}, feats, method=model.refine_support)
        mean_maps = {k: jnp.mean(v, axis=0) for k, v in refined.items()}

        def pool_all(size):
            def one(f3, f4, f5, b):
                return multilevel_roi_align(
                    [f3, f4, f5], b[None], strides, size,
                    cfg.roi.pooler_sampling_ratio, cfg.roi.canonical_box_size,
                    cfg.roi.canonical_level,
                )[0]

            return jax.vmap(one)(feats["p3"], feats["p4"], feats["p5"], boxes)

        r8 = pool_all(cfg.roi.pooler_resolution)
        r4 = pool_all(cfg.roi.pooler_resolution2)
        return SupportCache(
            p3=mean_maps["p3"],
            p4=mean_maps["p4"],
            p5=mean_maps["p5"],
            rcnn_8=jnp.mean(r8, axis=0),
            rcnn_4=jnp.mean(r4, axis=0),
        )

    return run


def save_support_cache(path: str, cache: SupportCache) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in cache._asdict().items()})


def load_support_cache(path: str) -> SupportCache:
    z = np.load(path)
    return SupportCache(**{k: jnp.asarray(z[k]) for k in SupportCache._fields})


def stack_support_caches(caches: "list[SupportCache]") -> SupportCache:
    """Stack per-class caches along a leading class axis → a multi-class
    cache ([C, ...] per field). The reference's support_dict is keyed by
    class id (fsod_cen.py:329-415); its eval loop over classes is broken
    (each iteration overwrites the attention maps, so only the LAST class is
    actually evaluated — fsod_cen.py:454-517). The multi-class query path in
    pipelines.inference evaluates every class and NMSes across them, which is
    the evident intent."""
    return SupportCache(*[jnp.stack([getattr(c, f) for c in caches])
                          for f in SupportCache._fields])
