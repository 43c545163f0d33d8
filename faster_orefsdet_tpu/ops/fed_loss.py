"""Federated-loss class sampling + sigmoid-CE classification options.

Re-derivation of CenterNet2/centernet/modeling/roi_heads/fed_loss.py:1-30 and
CustomFastRCNNOutputLayers.sigmoid_cross_entropy_loss (custom_fast_rcnn.py:
86-113). Off in every shipped ore config (USE_SIGMOID_CE / USE_FED_LOSS
false) but part of the predictor's capability surface for multi-class use.

Static-shape design: instead of torch.multinomial over non-appeared classes,
we sample a fixed `num_sample_cats`-sized class set via Gumbel top-k with
appeared classes forced in — same distribution family, fixed shapes.
"""

from __future__ import annotations

import json
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def load_class_freq(path: str, freq_weight: float = 0.5) -> jnp.ndarray:
    """[C] image-count^freq_weight per class (sorted by category id)."""
    with open(path) as f:
        cat_info = json.load(f)
    counts = np.asarray(
        [c["image_count"] for c in sorted(cat_info, key=lambda x: x["id"])],
        np.float32,
    )
    return jnp.asarray(counts**freq_weight)


def fed_loss_class_mask(
    rng: jax.Array,
    gt_classes: jnp.ndarray,
    num_classes: int,
    num_sample_cats: int = 50,
    weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """[C] 0/1 mask of classes participating in the federated loss:
    all appeared classes + weighted random extras up to num_sample_cats."""
    c = num_classes
    appeared = jnp.zeros((c + 1,), bool).at[jnp.clip(gt_classes, 0, c)].set(True)
    appeared = appeared[:c]
    w = jnp.ones((c,)) if weight is None else weight
    # Gumbel top-k sampling of non-appeared classes, appeared forced first
    g = -jnp.log(-jnp.log(jax.random.uniform(rng, (c,)) + 1e-20) + 1e-20)
    score = jnp.where(appeared, jnp.inf, jnp.log(jnp.maximum(w, 1e-12)) + g)
    k = min(num_sample_cats, c)
    rank = jnp.argsort(jnp.argsort(-score))
    return (rank < k) | appeared


def sigmoid_cross_entropy_loss(
    scores: jnp.ndarray,
    gt_classes: jnp.ndarray,
    valid: jnp.ndarray,
    class_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """CustomFastRCNNOutputLayers.sigmoid_cross_entropy_loss: BCE over the C
    foreground columns (background = all-zero target), summed and divided by
    the number of rows; optional fed-loss class mask."""
    b = scores.shape[0]
    c = scores.shape[1] - 1
    fg_scores = scores[:, :c]
    target = jax.nn.one_hot(gt_classes, c + 1)[:, :c]
    loss = (
        jnp.maximum(fg_scores, 0)
        - fg_scores * target
        + jnp.log1p(jnp.exp(-jnp.abs(fg_scores)))
    )
    if class_mask is not None:
        loss = loss * class_mask[None, :].astype(loss.dtype)
    loss = jnp.where(valid[:, None], loss, 0.0)
    return jnp.sum(loss) / jnp.maximum(jnp.sum(valid), 1)
