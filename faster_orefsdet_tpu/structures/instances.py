"""Fixed-capacity, mask-valid containers replacing detectron2 `Instances`.

detectron2's Instances (detectron2.7z!structures/instances.py) is a dynamic
bag of per-instance fields; under XLA we need static shapes, so every
container here carries a fixed capacity K with a boolean/float validity mask.
Invalid slots hold zeros and must be masked out by consumers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Proposals(NamedTuple):
    """Fixed-K proposals for one image (or batched with a leading axis).

    boxes:  [K, 4] xyxy in padded-canvas coordinates
    scores: [K]    objectness (sqrt of heatmap product for CenterNet proposals)
    valid:  [K]    bool mask
    """

    boxes: jnp.ndarray
    scores: jnp.ndarray
    valid: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.boxes.shape[-2]


class Detections(NamedTuple):
    """Final fixed-K detections for one image.

    boxes:   [K, 4] xyxy (coordinates in the resized input frame unless
             rescaled by pipelines.inference.postprocess)
    scores:  [K]
    classes: [K] int32
    valid:   [K] bool
    """

    boxes: jnp.ndarray
    scores: jnp.ndarray
    classes: jnp.ndarray
    valid: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.boxes.shape[-2]


class GroundTruth(NamedTuple):
    """Fixed-N padded ground-truth instances for one image.

    boxes:   [N, 4] xyxy in the resized/padded input frame
    classes: [N] int32 (forced to 0 on the live single-class path,
             fsod_cen.py:157-159)
    valid:   [N] bool
    """

    boxes: jnp.ndarray
    classes: jnp.ndarray
    valid: jnp.ndarray

    @staticmethod
    def pad(boxes, classes, capacity: int) -> "GroundTruth":
        import numpy as np

        n = min(len(boxes), capacity)
        b = np.zeros((capacity, 4), dtype=np.float32)
        c = np.zeros((capacity,), dtype=np.int32)
        v = np.zeros((capacity,), dtype=bool)
        if n:
            b[:n] = np.asarray(boxes, dtype=np.float32)[:n]
            c[:n] = np.asarray(classes, dtype=np.int32)[:n]
            v[:n] = True
        return GroundTruth(jnp.asarray(b), jnp.asarray(c), jnp.asarray(v))
