"""Sampling & augmentation utilities from the CenterNet2 data stack.

Re-derivations of CenterNet2/centernet/data/ (SURVEY §2.3 — unused by the
ore pipeline but part of the framework's data capability surface):

  ClassAwareSampler        custom_dataset_dataloader ClassAwareSampler (:93):
                           infinite stream balancing classes by inverse
                           frequency (images drawn per-class round-robin).
  MultiDatasetSampler      (:178): mixes several datasets at fixed ratios.
  EfficientDetResizeCrop   transforms/custom_augmentation_impl.py (:27):
                           random scale jitter + crop to a square target.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Sequence, Tuple

import numpy as np

from .coco import ImageRecord


class ClassAwareSampler:
    """Infinite index stream; each draw picks a class (inverse-sqrt-frequency
    weighted) then a random image containing it."""

    def __init__(self, records: Sequence[ImageRecord], seed: int = 0):
        self.by_class: Dict[int, List[int]] = {}
        for i, r in enumerate(records):
            for a in r.annotations:
                self.by_class.setdefault(a.category_id, [])
                if not self.by_class[a.category_id] or self.by_class[a.category_id][-1] != i:
                    self.by_class[a.category_id].append(i)
        self.classes = sorted(self.by_class)
        counts = np.asarray([len(self.by_class[c]) for c in self.classes], np.float64)
        w = 1.0 / np.sqrt(counts)
        self.probs = w / w.sum()
        self.rng = np.random.default_rng(seed)

    def __iter__(self) -> Iterator[int]:
        while True:
            c = self.classes[self.rng.choice(len(self.classes), p=self.probs)]
            pool = self.by_class[c]
            yield pool[self.rng.integers(len(pool))]


class MultiDatasetSampler:
    """Infinite index stream over the concatenation of several datasets,
    drawing from dataset d with probability ratio[d]/sum(ratios)."""

    def __init__(self, sizes: Sequence[int], ratios: Sequence[float], seed: int = 0):
        assert len(sizes) == len(ratios)
        self.sizes = list(sizes)
        self.offsets = np.cumsum([0] + self.sizes[:-1])
        p = np.asarray(ratios, np.float64)
        self.probs = p / p.sum()
        self.rng = np.random.default_rng(seed)

    def __iter__(self) -> Iterator[int]:
        while True:
            d = self.rng.choice(len(self.sizes), p=self.probs)
            yield int(self.offsets[d] + self.rng.integers(self.sizes[d]))


def efficientdet_resize_crop(
    img: np.ndarray,
    boxes: np.ndarray,
    target_size: int,
    rng: np.random.Generator,
    scale_range: Tuple[float, float] = (0.1, 2.0),
) -> Tuple[np.ndarray, np.ndarray]:
    """EfficientDet-style train augmentation: sample a scale in
    scale_range * (target/long_side), resize, then take a random
    target_size x target_size crop (zero-padded if smaller). Boxes follow and
    are clipped; returns (canvas [T,T,3], boxes')."""
    import cv2

    h, w = img.shape[:2]
    scale = rng.uniform(*scale_range) * target_size / max(h, w)
    nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
    resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    b = boxes.astype(np.float32) * scale

    off_y = rng.integers(0, max(nh - target_size, 0) + 1)
    off_x = rng.integers(0, max(nw - target_size, 0) + 1)
    crop = resized[off_y : off_y + target_size, off_x : off_x + target_size]
    canvas = np.zeros((target_size, target_size, img.shape[2]), img.dtype)
    canvas[: crop.shape[0], : crop.shape[1]] = crop

    b = b - np.asarray([off_x, off_y, off_x, off_y], np.float32)
    b = np.clip(b, 0, target_size)
    return canvas, b
