"""CN2 data-utility tests: class-aware / multi-dataset samplers, ED crop."""

import itertools

import numpy as np

from faster_orefsdet_tpu.data.coco import Annotation, ImageRecord
from faster_orefsdet_tpu.data.samplers import (
    ClassAwareSampler,
    MultiDatasetSampler,
    efficientdet_resize_crop,
)


def _rec(i, classes):
    return ImageRecord(
        file_name=f"{i}.jpg", image_id=i, height=100, width=100,
        annotations=[Annotation(id=i * 10 + j, bbox=(0, 0, 10, 10), category_id=c)
                     for j, c in enumerate(classes)],
    )


def test_class_aware_sampler_balances():
    # class 1: 20 images; class 2: 2 images → rare class oversampled
    records = [_rec(i, [1]) for i in range(20)] + [_rec(100 + i, [2]) for i in range(2)]
    s = ClassAwareSampler(records, seed=0)
    draws = list(itertools.islice(iter(s), 3000))
    rare = sum(1 for d in draws if d >= 20)
    # inverse-sqrt weighting: p(rare class) = sqrt(20)/(sqrt(20)+sqrt(2)) ≈ 0.76
    assert 0.6 < rare / len(draws) < 0.9


def test_multi_dataset_sampler_ratios():
    s = MultiDatasetSampler([10, 100], [3.0, 1.0], seed=0)
    draws = list(itertools.islice(iter(s), 4000))
    from_first = sum(1 for d in draws if d < 10)
    assert 0.65 < from_first / len(draws) < 0.85
    assert max(draws) < 110 and min(draws) >= 0


def test_efficientdet_resize_crop():
    rng = np.random.default_rng(0)
    img = np.full((80, 120, 3), 128, np.uint8)
    boxes = np.asarray([[10.0, 10, 50, 40]])
    canvas, b = efficientdet_resize_crop(img, boxes, 64, rng, scale_range=(0.5, 1.5))
    assert canvas.shape == (64, 64, 3)
    assert b.shape == (1, 4)
    assert (b >= 0).all() and (b <= 64).all()
