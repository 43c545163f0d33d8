"""Aspect-ratio grouping: mixed-orientation datasets batch per orientation."""

import dataclasses
import os

import numpy as np
import pytest

from faster_orefsdet_tpu.config import get_config
from faster_orefsdet_tpu.data.loader import train_loader
from faster_orefsdet_tpu.data.mapper import EpisodicMapper, SupportSampler
from faster_orefsdet_tpu.data.synthetic import generate_ore_dataset, make_synthetic_setup
from faster_orefsdet_tpu.data.coco import build_support_crops, load_coco_json, split_per_class


def test_mixed_orientation_batches(tmp_path):
    # landscape + portrait synthetic sets
    jp1, ir1 = generate_ore_dataset(str(tmp_path / "l"), num_images=4,
                                    image_hw=(120, 200), seed=0)
    jp2, ir2 = generate_ore_dataset(str(tmp_path / "p"), num_images=4,
                                    image_hw=(200, 120), seed=1)
    recs = load_coco_json(jp1, ir1) + load_coco_json(jp2, ir2)
    # re-id to avoid collisions across the two sets
    for i, r in enumerate(recs):
        r.image_id = i + 1
        for j, a in enumerate(r.annotations):
            a.id = i * 100 + j + 1
    entries = build_support_crops(recs, str(tmp_path / "sup"), crop_size=96)

    cfg = get_config("finetune_vovnet")
    cfg = cfg.replace(
        fs=dataclasses.replace(cfg.fs, support_shot=2, support_crop_size=96),
        input=dataclasses.replace(cfg.input, min_size_train=(96,), max_size_train=160),
        static=dataclasses.replace(cfg.static, max_gt_per_image=8),
    )
    mapper = EpisodicMapper(cfg, SupportSampler(entries), is_train=True)
    loader = train_loader(split_per_class(recs), mapper, batch_size=2, seed=0)
    shapes = set()
    for _ in range(4):
        b = next(loader)
        shapes.add(tuple(b.images.shape[1:3]))
        # every image in a batch shares the canvas
        assert b.images.shape[0] == 2
    # both orientations appear across batches
    assert len(shapes) == 2
    hs = {s[0] for s in shapes}
    assert len(hs) == 2


def test_canvas_and_device_caches_preserve_stream(tmp_path):
    """The (file, scale, flip) canvas cache and the device-resident canvas
    memo must not change the episode stream: cached and uncached mappers
    yield identical batches across repeat epochs (where the cache hits)."""
    import jax.numpy as jnp

    from faster_orefsdet_tpu.data.loader import collate

    jp, ir = generate_ore_dataset(str(tmp_path / "d"), num_images=3,
                                  image_hw=(120, 200), seed=0)
    recs = load_coco_json(jp, ir)
    entries = build_support_crops(recs, str(tmp_path / "sup"), crop_size=96)
    cfg = get_config("finetune_vovnet")
    cfg = cfg.replace(
        fs=dataclasses.replace(cfg.fs, support_shot=2, support_crop_size=96),
        input=dataclasses.replace(
            cfg.input, min_size_train=(96, 112), max_size_train=160
        ),
        static=dataclasses.replace(cfg.static, max_gt_per_image=8),
    )
    records = split_per_class(recs)

    cached = EpisodicMapper(cfg, SupportSampler(entries), is_train=True)
    uncached = EpisodicMapper(cfg, SupportSampler(entries), is_train=True,
                              cache_bytes=0)
    rng_a = np.random.default_rng(5)
    rng_b = np.random.default_rng(5)
    exs_a, exs_b = [], []
    for _ in range(3):  # 3 epochs -> cache hits on epochs 2-3
        for r in records:
            exs_a.append(cached(r, rng_a))
            exs_b.append(uncached(r, rng_b))
    for a, b in zip(exs_a, exs_b):
        np.testing.assert_array_equal(a.image, b.image)
        np.testing.assert_array_equal(a.gt_boxes, b.gt_boxes)
        np.testing.assert_array_equal(a.support_images, b.support_images)
        assert a.image_hw == b.image_hw
        assert a.image_key is not None

    # device-resident canvas memo: identical TrainBatch, arrays reused
    group = [e for e in exs_a if e.image.shape == exs_a[0].image.shape][:2]
    dev_img, dev_sup = {}, {}
    b1 = collate(group, device_sup_cache=dev_sup, device_img_cache=dev_img)
    b2 = collate(group, device_sup_cache=dev_sup, device_img_cache=dev_img)
    b0 = collate(group)
    np.testing.assert_array_equal(np.asarray(b1.images), np.asarray(b0.images))
    np.testing.assert_array_equal(np.asarray(b2.images), np.asarray(b0.images))
    np.testing.assert_array_equal(
        np.asarray(b1.support_images), np.asarray(b0.support_images)
    )
    assert len(dev_img) == len({e.image_key for e in group})
