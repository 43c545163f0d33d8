"""Device-side uint8 normalization == host normalize-then-pad (bit parity).

The mapper ships raw uint8 canvases and pipelines/train_step.prepare_batch
normalizes on device, re-zeroing the padding to match the reference's
normalize-first-pad-after order (fsod_cen.py:544-546). These tests pin
prepare_batch against the host reference path (pipelines/preprocess) and the
mapper's caching determinism.
"""

import dataclasses

import numpy as np

import jax.numpy as jnp

from faster_orefsdet_tpu.config import get_config
from faster_orefsdet_tpu.pipelines.preprocess import normalize, pad_to_canvas
from faster_orefsdet_tpu.pipelines.train_step import TrainBatch, prepare_batch


def _cfg():
    return get_config("finetune_vovnet")


def _batch(images, image_hw, support_images):
    b = images.shape[0]
    return TrainBatch(
        images=jnp.asarray(images),
        image_hw=jnp.asarray(image_hw, np.float32),
        gt_boxes=jnp.zeros((b, 4, 4)),
        gt_classes=jnp.zeros((b, 4), jnp.int32),
        gt_valid=jnp.zeros((b, 4), bool),
        support_images=jnp.asarray(support_images),
        support_boxes=jnp.zeros((b, support_images.shape[1], 4)),
    )


def test_uint8_prepare_matches_host_normalize():
    cfg = _cfg()
    rng = np.random.default_rng(0)
    resized = rng.integers(0, 256, (50, 80, 3), dtype=np.uint8)
    canvas_u8 = pad_to_canvas(resized, (64, 96))
    expected = pad_to_canvas(
        normalize(resized, cfg.input.pixel_mean, cfg.input.pixel_std), (64, 96)
    )

    cs = cfg.fs.support_crop_size
    sc = -(-cs // 32) * 32
    crop = rng.integers(0, 256, (cs, cs, 3), dtype=np.uint8)
    sup_u8 = pad_to_canvas(crop, (sc, sc))
    sup_expected = pad_to_canvas(
        normalize(crop, cfg.input.pixel_mean, cfg.input.pixel_std), (sc, sc)
    )

    out = prepare_batch(
        _batch(canvas_u8[None], [[50.0, 80.0]], sup_u8[None, None]), cfg
    )
    np.testing.assert_allclose(np.asarray(out.images[0]), expected, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.support_images[0, 0]), sup_expected, atol=1e-5
    )
    # padding region is exactly zero (reference pads AFTER normalizing)
    assert np.all(np.asarray(out.images[0, 50:]) == 0.0)
    assert np.all(np.asarray(out.images[0, :, 80:]) == 0.0)
    assert np.all(np.asarray(out.support_images[0, 0, cs:]) == 0.0)


def test_float_batch_passthrough():
    cfg = _cfg()
    rng = np.random.default_rng(1)
    imgs = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    sups = rng.standard_normal((1, 2, 32, 32, 3)).astype(np.float32)
    out = prepare_batch(_batch(imgs, [[32.0, 32.0]], sups), cfg)
    np.testing.assert_array_equal(np.asarray(out.images), imgs)
    np.testing.assert_array_equal(np.asarray(out.support_images), sups)


def test_mapper_uint8_and_cache_determinism(tmp_path):
    from faster_orefsdet_tpu.data.mapper import EpisodicMapper, SupportSampler
    from faster_orefsdet_tpu.data.synthetic import make_synthetic_setup

    cfg = _cfg()
    cfg = cfg.replace(input=dataclasses.replace(cfg.input, min_size_train=(128,)))
    records, entries = make_synthetic_setup(str(tmp_path), num_images=4, seed=0)
    mapper = EpisodicMapper(cfg, SupportSampler(entries), is_train=True,
                            canvas_hw=(128, 192))
    ex1 = mapper(records[0], np.random.default_rng(0))
    ex2 = mapper(records[0], np.random.default_rng(0))  # cache-hit path
    assert ex1.image.dtype == np.uint8
    assert ex1.support_images.dtype == np.uint8
    np.testing.assert_array_equal(ex1.image, ex2.image)
    np.testing.assert_array_equal(ex1.support_images, ex2.support_images)
    np.testing.assert_array_equal(ex1.support_boxes, ex2.support_boxes)


def test_train_canvas_tight(tmp_path):
    """Dataset-derived canvas (loader.train_canvas) covers every scale choice
    but is far tighter than the config-only worst case (max_size_train)."""
    from faster_orefsdet_tpu.data.loader import train_canvas
    from faster_orefsdet_tpu.data.synthetic import make_synthetic_setup
    from faster_orefsdet_tpu.pipelines.preprocess import resize_shortest_edge_size

    cfg = _cfg()
    records, _ = make_synthetic_setup(str(tmp_path), num_images=4, seed=0)
    ch, cw = train_canvas(records, cfg)
    assert ch % 32 == 0 and cw % 32 == 0
    for rec in records:
        for short in cfg.input.min_size_train:
            nh, nw = resize_shortest_edge_size(
                rec.height, rec.width, short, cfg.input.max_size_train
            )
            assert min(nh, nw) <= ch and max(nh, nw) <= cw
    # tighter than the config-only default long side unless aspect is extreme
    assert cw <= cfg.input.max_size_train


def test_collate_device_support_cache(tmp_path):
    """Recurring support stacks come back as the SAME device buffer (no
    re-upload) and equal the uncached collate result."""
    from faster_orefsdet_tpu.data.loader import collate
    from faster_orefsdet_tpu.data.mapper import EpisodicMapper, SupportSampler
    from faster_orefsdet_tpu.data.synthetic import make_synthetic_setup

    cfg = _cfg()
    cfg = cfg.replace(input=dataclasses.replace(cfg.input, min_size_train=(128,)))
    records, entries = make_synthetic_setup(str(tmp_path), num_images=4, seed=0)
    mapper = EpisodicMapper(cfg, SupportSampler(entries), is_train=True,
                            canvas_hw=(128, 192))
    ex = mapper(records[0], np.random.default_rng(0))
    cache = {}
    b1 = collate([ex], device_sup_cache=cache)
    b2 = collate([ex], device_sup_cache=cache)
    assert ex.support_key in cache and len(cache) == 1
    np.testing.assert_array_equal(
        np.asarray(b1.support_images), np.asarray(collate([ex]).support_images)
    )
    np.testing.assert_array_equal(
        np.asarray(b1.support_images), np.asarray(b2.support_images)
    )
