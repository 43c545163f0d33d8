"""Training/eval data loaders producing fixed-shape numpy batches.

Replaces d2's worker-process pipeline (build_batch_data_loader, MapDataset,
TrainingSampler — detectron2.7z!data/) with a simple host iterator: the
reference's 8-worker torch DataLoader feeds a GPU step; on TPU the jitted
step dominates and a single-process prefetching iterator keeps up (image
decode is the only host cost; cv2 is native).

Train: infinite shuffled stream over per-(image,class) records
(TrainingSampler semantics). Eval: one pass, batch size 1 (the reference's
inference protocol, fewx/data/build.py:162-203).
"""

from __future__ import annotations

import threading
from queue import Queue
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from ..config import Config
from ..pipelines.preprocess import resize_shortest_edge_size
from ..pipelines.train_step import TrainBatch
from .coco import ImageRecord
from .mapper import EpisodicMapper, MappedExample


def _device_memo(examples, key_attr, val_attr, cache: dict, cache_max: int):
    """Gather per-example arrays through a bounded {key: device_array} memo
    (FIFO eviction); returns the stacked device batch."""
    arrs = []
    for e in examples:
        key = getattr(e, key_attr)
        arr = cache.get(key)
        if arr is None:
            if len(cache) >= cache_max:
                cache.pop(next(iter(cache)))
            arr = jnp.asarray(getattr(e, val_attr))
            cache[key] = arr
        arrs.append(arr)
    return jnp.stack(arrs) if len(arrs) > 1 else arrs[0][None]


def collate(
    examples: Sequence[MappedExample], device_sup_cache: Optional[dict] = None,
    device_sup_cache_max: int = 256, device_img_cache: Optional[dict] = None,
    device_img_cache_max: int = 256,
) -> TrainBatch:
    """Stack examples into a fixed-shape TrainBatch (raw uint8 images —
    normalization runs inside the jitted step, train_step.prepare_batch).

    device_sup_cache: optional {support_key: device_array} memo. Support
    stacks are deterministic per record (mapper seeding), so recurring
    epochs re-upload the same ~1 MB stack every step; keeping them resident
    on device turns that into a device-side stack (no host->device bytes —
    the dominant per-step transfer on a relayed TPU link).
    device_img_cache: the same memo for query canvases, keyed by the
    mapper's (file, scale, flip) image_key — at B=8 the 8 canvas uploads
    per step were the remaining transfer cost."""
    if device_sup_cache is not None and all(
        e.support_key is not None for e in examples
    ):
        support_images = _device_memo(
            examples, "support_key", "support_images",
            device_sup_cache, device_sup_cache_max,
        )
    else:
        support_images = jnp.asarray(np.stack([e.support_images for e in examples]))
    if device_img_cache is not None and all(
        e.image_key is not None for e in examples
    ):
        images = _device_memo(
            examples, "image_key", "image",
            device_img_cache, device_img_cache_max,
        )
    else:
        images = jnp.asarray(np.stack([e.image for e in examples]))
    return TrainBatch(
        images=images,
        image_hw=jnp.asarray(
            np.asarray([e.image_hw for e in examples], np.float32)
        ),
        gt_boxes=jnp.asarray(np.stack([e.gt_boxes for e in examples])),
        gt_classes=jnp.asarray(np.stack([e.gt_classes for e in examples])),
        gt_valid=jnp.asarray(np.stack([e.gt_valid for e in examples])),
        support_images=support_images,
        support_boxes=jnp.asarray(np.stack([e.support_boxes for e in examples])),
    )


def train_loader(
    records: Sequence[ImageRecord],
    mapper: EpisodicMapper,
    batch_size: int,
    seed: int = 0,
    prefetch: int = 4,
) -> Iterator[TrainBatch]:
    """Infinite shuffled episodic stream with background prefetch.

    Batches are grouped by canvas shape — landscape vs portrait — mirroring
    d2's AspectRatioGroupedDataset (detectron2.7z!data/common.py; the reason
    the reference groups by aspect ratio is exactly that mixed orientations
    can't share a batch tensor)."""
    rng = np.random.default_rng(seed)
    dev_sup: dict = {}
    dev_img: dict = {}

    def produce(q: Queue):
        buckets = {}
        while True:
            order = rng.permutation(len(records))
            for i in order:
                ex = mapper(records[int(i)], rng)
                key = ex.image.shape[:2]
                buckets.setdefault(key, []).append(ex)
                if len(buckets[key]) == batch_size:
                    q.put(collate(buckets.pop(key), device_sup_cache=dev_sup,
                                  device_img_cache=dev_img))

    q: Queue = Queue(maxsize=prefetch)
    t = threading.Thread(target=produce, args=(q,), daemon=True)
    t.start()
    while True:
        yield q.get()


def eval_loader(
    records: Sequence[ImageRecord],
    cfg: Config,
    canvas_hw: Optional[Tuple[int, int]] = None,
    raw_uint8: bool = False,
):
    """One pass over eval records → (record, canvas_image, (newh, neww),
    scale_hw). Batch 1, matching the reference protocol.

    raw_uint8: yield UN-normalized uint8 canvases as host numpy (4x less
    transfer; the batched inference fn normalizes on device)."""
    import cv2

    from ..pipelines.preprocess import (
        pad_to_canvas,
        preprocess_host,
        resize_image_host,
    )

    for rec in records:
        img = cv2.imread(rec.file_name)
        if img is None:
            continue
        if canvas_hw is None:
            nh, nw = resize_shortest_edge_size(
                img.shape[0], img.shape[1], cfg.input.min_size_test, cfg.input.max_size_test
            )
            d = cfg.input.size_divisibility
            chw = (-(-nh // d) * d, -(-nw // d) * d)
        else:
            chw = canvas_hw
        if raw_uint8:
            h, w = img.shape[:2]
            newh, neww = resize_shortest_edge_size(
                h, w, cfg.input.min_size_test, cfg.input.max_size_test
            )
            canvas = pad_to_canvas(
                np.ascontiguousarray(resize_image_host(img, newh, neww), np.uint8),
                chw,
            )
            yield rec, canvas, (newh, neww), (h / newh, w / neww)
            continue
        canvas, (newh, neww), scale = preprocess_host(
            img,
            cfg.input.min_size_test,
            cfg.input.max_size_test,
            chw,
            cfg.input.pixel_mean,
            cfg.input.pixel_std,
        )
        yield rec, jnp.asarray(canvas), (newh, neww), scale


def train_canvas(records: Sequence[ImageRecord], cfg: Config) -> Tuple[int, int]:
    """Tight worst-case training canvas (short_side, long_side) over the
    dataset x all train scales, ceil-32.

    The mapper's config-only default must assume the long side can reach
    max_size_train (1333); real datasets have bounded aspect ratios, so
    deriving the canvas from the records can shrink the padded area (and
    device FLOPs per step) severalfold. Orientation is still chosen per
    image; the loader groups batches by canvas shape."""
    d = cfg.input.size_divisibility
    ms, ml = d, d
    for rec in records:
        for short in cfg.input.min_size_train:
            nh, nw = resize_shortest_edge_size(
                rec.height, rec.width, short, cfg.input.max_size_train
            )
            ms, ml = max(ms, min(nh, nw)), max(ml, max(nh, nw))
    return (-(-ms // d) * d, -(-ml // d) * d)


def eval_canvas(records: Sequence[ImageRecord], cfg: Config) -> Tuple[int, int]:
    """One canvas covering every eval image at test scale (single jit cache)."""
    d = cfg.input.size_divisibility
    mh = mw = d
    for rec in records:
        nh, nw = resize_shortest_edge_size(
            rec.height, rec.width, cfg.input.min_size_test, cfg.input.max_size_test
        )
        mh, mw = max(mh, nh), max(mw, nw)
    return (-(-mh // d) * d, -(-mw // d) * d)
