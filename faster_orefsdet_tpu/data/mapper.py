"""Episodic dataset mapper: query transforms + K-shot support sampling.

Re-derivation of fewx/data/dataset_mapper.py:22-269 (DatasetMapperWithSupport):
for each per-(image,class) query record, sample way x shot support crops of
the query's class — excluding the query image itself and never reusing an
annotation or image (:211-227) — deterministically seeded by the query's
first annotation id (pandas sample(random_state=id), :223). Query gets
multi-scale resize-shortest-edge + random flip.

TPU divergence from the reference's 8-worker torch pipeline: the mapper
emits RAW uint8 canvases (zero-padded) and defers normalization to the
jitted train step (pipelines/train_step.prepare_batch) — 4x less
host->device traffic and zero host float math. Decoded images and the
per-record support stacks (deterministic by construction: the sample seed
is the query's annotation id) are cached in RAM up to `cache_bytes`.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import Config
from .coco import ImageRecord, SupportEntry


class SupportSampler:
    """Deterministic support sampling over the support index."""

    def __init__(self, entries: Sequence[SupportEntry]):
        self.entries = list(entries)
        self.by_class: Dict[int, List[SupportEntry]] = {}
        for e in self.entries:
            self.by_class.setdefault(e.category_id, []).append(e)
        # stable order for determinism
        for v in self.by_class.values():
            v.sort(key=lambda e: e.id)

    def classes(self) -> List[int]:
        return sorted(self.by_class)

    def sample(
        self,
        query_class: int,
        query_image_id: int,
        used_ann_ids: Sequence[int],
        way: int,
        shot: int,
        seed: int,
    ) -> List[SupportEntry]:
        """Sample way*shot entries: `shot` of the query class first (positive
        way), then `shot` of each other sampled class. Exclusion rules match
        dataset_mapper.py:211-267: skip the query image, never reuse an
        annotation id or image id."""
        rng = np.random.default_rng(seed)
        used_imgs = {query_image_id}
        used_ids = set(used_ann_ids)
        used_classes = {query_class}
        out: List[SupportEntry] = []

        def draw(cls):
            pool = [
                e
                for e in self.by_class.get(cls, [])
                if e.image_id not in used_imgs and e.id not in used_ids
            ]
            if not pool:
                # fall back to relaxing the image exclusion (tiny datasets)
                pool = [e for e in self.by_class.get(cls, []) if e.id not in used_ids]
            if not pool:
                pool = self.by_class[cls]
            e = pool[rng.integers(len(pool))]
            used_imgs.add(e.image_id)
            used_ids.add(e.id)
            return e

        for _ in range(shot):
            out.append(draw(query_class))
        for _ in range(way - 1):
            candidates = [c for c in self.by_class if c not in used_classes]
            if not candidates:
                break
            other = candidates[int(rng.integers(len(candidates)))]
            used_classes.add(other)
            for _ in range(shot):
                out.append(draw(other))
        return out


class _ByteBudgetCache:
    """Insertion-order (FIFO) byte-budgeted cache of numpy arrays / tuples."""

    def __init__(self, max_bytes: int):
        self.max_bytes = max_bytes
        self._data: Dict = {}
        self._bytes = 0

    @staticmethod
    def _nbytes(value) -> int:
        if isinstance(value, np.ndarray):
            return value.nbytes
        return sum(v.nbytes for v in value if isinstance(v, np.ndarray))

    def get(self, key):
        return self._data.get(key)

    def put(self, key, value):
        if key in self._data:
            return
        n = self._nbytes(value)
        if n > self.max_bytes:
            return
        while self._bytes + n > self.max_bytes and self._data:
            old = self._data.pop(next(iter(self._data)))
            self._bytes -= self._nbytes(old)
        self._data[key] = value
        self._bytes += n


@dataclasses.dataclass
class MappedExample:
    """Fixed-shape numpy tensors for one training example."""

    image: np.ndarray  # [Hc, Wc, 3] raw uint8, zero-padded (normalize on device)
    image_hw: Tuple[int, int]
    gt_boxes: np.ndarray  # [N, 4]
    gt_classes: np.ndarray  # [N]
    gt_valid: np.ndarray  # [N]
    support_images: np.ndarray  # [S, hs, ws, 3] raw uint8, zero-padded
    support_boxes: np.ndarray  # [S, 4]
    support_classes: np.ndarray  # [S] 0 = positive way (mapper :238,266)
    # stable identity of the (deterministic) support stack — lets the loader
    # keep recurring stacks resident on device instead of re-uploading
    support_key: Optional[Tuple[int, int]] = None
    # stable identity of the query canvas: (file, chosen scale, flip). The
    # canvas is a pure function of that key, so recurring epochs can reuse
    # both the host render (mapper._canvas_cache) and a device-resident copy
    # (loader.collate device_img_cache)
    image_key: Optional[Tuple] = None


class EpisodicMapper:
    def __init__(self, cfg: Config, sampler: SupportSampler, is_train: bool = True,
                 canvas_hw: Optional[Tuple[int, int]] = None,
                 cache_bytes: int = 1 << 30):
        self.cfg = cfg
        self.sampler = sampler
        self.is_train = is_train
        # decoded-image + per-record support-stack caches (support stacks are
        # deterministic: sampling is seeded by the query's annotation id)
        self._img_cache = _ByteBudgetCache(cache_bytes)
        self._sup_cache = _ByteBudgetCache(cache_bytes // 2)
        # rendered episode canvases keyed (file, scale, flip): a dataset of
        # N images x |min_size_train| scales x 2 flips has a small finite
        # canvas set, and re-rendering it every epoch was the B=8 wall-clock
        # bottleneck on the 1-core host (the job the reference gives its
        # 8 dataloader workers, Base-FSOD-C4.yaml:20)
        self._canvas_cache = _ByteBudgetCache(cache_bytes // 2)
        inp = cfg.input
        if canvas_hw is None:
            # worst-case canvas from the config: short side up to
            # max(min_size_train), long side capped at max_size_train.
            # Orientation is chosen per image (landscape vs portrait) and the
            # loader groups batches by canvas shape — the fixed-shape
            # equivalent of d2's AspectRatioGroupedDataset (SURVEY §2.2).
            # Callers with known aspect bounds should pass a tighter canvas.
            short = max(inp.min_size_train) if is_train else inp.min_size_test
            long = inp.max_size_train if is_train else inp.max_size_test
            d = inp.size_divisibility
            canvas_hw = (-(-short // d) * d, -(-long // d) * d)
        self.canvas_hw = canvas_hw
        cs = cfg.fs.support_crop_size
        self.support_canvas = (-(-cs // 32) * 32, -(-cs // 32) * 32)  # 240→256

    def _read(self, path: str) -> np.ndarray:
        img = self._img_cache.get(path)
        if img is None:
            import cv2

            img = cv2.imread(path)  # BGR, matching INPUT.FORMAT
            assert img is not None, path
            self._img_cache.put(path, img)
        return img

    def __call__(self, record: ImageRecord, rng: np.random.Generator) -> MappedExample:
        from ..pipelines.preprocess import (
            pad_to_canvas,
            resize_image_host,
            resize_shortest_edge_size,
        )

        cfg = self.cfg
        img = self._read(record.file_name)
        h, w = img.shape[:2]

        if self.is_train:
            short = int(rng.choice(cfg.input.min_size_train))
        else:
            short = cfg.input.min_size_test
        max_size = cfg.input.max_size_train if self.is_train else cfg.input.max_size_test
        newh, neww = resize_shortest_edge_size(h, w, short, max_size)

        boxes = np.asarray([a.bbox for a in record.annotations], np.float32).reshape(-1, 4)
        boxes = boxes * np.asarray([neww / w, newh / h, neww / w, newh / h], np.float32)

        flip = self.is_train and cfg.input.random_flip and rng.uniform() < 0.5
        if flip:
            x1 = neww - boxes[:, 2]
            x2 = neww - boxes[:, 0]
            boxes = np.stack([x1, boxes[:, 1], x2, boxes[:, 3]], axis=1)

        # the rendered canvas is a pure function of (file, scale, flip) —
        # reuse it across epochs; only the (cheap) box transform above runs
        # per record (records split per (image, class) share a file)
        image_key = (record.file_name, short, flip)
        canvas = self._canvas_cache.get(image_key)
        if canvas is None:
            resized = resize_image_host(img, newh, neww)
            if flip:
                resized = resized[:, ::-1]
            # orient the canvas to the image (landscape vs portrait); the
            # loader groups batches by canvas shape (aspect-ratio grouping)
            ch, cw = self.canvas_hw
            canvas_hw = (ch, cw) if neww >= newh else (cw, ch)
            canvas = pad_to_canvas(np.ascontiguousarray(resized, np.uint8), canvas_hw)
            # the cached array is SHARED across every example that hits this
            # key — freeze it so an accidental in-place edit fails loudly
            canvas.flags.writeable = False
            self._canvas_cache.put(image_key, canvas)

        n_max = cfg.static.max_gt_per_image
        gt_boxes = np.zeros((n_max, 4), np.float32)
        gt_classes = np.zeros((n_max,), np.int32)
        gt_valid = np.zeros((n_max,), bool)
        n = min(len(boxes), n_max)
        gt_boxes[:n] = boxes[:n]
        gt_valid[:n] = True

        # ---- supports (deterministic per-annotation-id seed, :223) — the
        # whole stack is a pure function of the record, so it caches exactly
        sup_key = (record.image_id, record.annotations[0].id if record.annotations else -1)
        cached = self._sup_cache.get(sup_key)
        if cached is not None:
            sup_imgs, sup_boxes, sup_classes = cached
        else:
            import cv2

            way, shot = cfg.fs.support_way, cfg.fs.support_shot
            seed = record.annotations[0].id if record.annotations else record.image_id
            entries = self.sampler.sample(
                record.annotations[0].category_id if record.annotations else 0,
                record.image_id,
                [a.id for a in record.annotations],
                way,
                shot,
                seed,
            )
            s = way * shot
            cs = cfg.fs.support_crop_size
            sup_imgs = np.zeros((s, *self.support_canvas, 3), np.uint8)
            sup_boxes = np.zeros((s, 4), np.float32)
            sup_classes = np.zeros((s,), np.int32)
            for i, e in enumerate(entries[:s]):
                crop = self._read(e.file_path)
                if crop.shape[:2] != (cs, cs):
                    crop = cv2.resize(crop, (cs, cs))
                sup_imgs[i, :cs, :cs] = crop
                sup_boxes[i] = e.support_box
                sup_classes[i] = 0 if i < shot else 1
            self._sup_cache.put(sup_key, (sup_imgs, sup_boxes, sup_classes))
        return MappedExample(
            image=canvas,
            image_hw=(newh, neww),
            gt_boxes=gt_boxes,
            gt_classes=gt_classes,
            gt_valid=gt_valid,
            support_images=sup_imgs,
            support_boxes=sup_boxes,
            support_classes=sup_classes,
            support_key=sup_key,
            image_key=image_key,
        )
