"""COCO-format dataset loading and episodic record construction.

Replaces the reference's registry plumbing (fewx/data/datasets/builtin.py:8-15
registering coco_2017_{train,val}_stone with extra_annotation_keys=['id']) and
the per-(image,class) episode splitting of fewx/data/build.py:27-108: every
training record carries ONE image and the annotations of ONE class in it, so
the episodic mapper can sample supports of that class.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple


@dataclass
class Annotation:
    id: int
    bbox: Tuple[float, float, float, float]  # xyxy
    category_id: int
    iscrowd: int = 0


@dataclass
class ImageRecord:
    file_name: str
    image_id: int
    height: int
    width: int
    annotations: List[Annotation] = field(default_factory=list)


def _xywh_to_xyxy(b):
    x, y, w, h = b
    return (x, y, x + w, y + h)


def load_coco_json(json_path: str, image_root: str) -> List[ImageRecord]:
    """Minimal COCO instances reader (replaces pycocotools + d2 loader)."""
    with open(json_path) as f:
        coco = json.load(f)
    images = {im["id"]: im for im in coco["images"]}
    recs: Dict[int, ImageRecord] = {
        iid: ImageRecord(
            file_name=os.path.join(image_root, im["file_name"]),
            image_id=iid,
            height=im["height"],
            width=im["width"],
        )
        for iid, im in images.items()
    }
    for ann in coco.get("annotations", []):
        r = recs.get(ann["image_id"])
        if r is None:
            continue
        r.annotations.append(
            Annotation(
                id=ann["id"],
                bbox=_xywh_to_xyxy(ann["bbox"]),
                category_id=ann["category_id"],
                iscrowd=ann.get("iscrowd", 0),
            )
        )
    return list(recs.values())


def split_per_class(records: Sequence[ImageRecord]) -> List[ImageRecord]:
    """One training record per (image, class) (fewx/data/build.py:58-90),
    dropping crowd annotations and images left with none."""
    out: List[ImageRecord] = []
    for rec in records:
        anns = [a for a in rec.annotations if not a.iscrowd]
        if not anns:
            continue
        by_cls: Dict[int, List[Annotation]] = {}
        for a in anns:
            by_cls.setdefault(a.category_id, []).append(a)
        for cls, cls_anns in by_cls.items():
            out.append(
                ImageRecord(
                    file_name=rec.file_name,
                    image_id=rec.image_id,
                    height=rec.height,
                    width=rec.width,
                    annotations=list(cls_anns),
                )
            )
    return out


@dataclass
class SupportEntry:
    """One row of the support index (the support-DataFrame analog:
    dataset_mapper.py:198-269 / 10_shot_support_df.pkl columns)."""

    id: int
    image_id: int
    category_id: int
    file_path: str  # path to the 240x240 support crop on disk
    support_box: Tuple[float, float, float, float]  # xyxy in crop coords


def save_support_index(path: str, entries: Sequence[SupportEntry]) -> None:
    with open(path, "w") as f:
        json.dump([e.__dict__ for e in entries], f)


def load_support_index(path: str) -> List[SupportEntry]:
    with open(path) as f:
        rows = json.load(f)
    return [SupportEntry(**{**r, "support_box": tuple(r["support_box"])}) for r in rows]


def build_support_crops(
    records: Sequence[ImageRecord],
    out_dir: str,
    crop_size: int = 240,
    context_ratio: float = 0.15,
    max_per_class: Optional[int] = None,
    seed: int = 0,
) -> List[SupportEntry]:
    """Generate per-annotation support crops (the offline artifact the
    reference assumes pre-exists as datasets/coco/*_support_df.pkl +
    support crop images; FewX's gen_support_pool tooling — not shipped in the
    reference repo — produced them). Each annotation becomes a square-ish
    context crop resized to crop_size x crop_size with the box mapped along.
    """
    import cv2
    import numpy as np

    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    entries: List[SupportEntry] = []
    per_class_count: Dict[int, int] = {}
    for rec in records:
        img = None
        for ann in rec.annotations:
            if ann.iscrowd:
                continue
            c = per_class_count.get(ann.category_id, 0)
            if max_per_class is not None and c >= max_per_class:
                continue
            if img is None:
                img = cv2.imread(rec.file_name)
                if img is None:
                    break
            x1, y1, x2, y2 = ann.bbox
            w, h = x2 - x1, y2 - y1
            pad_w, pad_h = w * context_ratio, h * context_ratio
            cx1 = max(0, int(x1 - pad_w))
            cy1 = max(0, int(y1 - pad_h))
            cx2 = min(rec.width, int(x2 + pad_w) + 1)
            cy2 = min(rec.height, int(y2 + pad_h) + 1)
            crop = img[cy1:cy2, cx1:cx2]
            if crop.size == 0:
                continue
            sy = crop_size / crop.shape[0]
            sx = crop_size / crop.shape[1]
            crop = cv2.resize(crop, (crop_size, crop_size), interpolation=cv2.INTER_LINEAR)
            box = (
                (x1 - cx1) * sx,
                (y1 - cy1) * sy,
                (x2 - cx1) * sx,
                (y2 - cy1) * sy,
            )
            fname = f"support_{ann.id}.jpg"
            cv2.imwrite(os.path.join(out_dir, fname), crop)
            entries.append(
                SupportEntry(
                    id=ann.id,
                    image_id=rec.image_id,
                    category_id=ann.category_id,
                    file_path=os.path.join(out_dir, fname),
                    support_box=box,
                )
            )
            per_class_count[ann.category_id] = c + 1
    return entries
