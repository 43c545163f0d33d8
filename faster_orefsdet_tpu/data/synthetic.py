"""Synthetic ore-like dataset for end-to-end tests and demos.

The reference repo ships neither the Orev1 dataset nor weights, so the test
pyramid (SURVEY.md §4/§7) exercises the full train → support-cache → eval →
COCO-AP loop on generated data: gray rock-textured canvases with elliptical
"ore" blobs whose bounding boxes are the ground truth. An overfit-able micro
dataset also serves as the training convergence test.
"""

from __future__ import annotations

import json
import os
from typing import List, Tuple

import numpy as np

from .coco import ImageRecord, SupportEntry, build_support_crops, load_coco_json


def generate_ore_dataset(
    out_dir: str,
    num_images: int = 20,
    image_hw: Tuple[int, int] = (240, 320),
    max_blobs: int = 6,
    seed: int = 0,
    min_blobs: int = 1,
    blob_size: Tuple[float, float] = (28.0, 90.0),
) -> Tuple[str, str]:
    """Write images + a COCO instances json. Returns (json_path, image_root)."""
    import cv2

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(out_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    h, w = image_hw
    images, annotations = [], []
    ann_id = 1
    for i in range(num_images):
        # rocky background: low-frequency noise
        base = rng.normal(110, 12, (h // 8, w // 8, 3)).astype(np.float32)
        img = cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)
        img += rng.normal(0, 6, img.shape)
        n = int(rng.integers(min_blobs, max_blobs + 1))
        for _ in range(n):
            bw = float(rng.uniform(*blob_size))
            bh = float(rng.uniform(*blob_size))
            cx = float(rng.uniform(bw / 2 + 2, w - bw / 2 - 2))
            cy = float(rng.uniform(bh / 2 + 2, h - bh / 2 - 2))
            shade = float(rng.uniform(35, 75))
            angle = float(rng.uniform(0, 180))
            cv2.ellipse(
                img,
                ((cx, cy), (bw, bh), angle),
                (shade, shade, shade + rng.uniform(-8, 8)),
                thickness=-1,
            )
            # bbox of the rotated ellipse
            t = np.deg2rad(angle)
            ex = np.sqrt((bw / 2 * np.cos(t)) ** 2 + (bh / 2 * np.sin(t)) ** 2)
            ey = np.sqrt((bw / 2 * np.sin(t)) ** 2 + (bh / 2 * np.cos(t)) ** 2)
            x1, y1 = max(0.0, cx - ex), max(0.0, cy - ey)
            x2, y2 = min(float(w), cx + ex), min(float(h), cy + ey)
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": i + 1,
                    "category_id": 1,
                    "bbox": [x1, y1, x2 - x1, y2 - y1],
                    "area": (x2 - x1) * (y2 - y1),
                    "iscrowd": 0,
                }
            )
            ann_id += 1
        fn = f"{i:05d}.jpg"
        cv2.imwrite(os.path.join(img_dir, fn), np.clip(img, 0, 255).astype(np.uint8))
        images.append({"id": i + 1, "file_name": fn, "height": h, "width": w})

    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "ore"}],
    }
    json_path = os.path.join(out_dir, "instances.json")
    with open(json_path, "w") as f:
        json.dump(coco, f)
    return json_path, img_dir


def make_synthetic_setup(out_dir: str, num_images: int = 12, seed: int = 0,
                         crop_size: int = 240, **gen_kwargs):
    """Generate a dataset + support crops; returns (records, support_entries).

    gen_kwargs forward to generate_ore_dataset (e.g. the dense-small regime
    min_blobs=8, max_blobs=16, blob_size=(14, 40) used by the round-4
    budget-ablation variance study)."""
    json_path, img_root = generate_ore_dataset(out_dir, num_images=num_images,
                                               seed=seed, **gen_kwargs)
    records = load_coco_json(json_path, img_root)
    entries = build_support_crops(
        records, os.path.join(out_dir, "support"), crop_size=crop_size, seed=seed
    )
    return records, entries
