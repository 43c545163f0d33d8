"""Build the support-crop pool + index from a COCO train json.

The reference assumes pre-generated 240x240 support crops and a pandas
support DataFrame pickle (datasets/coco/{train,10_shot}_support_df.pkl,
dataset_mapper.py:78-80) produced by offline FewX tooling not shipped in the
repo. This CLI is that tool: one crop per annotation, square context window,
JSON index consumed by data.coco.load_support_index.

Usage:
  python -m faster_orefsdet_tpu.cli.build_support \
      --json instances_train2017.json --images train2017 \
      --out datasets/coco/support [--max-per-class 200]
"""

from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json", required=True)
    p.add_argument("--images", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--crop-size", type=int, default=240)
    p.add_argument("--max-per-class", type=int, default=None)
    args = p.parse_args()

    from ..data.coco import build_support_crops, load_coco_json, save_support_index

    records = load_coco_json(args.json, args.images)
    entries = build_support_crops(
        records, args.out, crop_size=args.crop_size, max_per_class=args.max_per_class
    )
    index_path = os.path.join(args.out, "support_index.json")
    save_support_index(index_path, entries)
    print(f"{len(entries)} support crops -> {args.out}; index at {index_path}")


if __name__ == "__main__":
    main()
