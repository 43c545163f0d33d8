"""Synthetic data regimes for the round-4 variance study (data/synthetic.py).

The budget-ablation robustness protocol needs a second object-density/size
regime (VERDICT r3 #4); these pin the generator knobs that define it."""

import json

import numpy as np

from faster_orefsdet_tpu.data.synthetic import generate_ore_dataset


def test_dense_small_regime_respects_knobs(tmp_path):
    jp, ir = generate_ore_dataset(
        str(tmp_path / "d"), num_images=6, image_hw=(240, 320), seed=3,
        min_blobs=8, max_blobs=16, blob_size=(14.0, 40.0),
    )
    with open(jp) as f:
        coco = json.load(f)
    per_img = {}
    for a in coco["annotations"]:
        per_img.setdefault(a["image_id"], []).append(a)
        w, h = a["bbox"][2], a["bbox"][3]
        assert 10.0 <= w <= 44.0 and 10.0 <= h <= 44.0, a["bbox"]
    counts = [len(v) for v in per_img.values()]
    assert len(counts) == 6
    assert min(counts) >= 8 and max(counts) <= 16


def test_default_regime_unchanged(tmp_path):
    """Default kwargs reproduce the round-3 base regime byte-for-byte
    (deterministic rng seeding) so prior measurements stay comparable."""
    jp1, _ = generate_ore_dataset(str(tmp_path / "a"), num_images=3, seed=0)
    jp2, _ = generate_ore_dataset(
        str(tmp_path / "b"), num_images=3, seed=0,
        min_blobs=1, blob_size=(28.0, 90.0),
    )
    with open(jp1) as f:
        c1 = json.load(f)
    with open(jp2) as f:
        c2 = json.load(f)
    b1 = np.asarray([a["bbox"] for a in c1["annotations"]])
    b2 = np.asarray([a["bbox"] for a in c2["annotations"]])
    np.testing.assert_array_equal(b1, b2)
