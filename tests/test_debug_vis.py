"""Debug overlay rendering (debug_train/test/second_stage equivalents)."""

import numpy as np
import pytest

import jax.numpy as jnp

from faster_orefsdet_tpu.ops.heatmap import (
    compute_grids,
    flat_size_ranges,
    flat_strides,
    render_targets,
)
from faster_orefsdet_tpu.structures.instances import Detections, Proposals
from faster_orefsdet_tpu.utils.debug_vis import (
    debug_second_stage,
    debug_test,
    debug_train,
    split_levels,
)

CANVAS = (64, 96)
STRIDES = (8, 16, 32)
SOI = ((0, 64), (48, 192), (128, 1000000))


@pytest.fixture()
def targets():
    grids = compute_grids(CANVAS, STRIDES)
    boxes = jnp.asarray([[8.0, 8.0, 40.0, 40.0]])
    valid = jnp.asarray([True])
    tgt = render_targets(
        boxes, valid, grids, flat_strides(CANVAS, STRIDES),
        flat_size_ranges(CANVAS, STRIDES, SOI), CANVAS, STRIDES, SOI,
        hm_min_overlap=0.8, min_radius=4,
    )
    return tgt, boxes, valid


def test_debug_train_writes_overlays(tmp_path, targets):
    tgt, boxes, valid = targets
    img = np.random.default_rng(0).standard_normal((*CANVAS, 3)).astype(np.float32)
    paths = debug_train(img, tgt, boxes, valid, CANVAS, STRIDES, str(tmp_path))
    assert len(paths) == 4  # 3 level heatmaps + blend
    import cv2

    for p in paths:
        im = cv2.imread(p)
        assert im is not None and im.size > 0


def test_debug_test_and_second_stage(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.standard_normal((*CANVAS, 3)).astype(np.float32)
    hms = [rng.uniform(0, 1, (CANVAS[0] // s, CANVAS[1] // s, 1)).astype(np.float32)
           for s in STRIDES]
    k = 8
    props = Proposals(
        boxes=jnp.asarray(rng.uniform(0, 60, (k, 4)).astype(np.float32)),
        scores=jnp.asarray(rng.uniform(0, 1, k).astype(np.float32)),
        valid=jnp.ones(k, bool),
    )
    paths = debug_test(img, hms, props, str(tmp_path))
    assert len(paths) == 4
    det = Detections(
        boxes=props.boxes, scores=props.scores,
        classes=jnp.zeros(k, jnp.int32), valid=jnp.ones(k, bool),
    )
    p = debug_second_stage(img, det, str(tmp_path))
    import cv2

    assert cv2.imread(p) is not None


def test_split_levels_roundtrip():
    flat = np.arange(64 // 8 * 96 // 8 + 64 // 16 * 96 // 16 + 2 * 3, dtype=np.float32)
    levels = split_levels(flat, CANVAS, STRIDES)
    assert [l.shape for l in levels] == [(8, 12), (4, 6), (2, 3)]
    np.testing.assert_array_equal(levels[0].ravel(), flat[: 8 * 12])
