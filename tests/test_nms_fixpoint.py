"""Fixpoint NMS vs sequential-oracle equivalence, including adversarial
suppression chains (a suppresses b suppresses c ...)."""

import numpy as np

import jax.numpy as jnp

from faster_orefsdet_tpu.ops.nms import nms_mask, nms_mask_sequential


def _rand_boxes(rng, n, size=100.0):
    xy = rng.uniform(0, size, (n, 2)).astype(np.float32)
    wh = rng.uniform(1, size / 2, (n, 2)).astype(np.float32)
    return np.concatenate([xy, xy + wh], axis=1)


def test_fixpoint_matches_sequential_random():
    rng = np.random.default_rng(0)
    for trial in range(10):
        n = int(rng.integers(5, 200))
        boxes = _rand_boxes(rng, n)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        valid = rng.uniform(size=n) > 0.2
        for t in (0.3, 0.6, 0.9):
            a = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                    jnp.asarray(valid), t))
            b = np.asarray(nms_mask_sequential(jnp.asarray(boxes), jnp.asarray(scores),
                                               jnp.asarray(valid), t))
            np.testing.assert_array_equal(a, b)


def test_fixpoint_chain_suppression():
    """Overlapping chain: b0>b1>b2>b3... each overlapping only its neighbor.
    Greedy keeps the even-indexed boxes; a naive one-shot parallel NMS would
    wrongly drop them all but b0."""
    n = 12
    boxes = np.stack(
        [np.arange(n) * 6.0, np.zeros(n), np.arange(n) * 6.0 + 10.0, np.full(n, 10.0)],
        axis=1,
    ).astype(np.float32)  # stride 6, width 10 -> IoU(i,i+1) = 4/16 = 0.25
    scores = np.linspace(1.0, 0.5, n).astype(np.float32)
    valid = np.ones(n, bool)
    keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                               jnp.asarray(valid), 0.2))
    expected = np.asarray([i % 2 == 0 for i in range(n)])
    np.testing.assert_array_equal(keep, expected)


def test_fixpoint_no_valid():
    boxes = _rand_boxes(np.random.default_rng(1), 8)
    keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.zeros(8), jnp.zeros(8, bool), 0.5))
    assert not keep.any()
