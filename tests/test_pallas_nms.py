"""Pallas in-VMEM NMS == XLA fixpoint == sequential oracle (interpret mode).

The kernel must reproduce torchvision-greedy semantics exactly on dense
overlapping scenes, padded/invalid slots, and the class-offset batched
variant (ops/pallas_nms.py vs ops/nms.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from faster_orefsdet_tpu.ops.nms import (
    batched_nms_mask,
    nms_mask,
    nms_mask_sequential,
)
from faster_orefsdet_tpu.ops.pallas_nms import (
    batched_nms_mask_pallas,
    nms_mask_pallas,
)


def _scene(rng, k, n_valid, spread=200.0, size=40.0):
    centers = rng.uniform(0, spread, (k, 2)).astype(np.float32)
    wh = rng.uniform(8.0, size, (k, 2)).astype(np.float32)
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], axis=1)
    scores = rng.uniform(0.01, 1.0, (k,)).astype(np.float32)
    valid = np.zeros((k,), bool)
    valid[:n_valid] = True
    return jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid)


@pytest.mark.parametrize("k,n_valid,thr", [(256, 256, 0.6), (256, 170, 0.5),
                                           (512, 512, 0.3),
                                           # K=768/1280: supported() K values
                                           # where a 512-row reduce tile would
                                           # truncate the fori_loop (advisor
                                           # r2 high finding) — must cover ALL
                                           # rows with the _CHUNK tile.
                                           (768, 768, 0.5), (1280, 1100, 0.6),
                                           # non-multiples of 256: wrapper
                                           # padding (round 5); 1700 is the
                                           # fast preset's real pre-NMS
                                           # candidate count, 1792 the cap
                                           # (also the k>1024 128-row chunk)
                                           (100, 80, 0.5), (652, 600, 0.6),
                                           (1700, 1500, 0.6), (1792, 1792, 0.6)])
def test_pallas_nms_matches_fixpoint_and_oracle(k, n_valid, thr):
    rng = np.random.default_rng(k + n_valid)
    boxes, scores, valid = _scene(rng, k, n_valid)
    got = np.asarray(nms_mask_pallas(boxes, scores, valid, thr, interpret=True))
    fix = np.asarray(nms_mask(boxes, scores, valid, thr))
    seq = np.asarray(nms_mask_sequential(boxes, scores, valid, thr))
    np.testing.assert_array_equal(got, fix)
    np.testing.assert_array_equal(got, seq)


def test_pallas_nms_dense_chain():
    """Heavy-overlap chain scenes exercise deep peeling recursions."""
    rng = np.random.default_rng(7)
    k = 256
    # boxes in a tight line: each overlaps its neighbors
    xs = np.linspace(0, 400, k).astype(np.float32)
    boxes = np.stack([xs, np.zeros(k, np.float32), xs + 50, np.full(k, 50.0, np.float32)], 1)
    scores = rng.uniform(0.01, 1.0, (k,)).astype(np.float32)
    valid = np.ones((k,), bool)
    got = np.asarray(nms_mask_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                                     jnp.asarray(valid), 0.4, interpret=True))
    seq = np.asarray(nms_mask_sequential(jnp.asarray(boxes), jnp.asarray(scores),
                                         jnp.asarray(valid), 0.4))
    np.testing.assert_array_equal(got, seq)


def test_pallas_batched_nms_matches():
    rng = np.random.default_rng(3)
    boxes, scores, valid = _scene(rng, 256, 230)
    classes = jnp.asarray(rng.integers(0, 3, (256,)), jnp.int32)
    got = np.asarray(
        batched_nms_mask_pallas(boxes, scores, classes, valid, 0.5, interpret=True)
    )
    ref = np.asarray(batched_nms_mask(boxes, scores, classes, valid, 0.5))
    np.testing.assert_array_equal(got, ref)
