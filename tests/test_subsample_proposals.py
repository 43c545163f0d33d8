"""ROI sampling semantics (models/cascade_roi.subsample_proposals) vs d2
label_and_sample_proposals (detectron2 roi_heads.py:181-303 +
sampling.subsample_labels): PROPOSAL_APPEND_GT, the 0.6 stage-0 matcher,
positive_fraction capping, and negative fill — the one train-path stage the
composed parity test bypasses (it injects a fixed ROI set)."""

import numpy as np

import jax
import jax.numpy as jnp

from faster_orefsdet_tpu.config import get_config
from faster_orefsdet_tpu.models.cascade_roi import subsample_proposals
from faster_orefsdet_tpu.structures.instances import GroundTruth


def _setup(n_fg_clusters=3, n_bg=300, seed=0):
    g = np.random.default_rng(seed)
    gt_boxes = np.asarray(
        [[10, 10, 60, 70], [100, 40, 180, 120], [200, 150, 260, 230]], np.float32
    )
    gt = GroundTruth(
        boxes=jnp.asarray(gt_boxes),
        classes=jnp.zeros((3,), jnp.int32),
        valid=jnp.asarray([True, True, True]),
    )
    # proposals: tight jitters around gts (guaranteed fg) + far background
    fg_props = np.concatenate(
        [gt_boxes + g.uniform(-2, 2, (3, 4)).astype(np.float32)
         for _ in range(n_fg_clusters)]
    )
    xy = g.uniform(300, 500, (n_bg, 2)).astype(np.float32)
    wh = g.uniform(10, 40, (n_bg, 2)).astype(np.float32)
    bg_props = np.concatenate([xy, xy + wh], 1)
    boxes = np.concatenate([fg_props, bg_props]).astype(np.float32)
    valid = np.ones((len(boxes),), bool)
    return gt, jnp.asarray(boxes), jnp.asarray(valid), len(fg_props)


def test_counts_and_labels():
    cfg = get_config("finetune_vovnet").roi  # batch 128, fraction 0.5, iou 0.6
    gt, boxes, valid, n_fg = _setup()
    s_boxes, cls_t, box_t, slot_valid = subsample_proposals(
        jax.random.PRNGKey(0), boxes, valid, gt, cfg
    )
    assert s_boxes.shape == (cfg.batch_size_per_image, 4)
    sv = np.asarray(slot_valid)
    ct = np.asarray(cls_t)
    n_pos = int(((ct == 0) & sv).sum())
    n_neg = int(((ct == cfg.num_classes) & sv).sum())
    # d2 subsample_labels: num_pos = min(#fg, batch*fraction), negatives fill
    max_pos = int(cfg.batch_size_per_image * cfg.positive_fraction)
    # fg candidates = the 9 jittered + the 3 appended gts (PROPOSAL_APPEND_GT)
    expect_pos = min(n_fg + 3, max_pos)
    assert n_pos == expect_pos, (n_pos, expect_pos)
    assert n_neg == cfg.batch_size_per_image - n_pos  # enough bg to fill
    assert n_pos + n_neg == int(sv.sum())

    # every selected fg slot regresses to a genuinely-overlapping gt
    from faster_orefsdet_tpu.structures.boxes import pairwise_iou

    fg_slots = (ct == 0) & sv
    iou = np.asarray(pairwise_iou(jnp.asarray(np.asarray(box_t)[fg_slots]),
                                  jnp.asarray(np.asarray(s_boxes)[fg_slots])))
    assert (np.diag(iou) >= cfg.cascade_ious[0]).all()


def test_append_gt_guarantees_positives():
    """With NO overlapping proposals, the appended gts alone provide
    positives (d2 add_ground_truth_to_proposals, proposal_append_gt)."""
    cfg = get_config("finetune_vovnet").roi
    gt, boxes, valid, _ = _setup()
    # keep only the background proposals
    bg_only = boxes[9:]
    s_boxes, cls_t, box_t, slot_valid = subsample_proposals(
        jax.random.PRNGKey(1), bg_only, valid[9:], gt, cfg
    )
    sv, ct = np.asarray(slot_valid), np.asarray(cls_t)
    assert int(((ct == 0) & sv).sum()) == 3  # exactly the 3 gts


def test_deterministic_per_key():
    cfg = get_config("finetune_vovnet").roi
    gt, boxes, valid, _ = _setup()
    a = subsample_proposals(jax.random.PRNGKey(7), boxes, valid, gt, cfg)
    b = subsample_proposals(jax.random.PRNGKey(7), boxes, valid, gt, cfg)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
