"""COCO AP evaluator tests against hand-computed cases."""

import numpy as np

from faster_orefsdet_tpu.evaluation import COCOEvaluator, coco_ap
from faster_orefsdet_tpu.evaluation.coco_eval import DetResult, GTImage, IOU_THRS


def _gt(image_id, boxes):
    boxes = np.asarray(boxes, float).reshape(-1, 4)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return GTImage(image_id, boxes, np.zeros(len(boxes), bool), areas)


def test_perfect_detection_ap100():
    gt = [_gt(1, [[10, 10, 50, 50], [60, 60, 100, 100]])]
    det = [DetResult(1, np.asarray([[10, 10, 50, 50], [60, 60, 100, 100]], float),
                     np.asarray([0.9, 0.8]))]
    r = coco_ap(det, gt)
    assert abs(r["AP"] - 100) < 1e-6
    assert abs(r["AP50"] - 100) < 1e-6
    assert abs(r["AR@100"] - 100) < 1e-6


def test_partial_iou_threshold_cut():
    # det has IoU = 0.74 with gt -> counts at thresholds 0.5..0.70 (5 of 10)
    gt = [_gt(1, [[0, 0, 100, 100]])]
    det = [DetResult(1, np.asarray([[0, 0, 100, 74]], float), np.asarray([0.9]))]
    iou = (100 * 74) / (100 * 100)
    n_pass = int(np.sum(IOU_THRS <= iou + 1e-9))
    r = coco_ap(det, gt)
    assert abs(r["AP"] - 100 * n_pass / 10) < 1e-6
    assert abs(r["AP50"] - 100) < 1e-6
    assert abs(r["AP75"] - 0) < 1e-6


def test_false_positive_precision():
    # 1 gt; det1 matches (score .9), det2 is a FP (score .8):
    # precision curve: [1/1, 1/2]; recall hits 1.0 at first det.
    # 101-pt AP at every IoU thr = 1.0 (precision at all recall pts = 1).
    gt = [_gt(1, [[0, 0, 50, 50]])]
    det = [DetResult(1, np.asarray([[0, 0, 50, 50], [60, 60, 90, 90]], float),
                     np.asarray([0.9, 0.8]))]
    r = coco_ap(det, gt)
    assert abs(r["AP"] - 100) < 1e-6

    # FP scored HIGHER than the TP: precision at recall>0 is 1/2
    det2 = [DetResult(1, np.asarray([[60, 60, 90, 90], [0, 0, 50, 50]], float),
                      np.asarray([0.9, 0.8]))]
    r2 = coco_ap(det2, gt)
    assert abs(r2["AP"] - 50) < 1e-6


def test_missed_gt_lowers_recall():
    gt = [_gt(1, [[0, 0, 50, 50], [100, 100, 150, 150]])]
    det = [DetResult(1, np.asarray([[0, 0, 50, 50]], float), np.asarray([0.9]))]
    r = coco_ap(det, gt)
    # recall caps at 0.5 -> 101-pt interpolation: ~51/101 of precision pts set
    expected = 100 * (np.sum(np.linspace(0, 1, 101) <= 0.5) / 101)
    assert abs(r["AP"] - expected) < 1.0
    assert abs(r["AR@100"] - 50) < 1e-6


def test_crowd_gt_is_ignored_not_fp():
    gt = [GTImage(1, np.asarray([[0.0, 0, 50, 50]]), np.asarray([True]),
                  np.asarray([2500.0]))]
    det = [DetResult(1, np.asarray([[0, 0, 50, 50]], float), np.asarray([0.9]))]
    r = coco_ap(det, gt)
    # only crowd gt -> no countable gt -> AP undefined (nan), matching COCO -1 behavior
    assert np.isnan(r["AP"])


def test_area_range_binning():
    # small gt (16x16=256 < 32^2) only contributes to APs
    gt = [_gt(1, [[0, 0, 16, 16]])]
    det = [DetResult(1, np.asarray([[0, 0, 16, 16]], float), np.asarray([0.9]))]
    r = coco_ap(det, gt)
    assert abs(r["APs"] - 100) < 1e-6
    assert np.isnan(r["APm"])
    assert np.isnan(r["APl"])


def test_evaluator_interface():
    ev = COCOEvaluator()
    ev.add_ground_truth(1, [[0, 0, 50, 50]])
    ev.process(1, [[0, 0, 50, 50]], [0.9])
    r = ev.evaluate()
    assert abs(r["AP"] - 100) < 1e-6
