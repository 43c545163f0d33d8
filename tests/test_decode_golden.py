"""Golden test: CenterNet proposal decode vs a torch transcription of
predict_single_level / nms_and_topK (fsod_rpn.py:1100-1210)."""

import dataclasses

import numpy as np
import torch

import jax.numpy as jnp

from faster_orefsdet_tpu.config import get_config
from faster_orefsdet_tpu.models.centernet import decode_proposals
from faster_orefsdet_tpu.ops.heatmap import compute_grids, level_grid_shapes


def _ref_decode(hms, regs, canvas_hw, strides, score_thresh, pre_topk, nms_th,
                post_topk):
    """Transcribed reference decode for one image (with_agn_hm sqrt scores)."""
    grids_all = np.asarray(compute_grids(canvas_hw, strides))
    shapes = level_grid_shapes(canvas_hw, strides)
    offs = np.cumsum([0] + [h * w for h, w in shapes])
    boxes_l, scores_l = [], []
    for li, s in enumerate(strides):
        hm = torch.sigmoid(torch.from_numpy(hms[li]).reshape(-1))
        reg = torch.from_numpy(regs[li]).reshape(-1, 4) * s
        g = torch.from_numpy(grids_all[offs[li]:offs[li + 1]])
        cand = hm > score_thresh
        k = min(pre_topk, int(cand.sum()))
        vals, idx = hm[cand].topk(k) if k else (torch.zeros(0), torch.zeros(0, dtype=torch.long))
        locs = torch.nonzero(cand).squeeze(1)[idx]
        r = reg[locs]
        gg = g[locs]
        det = torch.stack([gg[:, 0] - r[:, 0], gg[:, 1] - r[:, 1],
                           gg[:, 0] + r[:, 2], gg[:, 1] + r[:, 3]], dim=1)
        det[:, 2] = torch.max(det[:, 2], det[:, 0] + 0.01)
        det[:, 3] = torch.max(det[:, 3], det[:, 1] + 0.01)
        boxes_l.append(det)
        scores_l.append(torch.sqrt(vals))
    boxes = torch.cat(boxes_l).numpy()
    scores = torch.cat(scores_l).numpy()

    # greedy NMS + kthvalue trim
    order = np.argsort(-scores, kind="mergesort")
    iou = _iou(boxes, boxes)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > nms_th
        suppressed[i] = True
    keep = np.asarray(keep)
    ks = scores[keep]
    if len(keep) > post_topk:
        thr = np.sort(ks)[len(ks) - post_topk]
        keep = keep[ks >= thr]
    return boxes[keep], scores[keep]


def _iou(a, b):
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return np.where(inter > 0, inter / (aa[:, None] + ab[None] - inter), 0)


def test_decode_matches_reference():
    canvas_hw = (64, 96)
    strides = (8, 16, 32)
    rng = np.random.default_rng(0)
    shapes = level_grid_shapes(canvas_hw, strides)
    hms = [rng.standard_normal((h, w, 1)).astype(np.float32) * 2 - 2
           for h, w in shapes]
    regs = [np.abs(rng.standard_normal((h, w, 4)).astype(np.float32)) * 2 + 0.5
            for h, w in shapes]

    cfg = get_config("finetune_vovnet").centernet
    cfg = dataclasses.replace(cfg, pre_nms_topk_test=64, post_nms_topk_test=24)
    props = decode_proposals(
        [jnp.asarray(h) for h in hms], [jnp.asarray(r) for r in regs],
        cfg, canvas_hw, jnp.asarray([64.0, 96.0]), training=False,
    )
    got_boxes = np.asarray(props.boxes)[np.asarray(props.valid)]
    got_scores = np.asarray(props.scores)[np.asarray(props.valid)]

    ref_boxes, ref_scores = _ref_decode(
        hms, regs, canvas_hw, strides, cfg.score_thresh, 64,
        cfg.nms_thresh_test, cfg.post_nms_topk_test,
    )
    # sort both by score for comparison
    go = np.argsort(-got_scores, kind="mergesort")
    ro = np.argsort(-ref_scores, kind="mergesort")
    assert len(got_scores) == len(ref_scores)
    np.testing.assert_allclose(got_scores[go], ref_scores[ro], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got_boxes[go], ref_boxes[ro], rtol=1e-4, atol=1e-3)
