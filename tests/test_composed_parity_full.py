"""FULL-SCALE composed parity: the round-2 composed test ran at toy budgets
(pre_nms=128/post=32/det=16 on 96x128); this one runs the PUBLISHED decode
budgets and scale — 320-short-side query, pre_nms_topk_test=1000 →
NMS 0.6 → kthvalue-trim 256 → ROI → NMS 0.9 → top 100, 24-shot support
cache (all.sh SHOT=24), two seeds, plus a dense-scene assertion that >1024
above-threshold candidates actually flow through the NMS budget caps.

Exercises the boundary behaviors toy budgets cannot: per-level pre-NMS cap
(p3 at 320x448 has 2240 locations > 1000), the post-NMS kthvalue trim when
more than 256 proposals survive, and score-threshold crossings on dense
score fields (fsod_rpn.py:1116-1210, fsod_roi_heads.py:437-457).

Slow (minutes of CPU compile at the real static shapes) — marked `slow`.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from faster_orefsdet_tpu.config import get_config
from faster_orefsdet_tpu.pipelines.inference import make_detector, query_path_single
from faster_orefsdet_tpu.pipelines.support_cache import build_support_cache
from faster_orefsdet_tpu.utils.torch_convert import convert_torch_checkpoint

from test_composed_parity import (
    _pairwise_iou,
    t_centernet_head,
    t_correlate,
    t_features,
    t_full_inference,
    t_support_cache,
)
from test_torch_parity import make_torch_state_dict


def greedy_match(got_boxes, got_scores, ref_boxes, ref_scores, iou_min=0.95):
    """Greedy IoU matching between the two detection sets. At published scale
    the two float stacks legitimately select a few DIFFERENT low-score tail
    boxes (a ~1e-7 heatmap difference flips the pre-NMS top-1000 cut, an
    NMS >0.6 comparison, or the kthvalue trim — the reference itself would
    differ across cuDNN algos the same way), so parity is asserted on the
    matched set + the score ranks, not elementwise."""
    iou = _pairwise_iou(got_boxes, ref_boxes)
    flat = np.dstack(np.unravel_index(np.argsort(-iou, axis=None), iou.shape))[0]
    used_g, used_r, pairs = set(), set(), []
    for j, r in flat:
        if iou[j, r] < iou_min:
            break
        if j in used_g or r in used_r:
            continue
        used_g.add(j)
        used_r.add(r)
        pairs.append((int(j), int(r)))
    dscore = np.array([abs(got_scores[j] - ref_scores[r]) for j, r in pairs])
    return pairs, dscore, used_g, used_r


@pytest.mark.slow
def test_full_query_path_composed_parity_published_budgets():
    cfg = get_config("finetune_vovnet")
    # the defaults ARE the published budgets — assert so this test can't
    # silently drift toy-ward (finetune_vovnet.yaml over config.py defaults)
    assert cfg.centernet.pre_nms_topk_test == 1000
    assert cfg.centernet.post_nms_topk_test == 256
    assert cfg.roi.detections_per_image == 100
    assert cfg.centernet.nms_thresh_test == 0.6
    assert cfg.roi.nms_thresh_test == 0.9
    shot = cfg.fs.support_shot  # 24, all.sh:SHOT=24
    assert shot == 24

    model = make_detector(cfg)
    crop = cfg.fs.support_crop_size  # 240 → 256 canvas
    sup_canvas = int(np.ceil(crop / 32) * 32)

    for seed in (3, 11):
        sd = make_torch_state_dict(seed=seed)
        params = convert_torch_checkpoint(sd)

        g = np.random.default_rng(100 + seed)
        sup_imgs = g.standard_normal((shot, sup_canvas, sup_canvas, 3)).astype(
            np.float32
        )
        x1y1 = g.uniform(0, 60, (shot, 2)).astype(np.float32)
        wh = g.uniform(80, crop - 70, (shot, 2)).astype(np.float32)
        sup_boxes = np.concatenate(
            [x1y1, np.minimum(x1y1 + wh, crop - 1.0)], axis=1
        ).astype(np.float32)

        # 320-short-side query (INPUT.MIN_SIZE_TEST), true size (320, 426),
        # canvas ceil32 → (320, 448)
        img = g.standard_normal((1, 320, 448, 3)).astype(np.float32)
        image_hw = (320.0, 426.0)

        # ---- dense-scene precondition: the decode sees >1024 above-threshold
        # candidates, so the per-level pre-NMS 1000 cap and the kthvalue trim
        # are genuinely load-bearing (fsod_rpn.py:1150-1206)
        with torch.no_grad():
            feats = t_features(img, sd)
            t_cache = t_support_cache(sup_imgs, sup_boxes, sd, cfg)
            pos = t_correlate(feats, t_cache, sd)
            hms, _ = t_centernet_head([pos[l] for l in ("p3", "p4", "p5")], sd)
        n_above = sum(
            int((torch.sqrt(torch.sigmoid(h)) > cfg.centernet.score_thresh).sum())
            for h in hms
        )
        assert n_above > 1024, f"scene not dense enough: {n_above} candidates"
        # p3 alone must exceed the per-level cap for the cap to matter
        assert int(
            (torch.sqrt(torch.sigmoid(hms[0])) > cfg.centernet.score_thresh).sum()
        ) > cfg.centernet.pre_nms_topk_test

        # ---- ours: jitted cache build + query path at the real static K
        cache = build_support_cache(
            model, params, jnp.asarray(sup_imgs), jnp.asarray(sup_boxes), cfg
        )
        det = query_path_single(
            model, params, cache, jnp.asarray(img[0]), jnp.asarray(image_hw), cfg
        )
        valid = np.asarray(det.valid)
        got_boxes = np.asarray(det.boxes)[valid]
        got_scores = np.asarray(det.scores)[valid]

        # ---- torch transcription, SAME state dict / image
        for k in ("p3", "p4", "p5", "rcnn_8", "rcnn_4"):
            np.testing.assert_allclose(
                np.asarray(getattr(cache, k)), t_cache[k].numpy(),
                rtol=2e-3, atol=5e-4, err_msg=f"seed {seed} support cache {k}",
            )
        with torch.no_grad():
            ref_boxes, ref_scores = t_full_inference(img, image_hw, t_cache, sd, cfg)

        assert len(got_scores) == len(ref_scores), (
            f"seed {seed}: detection count {len(got_scores)} vs {len(ref_scores)}"
        )
        n = len(got_scores)
        pairs, dscore, used_g, used_r = greedy_match(
            got_boxes, got_scores, ref_boxes, ref_scores
        )
        # ≥85% of the top-100 must be the SAME boxes with near-identical
        # scores (measured: 92/100 matched at IoU 1.0, |Δscore| ≤ 3e-7)
        assert len(pairs) >= int(0.85 * n), (
            f"seed {seed}: only {len(pairs)}/{n} detections matched"
        )
        assert dscore.max() <= 1e-3, (
            f"seed {seed}: matched-score divergence {dscore.max():.2e}"
        )
        # the divergent few must sit low in the ranking: the top-10 by score
        # on each side are matched. (Random weights compress all 100 scores
        # into a ~0.08 band, so deeper rank assertions are statistically
        # meaningless — measured: seed 11 flips ranks 13/18 on a 1e-7
        # upstream difference while seed 3 matches its whole top-20.)
        top_g = set(np.argsort(-got_scores, kind="mergesort")[:10].tolist())
        top_r = set(np.argsort(-ref_scores, kind="mergesort")[:10].tolist())
        assert top_g <= used_g, f"seed {seed}: unmatched top-10 (ours)"
        assert top_r <= used_r, f"seed {seed}: unmatched top-10 (ref)"
