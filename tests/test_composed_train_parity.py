"""COMPOSED train-step loss parity: the FULL training forward (support
encode → SM refine → CGM correlate → CenterNet head → heatmap targets →
focal/gIoU losses → ROI labeling → DSA stage losses) vs a functional-torch
transcription of the reference on the same converted checkpoint
(VERDICT r2 next #2).

Reference flow transcribed:
  fsod_cen.forward          :129-308  (train branch: per-image support mean,
                                       SM transpose quirk, CGM, both heads)
  fsod_rpn.losses           :702-779  (focal pos/neg + gIoU, num_pos norm)
  fsod_roi_heads._run_stage :460-520  (shot-mean support pools, DSA fuse,
                                       fc1 head, predictor)
  d2 fast_rcnn.losses       (mean CE over sampled rows; L1 sum over fg / R)

Sampling randomness is bypassed by injecting an IDENTICAL fixed ROI set
into both sides (loss_fn(injected_rois=...)); each side labels it with its
OWN stage-0 matcher, so matching stays under test. SM dropout is disabled
(deterministic=True) — the reference's train dropout has no shared mask.
"""

import dataclasses

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from faster_orefsdet_tpu.config import get_config
from faster_orefsdet_tpu.pipelines.inference import make_detector
from faster_orefsdet_tpu.pipelines.train_step import TrainBatch, loss_fn
from faster_orefsdet_tpu.utils.torch_convert import convert_torch_checkpoint

from test_composed_parity import (
    _pairwise_iou,
    t_centernet_head,
    t_correlate,
    t_features,
    t_multilevel_roi_align,
    t_support_cache,
)
from test_heatmap_targets import _reference_targets
from test_torch_parity import make_torch_state_dict, t_dsa_stage

LEVELS = ("p3", "p4", "p5")


def t_centernet_losses(hms, regs, gt_boxes, canvas_hw, cn):
    """fsod_rpn.losses :702-779 composition on transcription targets."""
    reg_t, heat, pos_inds = _reference_targets(
        gt_boxes, canvas_hw, list(cn.fpn_strides), list(cn.sizes_of_interest),
        hm_min_overlap=cn.hm_min_overlap, min_radius=cn.min_radius,
    )
    agn = torch.cat([h.reshape(-1) for h in hms])
    reg_pred = torch.cat([r.permute(0, 2, 3, 1).reshape(-1, 4) for r in regs])
    heat = torch.from_numpy(heat)
    reg_t = torch.from_numpy(np.asarray(reg_t, np.float32))
    pos_inds = torch.tensor(pos_inds, dtype=torch.long)
    num_pos = max(len(pos_inds), 1.0)

    pred = torch.clamp(agn.sigmoid(), cn.sigmoid_clamp, 1 - cn.sigmoid_clamp)
    neg_w = (1 - heat) ** cn.hm_focal_beta
    pos_loss = -(torch.log(pred[pos_inds])
                 * (1 - pred[pos_inds]) ** cn.loss_gamma).sum()
    neg_l = torch.log(1 - pred) * pred ** cn.loss_gamma * neg_w
    neg_l = neg_l * (pred < cn.ignore_high_fp).float()
    losses = {
        "loss_centernet_agn_pos": cn.pos_weight * pos_loss / num_pos,
        "loss_centernet_agn_neg": cn.neg_weight * (-neg_l.sum()) / num_pos,
    }

    reg_mask = reg_t.max(dim=1)[0] >= 0
    p = reg_pred[reg_mask]
    t = torch.clamp(reg_t[reg_mask], min=0)
    ta = (t[:, 0] + t[:, 2]) * (t[:, 1] + t[:, 3])
    pa = (p[:, 0] + p[:, 2]) * (p[:, 1] + p[:, 3])
    ai = (torch.min(p[:, 0], t[:, 0]) + torch.min(p[:, 2], t[:, 2])) * (
        torch.min(p[:, 3], t[:, 3]) + torch.min(p[:, 1], t[:, 1]))
    gw = torch.max(p[:, 0], t[:, 0]) + torch.max(p[:, 2], t[:, 2])
    gh = torch.max(p[:, 3], t[:, 3]) + torch.max(p[:, 1], t[:, 1])
    au = ta + pa - ai
    gious = (ai + 1) / (au + 1) - (gw * gh - au) / (gw * gh)
    losses["loss_centernet_loc"] = (
        cn.reg_weight * (1 - gious).sum() / max(int(reg_mask.sum()), 1)
    )
    return losses


def t_encode_deltas(props, gts, weights):
    """Box2BoxTransform.get_deltas (d2 box_regression.py:45-76)."""
    pw = props[:, 2] - props[:, 0]
    ph = props[:, 3] - props[:, 1]
    pcx = props[:, 0] + 0.5 * pw
    pcy = props[:, 1] + 0.5 * ph
    gw = gts[:, 2] - gts[:, 0]
    gh = gts[:, 3] - gts[:, 1]
    gcx = gts[:, 0] + 0.5 * gw
    gcy = gts[:, 1] + 0.5 * gh
    wx, wy, ww, wh = weights
    return np.stack([
        wx * (gcx - pcx) / pw, wy * (gcy - pcy) / ph,
        ww * np.log(gw / pw), wh * np.log(gh / ph),
    ], 1).astype(np.float32)


def t_roi_losses(feats, t_cache, inj_boxes, gt_boxes, sd, cfg):
    """fsod_roi_heads._run_stage :460-520 + d2 fast_rcnn losses, 1 stage."""
    roi = cfg.roi
    q8 = t_multilevel_roi_align(
        {l: feats[l][0] for l in LEVELS}, inj_boxes, roi.pooler_resolution, cfg
    )
    s8 = t_cache["rcnn_8"].permute(2, 0, 1)[None]  # [1, C, 8, 8]
    scores, deltas = t_dsa_stage(q8, s8, sd)

    iou = _pairwise_iou(inj_boxes, gt_boxes)
    midx = iou.argmax(1)
    fg = iou.max(1) >= roi.cascade_ious[0]
    cls_t = np.where(fg, 0, roi.num_classes)  # single class → bg = 1
    loss_cls = F.cross_entropy(scores, torch.from_numpy(cls_t).long())

    tgt = t_encode_deltas(inj_boxes, gt_boxes[midx], roi.cascade_bbox_reg_weights[0])
    l1 = (deltas - torch.from_numpy(tgt)).abs()  # smooth_l1 beta=0 → L1
    loss_reg = l1[torch.from_numpy(fg)].sum() / len(inj_boxes)
    return {"loss_cls_stage0": loss_cls, "loss_box_reg_stage0": loss_reg}


def test_composed_train_loss_parity():
    cfg = get_config("finetune_vovnet")
    cfg = cfg.replace(
        fs=dataclasses.replace(cfg.fs, support_shot=2),
        static=dataclasses.replace(cfg.static, max_gt_per_image=4),
    )
    sd = make_torch_state_dict(seed=5)
    params = convert_torch_checkpoint(sd)
    model = make_detector(cfg)

    g = np.random.default_rng(7)
    canvas_hw = (96, 128)
    img = g.standard_normal((1, *canvas_hw, 3)).astype(np.float32)
    sup_imgs = g.standard_normal((2, 256, 256, 3)).astype(np.float32)
    sup_boxes = np.asarray(
        [[20.0, 30.0, 200.0, 210.0], [8.0, 8.0, 120.0, 180.0]], np.float32
    )
    # gt spanning p3-only and p3+p4 size ranges (diag/2 = 31 and 64)
    gt = np.asarray([[8.0, 8, 56, 48], [20, 10, 120, 90]], np.float32)
    gt_pad = np.zeros((4, 4), np.float32)
    gt_pad[:2] = gt
    gt_valid = np.asarray([True, True, False, False])

    # fixed injected ROI set: on-gt, jittered, and background boxes
    jit = g.uniform(-6, 6, (6, 4)).astype(np.float32)
    rand_xy = g.uniform(0, 80, (12, 2)).astype(np.float32)
    rand_wh = g.uniform(10, 40, (12, 2)).astype(np.float32)
    inj = np.concatenate([
        gt,
        np.repeat(gt, 3, axis=0) + jit,
        np.concatenate([rand_xy, rand_xy + rand_wh], 1),
    ]).astype(np.float32)
    inj[:, 0::2] = inj[:, 0::2].clip(0, canvas_hw[1] - 1)
    inj[:, 1::2] = inj[:, 1::2].clip(0, canvas_hw[0] - 1)
    inj[:, 2] = np.maximum(inj[:, 2], inj[:, 0] + 4)
    inj[:, 3] = np.maximum(inj[:, 3], inj[:, 1] + 4)
    r = len(inj)

    batch = TrainBatch(
        images=jnp.asarray(img),
        image_hw=jnp.asarray([[float(canvas_hw[0]), float(canvas_hw[1])]]),
        gt_boxes=jnp.asarray(gt_pad[None]),
        gt_classes=jnp.zeros((1, 4), jnp.int32),
        gt_valid=jnp.asarray(gt_valid[None]),
        support_images=jnp.asarray(sup_imgs[None]),
        support_boxes=jnp.asarray(sup_boxes[None]),
    )

    total, losses = jax.jit(
        lambda p, b, k: loss_fn(
            p, b, model, cfg, k, deterministic=True,
            injected_rois=(jnp.asarray(inj[None]), jnp.ones((1, r), bool)),
        )
    )(params, batch, jax.random.PRNGKey(0))
    losses = {k: float(v) for k, v in losses.items()}

    # ---- torch transcription on the SAME state dict / inputs
    with torch.no_grad():
        feats = t_features(img, sd)
        t_cache = t_support_cache(sup_imgs, sup_boxes, sd, cfg)
        pos = t_correlate(feats, t_cache, sd)
        hms, regs = t_centernet_head([pos[l] for l in LEVELS], sd)
        ref = t_centernet_losses(hms, regs, gt, canvas_hw, cfg.centernet)
        ref.update(t_roi_losses(feats, t_cache, inj, gt, sd, cfg))
    ref = {k: float(v) for k, v in ref.items()}

    assert set(losses) == set(ref), (sorted(losses), sorted(ref))
    for k in sorted(ref):
        np.testing.assert_allclose(
            losses[k], ref[k], rtol=2e-3, atol=1e-5, err_msg=f"loss {k}"
        )
    assert np.isfinite(float(total))
