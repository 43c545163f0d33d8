"""Golden test: CenterNet loss composition (normalizers, weights) vs a torch
transcription of fsod_rpn.py:702-779 (only_proposal path, single image)."""

import numpy as np
import torch

import jax.numpy as jnp

from faster_orefsdet_tpu.config import get_config
from faster_orefsdet_tpu.models.centernet import centernet_losses
from faster_orefsdet_tpu.ops.heatmap import (
    compute_grids,
    flat_size_ranges,
    flat_strides,
    level_grid_shapes,
    render_targets,
)


def test_loss_composition_matches_reference():
    cfg = get_config("finetune_vovnet").centernet
    canvas_hw = (64, 96)
    strides = list(cfg.fpn_strides)
    shapes = level_grid_shapes(canvas_hw, strides)
    rng = np.random.default_rng(0)

    gt = np.asarray([[8.0, 8, 50, 40], [30, 20, 90, 60]], np.float32)
    gt_pad = np.zeros((4, 4), np.float32)
    gt_pad[:2] = gt
    valid = np.asarray([True, True, False, False])

    grids = compute_grids(canvas_hw, strides)
    sm = flat_strides(canvas_hw, strides)
    sr = flat_size_ranges(canvas_hw, strides, cfg.sizes_of_interest)
    tgt = render_targets(
        jnp.asarray(gt_pad), jnp.asarray(valid), grids, sm, sr, canvas_hw,
        strides, cfg.sizes_of_interest,
        hm_min_overlap=cfg.hm_min_overlap, min_radius=cfg.min_radius,
    )

    m = sum(h * w for h, w in shapes)
    hms = [rng.standard_normal((h, w, 1)).astype(np.float32) for h, w in shapes]
    regs = [np.abs(rng.standard_normal((h, w, 4)).astype(np.float32)) + 0.1
            for h, w in shapes]

    num_pos = int(np.asarray(tgt.pos_mask).sum())
    ours = centernet_losses(
        [jnp.asarray(h) for h in hms], [jnp.asarray(r) for r in regs],
        tgt, cfg, jnp.ones((m,), bool),
        num_pos_avg=jnp.asarray(float(max(num_pos, 1))),
    )

    # ---- torch reference composition
    agn = torch.from_numpy(np.concatenate([h.reshape(-1) for h in hms]))
    reg_pred = torch.from_numpy(np.concatenate([r.reshape(-1, 4) for r in regs]))
    heat = torch.from_numpy(np.asarray(tgt.heatmap))
    reg_t = torch.from_numpy(np.asarray(tgt.reg_targets))
    pos_inds = torch.from_numpy(
        np.asarray(tgt.pos_inds)[np.asarray(tgt.pos_mask)]).long()

    # binary heatmap focal (heatmap_focal_loss.py:51-87)
    pred = torch.clamp(agn.sigmoid(), cfg.sigmoid_clamp, 1 - cfg.sigmoid_clamp)
    neg_w = (1 - heat) ** cfg.hm_focal_beta
    pos_loss = -(torch.log(pred[pos_inds]) * (1 - pred[pos_inds]) ** cfg.loss_gamma).sum()
    neg_l = torch.log(1 - pred) * pred**cfg.loss_gamma * neg_w
    neg_l = neg_l * (pred < cfg.ignore_high_fp).float()
    neg_loss = -neg_l.sum()
    npos_avg = max(num_pos, 1.0)
    ref_pos = cfg.pos_weight * pos_loss / npos_avg
    ref_neg = cfg.neg_weight * neg_loss / npos_avg

    # gIoU loc loss (:744-759), unit weights (NOT_NORM_REG), norm = count
    reg_mask = reg_t.max(dim=1)[0] >= 0
    p = reg_pred[reg_mask]
    t = torch.clamp(reg_t[reg_mask], min=0)
    ta = (t[:, 0] + t[:, 2]) * (t[:, 1] + t[:, 3])
    pa = (p[:, 0] + p[:, 2]) * (p[:, 1] + p[:, 3])
    wi = torch.min(p[:, 0], t[:, 0]) + torch.min(p[:, 2], t[:, 2])
    hi = torch.min(p[:, 3], t[:, 3]) + torch.min(p[:, 1], t[:, 1])
    gw = torch.max(p[:, 0], t[:, 0]) + torch.max(p[:, 2], t[:, 2])
    gh = torch.max(p[:, 3], t[:, 3]) + torch.max(p[:, 1], t[:, 1])
    ai = wi * hi
    au = ta + pa - ai
    ious = (ai + 1) / (au + 1)
    gious = ious - (gw * gh - au) / (gw * gh)
    ref_loc = cfg.reg_weight * (1 - gious).sum() / max(int(reg_mask.sum()), 1)

    np.testing.assert_allclose(float(ours["loss_centernet_agn_pos"]), float(ref_pos), rtol=1e-4)
    np.testing.assert_allclose(float(ours["loss_centernet_agn_neg"]), float(ref_neg), rtol=1e-4)
    np.testing.assert_allclose(float(ours["loss_centernet_loc"]), float(ref_loc), rtol=1e-4)
