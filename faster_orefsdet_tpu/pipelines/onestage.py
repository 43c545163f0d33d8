"""One-stage CenterNet detector — the `CenterNetDetector` meta-arch.

Re-derivation of CenterNet2/centernet/modeling/meta_arch/
centernet_detector.py:12-69 (registered at import, ALT configs): backbone +
class-aware CenterNet head with NO support matching and NO ROI stage. The
class-aware decode path (predict_instances with logits_pred + agn-hm
multiply, fsod_rpn.py:1080-1083,1136-1139) and the class-aware heatmap focal
loss become the multi-class counterparts of the live proposal-only path.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models.centernet_head import CenterNetHead
from ..models.centernet import _level_valid_mask
from ..models.fpn import FPN
from ..models.vovnet import VoVNet
from ..ops.heatmap import compute_grids, level_grid_shapes
from ..ops.nms import batched_nms_mask, keep_top_scores
from ..structures.boxes import ltrb_to_xyxy
from ..structures.instances import Detections


class OneStageCenterNet(nn.Module):
    """Backbone + FPN + class-aware CenterNet head."""

    cfg: Config

    def setup(self):
        dtype = None
        if self.cfg.compute_dtype and self.cfg.compute_dtype != "float32":
            dtype = jnp.dtype(self.cfg.compute_dtype)
        self.backbone = VoVNet(
            conv_body=self.cfg.vovnet.conv_body,
            out_features=self.cfg.vovnet.out_features,
            dtype=dtype,
        )
        self.fpn = FPN(
            in_features=self.cfg.fpn.in_features,
            out_channels=self.cfg.fpn.out_channels,
            top_levels=self.cfg.fpn.top_levels,
            dtype=dtype,
        )
        self.head = CenterNetHead(
            in_channels=self.cfg.fpn.out_channels,
            num_levels=len(self.cfg.centernet.in_features),
            num_cls_convs=max(self.cfg.centernet.num_cls_convs, 1),
            num_classes=self.cfg.centernet.num_classes,
            num_box_convs=self.cfg.centernet.num_box_convs,
            with_agn_hm=self.cfg.centernet.with_agn_hm,
            only_proposal=False,
            prior_prob=self.cfg.centernet.prior_prob,
            dtype=dtype,
        )

    def __call__(self, images: jnp.ndarray):
        feats = self.fpn(self.backbone(images))
        levels = [feats[l] for l in self.cfg.centernet.in_features]
        return self.head(levels)  # (clss, agn_hms, bbox_regs)


def decode_multiclass(
    clss: List[jnp.ndarray],
    agn_hms: List[jnp.ndarray],
    bbox_regs: List[jnp.ndarray],
    cfg: Config,
    canvas_hw: Tuple[int, int],
    image_hw,
) -> Detections:
    """Class-aware decode for ONE image (predict_single_level with
    heatmap = cls-sigmoid * agn-sigmoid, class from the per-cell argmax;
    per-level topk → ml_nms → kthvalue trim)."""
    cn = cfg.centernet
    strides = cn.fpn_strides
    grids = compute_grids(canvas_hw, strides)
    valid_canvas = _level_valid_mask(canvas_hw, strides, image_hw)
    shapes = level_grid_shapes(canvas_hw, strides)
    offsets = np.cumsum([0] + [hl * wl for hl, wl in shapes])

    all_scores, all_boxes, all_classes, all_valid = [], [], [], []
    for li, s in enumerate(strides):
        hm = jax.nn.sigmoid(clss[li].reshape(-1, cn.num_classes).astype(jnp.float32))
        if cn.with_agn_hm and agn_hms[li] is not None:
            agn = jax.nn.sigmoid(agn_hms[li].reshape(-1, 1).astype(jnp.float32))
            hm = hm * agn  # (:1136-1139)
        reg = bbox_regs[li].reshape(-1, 4).astype(jnp.float32) * s
        g = grids[offsets[li] : offsets[li + 1]]
        vmask = valid_canvas[offsets[li] : offsets[li + 1]]

        flat = hm.reshape(-1)  # [Ml*C] candidates over (loc, class)
        cand = (flat > cn.score_thresh) & jnp.repeat(vmask, cn.num_classes)
        k = min(cn.pre_nms_topk_test, flat.shape[0])
        top_scores, top_idx = jax.lax.top_k(jnp.where(cand, flat, -1.0), k)
        loc = top_idx // cn.num_classes
        cls = top_idx % cn.num_classes
        boxes = ltrb_to_xyxy(g[loc], reg[loc])
        all_scores.append(top_scores)
        all_boxes.append(boxes)
        all_classes.append(cls)
        all_valid.append(top_scores > 0.0)

    scores = jnp.concatenate(all_scores)
    boxes = jnp.concatenate(all_boxes)
    classes = jnp.concatenate(all_classes)
    valid = jnp.concatenate(all_valid)
    keep = batched_nms_mask(boxes, scores, classes, valid, cn.nms_thresh_test)
    keep = keep_top_scores(scores, keep, cn.post_nms_topk_test)
    sel_scores, sel_idx = jax.lax.top_k(
        jnp.where(keep, scores, -1.0), cn.post_nms_topk_test
    )
    return Detections(
        boxes=boxes[sel_idx],
        scores=jnp.maximum(sel_scores, 0.0),
        classes=classes[sel_idx],
        valid=sel_scores > 0.0,
    )


def build_onestage_inference_fn(cfg: Config):
    model = OneStageCenterNet(cfg)

    @jax.jit
    def fn(params, image, image_hw):
        clss, agn_hms, regs = model.apply({"params": params}, image[None])
        canvas_hw = (image.shape[0], image.shape[1])
        return decode_multiclass(
            [c[0] for c in clss],
            [a[0] if a is not None else None for a in agn_hms],
            [r[0] for r in regs],
            cfg, canvas_hw, image_hw,
        )

    return model, fn
