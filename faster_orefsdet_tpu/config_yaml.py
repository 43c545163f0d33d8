"""YAML configuration loading with detectron2-style ``_BASE_`` inheritance.

The reference configures everything through yacs YAMLs layered over code
defaults (configs/fsod/*.yaml; ``_BASE_`` resolution in
detectron2.7z!config/config.py CfgNode.merge_from_file, key surface from
fewx/config/config.py:4-100). This module keeps that file format — the same
upper-case dotted key set, the same inheritance — but resolves it onto the
typed dataclass tree in `config.py` instead of a global mutable CfgNode.

Strictness: an unmapped key is an error. Keys with no TPU analog are listed
in `IGNORED_KEYS` with the reason they don't apply; everything else maps to
a dotted `Config` path.

Two meta-architectures dispatch to two config types (mirroring the
reference's registry split):
  - "CenterNet2Detector" → `config.Config`        (fsod_cen.py:38)
  - "FsodRCNN"           → `pipelines.attention_rpn.BaselineConfig`
                                                   (fsod_rcnn.py:36)
Configs whose ROI input features are not the p3/p4/p5 pyramid are rejected:
they are dead in the reference too (fsod_cen.forward hard-indexes
features['p3'..'p5'], fsod_cen.py:202-213 → KeyError before any loss; see
PARITY.md on finetune_dla2.yaml / finetune_R_50_F.yaml).
"""

from __future__ import annotations

import ast
import dataclasses
import os
from typing import Any, Dict

import yaml

from .config import Config


class DeadReferenceConfigError(ValueError):
    """The yaml describes a configuration that cannot run in the reference."""


# d2 dotted key → Config dotted path. `None` value = handled specially.
KEY_MAP: Dict[str, str] = {
    "MODEL.VOVNET.CONV_BODY": "vovnet.conv_body",
    "MODEL.VOVNET.OUT_FEATURES": "vovnet.out_features",
    "MODEL.VOVNET.NORM": "vovnet.norm",
    "MODEL.BACKBONE.FREEZE_AT": "vovnet.freeze_at",
    "MODEL.FPN.IN_FEATURES": "fpn.in_features",
    "MODEL.FPN.OUT_CHANNELS": "fpn.out_channels",
    "MODEL.FPN.FUSE_TYPE": "fpn.fuse_type",
    "MODEL.BIFPN.OUT_CHANNELS": "fpn.out_channels",
    "MODEL.BIFPN.NUM_BIFPN": "fpn.bifpn_repeats",
    "MODEL.BIFPN.NORM": "fpn.bifpn_norm",
    "MODEL.DLA.NUM_LAYERS": "dla.num_layers",
    "MODEL.DLA.NORM": "dla.norm",
    "MODEL.FCOS.TOP_LEVELS": "fpn.top_levels",
    "MODEL.ROI_HEADS.IN_FEATURES": "roi.in_features",
    "MODEL.ROI_HEADS.NUM_CLASSES": "roi.num_classes",
    "MODEL.ROI_HEADS.NMS_THRESH_TEST": "roi.nms_thresh_test",
    "MODEL.ROI_HEADS.SCORE_THRESH_TEST": "roi.score_thresh_test",
    "MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE": "roi.batch_size_per_image",
    "MODEL.ROI_HEADS.POSITIVE_FRACTION": "roi.positive_fraction",
    "MODEL.ROI_HEADS.PROPOSAL_APPEND_GT": "roi.proposal_append_gt",
    "MODEL.ROI_BOX_CASCADE_HEAD.IOUS": "roi.cascade_ious",
    "MODEL.ROI_BOX_CASCADE_HEAD.BBOX_REG_WEIGHTS": "roi.cascade_bbox_reg_weights",
    "MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION": "roi.pooler_resolution",
    "MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION2": "roi.pooler_resolution2",
    "MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO": "roi.pooler_sampling_ratio",
    "MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG": "roi.cls_agnostic_bbox_reg",
    "MODEL.ROI_BOX_HEAD.MULT_PROPOSAL_SCORE": "roi.mult_proposal_score",
    "MODEL.ROI_BOX_HEAD.FC_DIM": "roi.fc_dim",
    "MODEL.ROI_BOX_HEAD.SMOOTH_L1_BETA": "roi.smooth_l1_beta",
    "MODEL.CENTERNET.NUM_CLASSES": "centernet.num_classes",
    "MODEL.CENTERNET.IN_FEATURES": "centernet.in_features",
    "MODEL.CENTERNET.FPN_STRIDES": "centernet.fpn_strides",
    "MODEL.CENTERNET.SOI": "centernet.sizes_of_interest",
    "MODEL.CENTERNET.INFERENCE_TH": "centernet.score_thresh",
    "MODEL.CENTERNET.HM_MIN_OVERLAP": "centernet.hm_min_overlap",
    "MODEL.CENTERNET.MIN_RADIUS": "centernet.min_radius",
    "MODEL.CENTERNET.HM_FOCAL_ALPHA": "centernet.hm_focal_alpha",
    "MODEL.CENTERNET.HM_FOCAL_BETA": "centernet.hm_focal_beta",
    "MODEL.CENTERNET.LOSS_GAMMA": "centernet.loss_gamma",
    "MODEL.CENTERNET.REG_WEIGHT": "centernet.reg_weight",
    "MODEL.CENTERNET.NOT_NORM_REG": "centernet.not_norm_reg",
    "MODEL.CENTERNET.WITH_AGN_HM": "centernet.with_agn_hm",
    "MODEL.CENTERNET.ONLY_PROPOSAL": "centernet.only_proposal",
    "MODEL.CENTERNET.POS_WEIGHT": "centernet.pos_weight",
    "MODEL.CENTERNET.NEG_WEIGHT": "centernet.neg_weight",
    "MODEL.CENTERNET.SIGMOID_CLAMP": "centernet.sigmoid_clamp",
    "MODEL.CENTERNET.IGNORE_HIGH_FP": "centernet.ignore_high_fp",
    "MODEL.CENTERNET.LOC_LOSS_TYPE": "centernet.loc_loss_type",
    "MODEL.CENTERNET.MORE_POS": "centernet.more_pos",
    "MODEL.CENTERNET.MORE_POS_THRESH": "centernet.more_pos_thresh",
    "MODEL.CENTERNET.MORE_POS_TOPK": "centernet.more_pos_topk",
    "MODEL.CENTERNET.NOT_NMS": "centernet.not_nms",
    "MODEL.CENTERNET.PRE_NMS_TOPK_TRAIN": "centernet.pre_nms_topk_train",
    "MODEL.CENTERNET.POST_NMS_TOPK_TRAIN": "centernet.post_nms_topk_train",
    "MODEL.CENTERNET.PRE_NMS_TOPK_TEST": "centernet.pre_nms_topk_test",
    "MODEL.CENTERNET.POST_NMS_TOPK_TEST": "centernet.post_nms_topk_test",
    "MODEL.CENTERNET.NMS_TH_TRAIN": "centernet.nms_thresh_train",
    "MODEL.CENTERNET.NMS_TH_TEST": "centernet.nms_thresh_test",
    "MODEL.CENTERNET.NORM": "centernet.norm",
    "MODEL.CENTERNET.NUM_CLS_CONVS": "centernet.num_cls_convs",
    "MODEL.CENTERNET.NUM_BOX_CONVS": "centernet.num_box_convs",
    "MODEL.CENTERNET.NUM_SHARE_CONVS": "centernet.num_share_convs",
    "MODEL.CENTERNET.PRIOR_PROB": "centernet.prior_prob",
    "MODEL.PIXEL_MEAN": "input.pixel_mean",
    "MODEL.PIXEL_STD": "input.pixel_std",
    "INPUT.FS.FEW_SHOT": "fs.few_shot",
    "INPUT.FS.SUPPORT_WAY": "fs.support_way",
    "INPUT.FS.SUPPORT_SHOT": "fs.support_shot",
    "INPUT.MIN_SIZE_TRAIN": "input.min_size_train",
    "INPUT.MAX_SIZE_TRAIN": "input.max_size_train",
    "INPUT.MIN_SIZE_TEST": "input.min_size_test",
    "INPUT.MAX_SIZE_TEST": "input.max_size_test",
    "INPUT.FORMAT": "input.format",
    "SOLVER.IMS_PER_BATCH": "solver.ims_per_batch",
    "SOLVER.BASE_LR": "solver.base_lr",
    "SOLVER.MOMENTUM": "solver.momentum",
    "SOLVER.NESTEROV": "solver.nesterov",
    "SOLVER.WEIGHT_DECAY": "solver.weight_decay",
    "SOLVER.WEIGHT_DECAY_NORM": "solver.weight_decay_norm",
    "SOLVER.BIAS_LR_FACTOR": "solver.bias_lr_factor",
    "SOLVER.HEAD_LR_FACTOR": "solver.head_lr_factor",
    "SOLVER.STEPS": "solver.steps",
    "SOLVER.GAMMA": "solver.gamma",
    "SOLVER.MAX_ITER": "solver.max_iter",
    "SOLVER.LR_SCHEDULER_NAME": "solver.lr_scheduler_name",
    "SOLVER.WARMUP_ITERS": "solver.warmup_iters",
    "SOLVER.WARMUP_FACTOR": "solver.warmup_factor",
    "SOLVER.WARMUP_METHOD": "solver.warmup_method",
    "SOLVER.CHECKPOINT_PERIOD": "solver.checkpoint_period",
    "SOLVER.CLIP_GRADIENTS.ENABLED": "solver.clip_gradients",
    "SOLVER.CLIP_GRADIENTS.CLIP_TYPE": "solver.clip_type",
    "SOLVER.CLIP_GRADIENTS.CLIP_VALUE": "solver.clip_value",
    "SOLVER.CLIP_GRADIENTS.NORM_TYPE": "solver.norm_type",
    "OUTPUT_DIR": "output_dir",
    "SEED": "seed",
    "TEST.EVAL_PERIOD": "eval_period",
}

# Keys accepted but deliberately not mapped, with the reason.
IGNORED_KEYS: Dict[str, str] = {
    "MODEL.META_ARCHITECTURE": "dispatches the config type (handled in load_yaml)",
    "MODEL.PROPOSAL_GENERATOR.NAME": "implied by the meta-architecture here",
    "MODEL.ROI_HEADS.NAME": "implied by the meta-architecture here",
    "MODEL.ROI_HEADS.IOU_THRESHOLDS": "the cascade matcher uses ROI_BOX_CASCADE_HEAD.IOUS; "
    "d2 CascadeROIHeads asserts the two equal (cascade_rcnn.py)",
    "MODEL.ROI_BOX_HEAD.NAME": "single fc1 head is structural (fc1 8192->128, log :741)",
    "MODEL.ROI_BOX_HEAD.NUM_FC": "same",
    "MODEL.BACKBONE.NAME": "maps to Config.backbone_name (handled in load_yaml)",
    "MODEL.WEIGHTS": "torch checkpoints load via utils/torch_convert + the CLI --weights flag",
    "MODEL.MASK_ON": "no mask head in this detector",
    "MODEL.RESNETS.DEPTH": "resnet_fpn backbone family is ResNet-50 (models/resnet.py)",
    "MODEL.RESNETS.OUT_FEATURES": "fixed res3-res5 for the p3-p5 pyramid (models/detector.py)",
    "MODEL.BIFPN.NUM_LEVELS": "the BiFPN always consumes the dla3-5 pyramid (models/detector.py)",
    "MODEL.RPN.PRE_NMS_TOPK_TEST": "AttentionRPN-baseline-only (BaselineConfig)",
    "MODEL.RPN.POST_NMS_TOPK_TEST": "AttentionRPN-baseline-only (BaselineConfig)",
    "DATALOADER.NUM_WORKERS": "the loader uses a device-prefetch pipeline, not worker processes",
    "VERSION": "yacs schema version tag",
}

# reference builder name (detectron2 BACKBONE.NAME) → Config.backbone_name
BACKBONE_BUILDERS = {
    "build_fcos_vovnet_fpn_backbone": "vovnet_fpn",
    "build_p35_fcos_dla_bifpn_backbone": "dla_bifpn",
    "build_mobilenetV3small_fpn_backbone": "mnv3_fpn",
    "build_p35_resnet_fpn_backbone": "resnet_fpn",
}

# BaselineConfig (FsodRCNN / AttentionRPN baseline) key surface.
BASELINE_KEY_MAP: Dict[str, str] = {
    "MODEL.RPN.PRE_NMS_TOPK_TEST": "rpn_pre_nms_topk_test",
    "MODEL.RPN.POST_NMS_TOPK_TEST": "rpn_post_nms_topk_test",
    "MODEL.RPN.PRE_NMS_TOPK_TRAIN": "rpn_pre_nms_topk_train",
    "MODEL.RPN.POST_NMS_TOPK_TRAIN": "rpn_post_nms_topk_train",
    "MODEL.RPN.NMS_THRESH": "rpn_nms_thresh",
    "MODEL.RPN.BATCH_SIZE_PER_IMAGE": "rpn_batch_size",
    "MODEL.RPN.POSITIVE_FRACTION": "rpn_positive_fraction",
    "MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE": "roi_batch_size",
    "MODEL.ROI_HEADS.POSITIVE_FRACTION": "roi_positive_fraction",
    "MODEL.ROI_HEADS.NUM_CLASSES": "num_classes",
    "MODEL.ROI_HEADS.SCORE_THRESH_TEST": "test_score_thresh",
    "MODEL.ROI_HEADS.NMS_THRESH_TEST": "test_nms_thresh",
    "MODEL.RESNETS.DEPTH": "depth",
    "INPUT.FS.SUPPORT_SHOT": "support_shot",
}
# Baseline yaml keys with no BaselineConfig analog (train-loop/runtime keys —
# the baseline pipeline exposes modeling knobs; the generic solver/input
# settings apply when training it).
BASELINE_IGNORED_PREFIXES = (
    "SOLVER.", "INPUT.MIN_SIZE", "INPUT.MAX_SIZE", "INPUT.FS.SUPPORT_WAY",
    "DATASETS.", "DATALOADER.", "MODEL.META_ARCHITECTURE",
    "MODEL.PROPOSAL_GENERATOR.NAME", "MODEL.ROI_HEADS.NAME",
    "MODEL.ROI_HEADS.IOU_THRESHOLDS", "MODEL.BACKBONE.FREEZE_AT",
    "MODEL.WEIGHTS", "VERSION", "OUTPUT_DIR",
)


def _flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "."))
        else:
            out[key] = v
    return out


def _deep_merge(base: Dict[str, Any], child: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(base)
    for k, v in child.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def load_merged_yaml(path: str) -> Dict[str, Any]:
    """Read a yaml and recursively resolve `_BASE_` (relative to the file,
    child keys win — CfgNode.merge_from_file semantics)."""
    with open(path) as f:
        tree = yaml.safe_load(f) or {}
    base_rel = tree.pop("_BASE_", None)
    if base_rel is not None:
        base = load_merged_yaml(os.path.join(os.path.dirname(path), base_rel))
        tree = _deep_merge(base, tree)
    return tree


def _parse_value(v: Any) -> Any:
    """yacs accepts python-literal strings for tuples, e.g. `STEPS: (10000,11000)`
    which yaml reads as a string — literal_eval those."""
    if isinstance(v, str):
        s = v.strip()
        if s[:1] in "([" :
            try:
                return ast.literal_eval(s)
            except (ValueError, SyntaxError):
                return v
    return v


def _coerce(cur: Any, value: Any) -> Any:
    """Recursively coerce `value` to the shape/type of the current field value
    (list→tuple incl. nested, int→float)."""
    if isinstance(cur, tuple):
        value = tuple(value) if isinstance(value, (list, tuple)) else (value,)
        elem = cur[0] if cur else None
        return tuple(_coerce(elem, v) for v in value)
    if isinstance(cur, bool):
        return bool(value)
    if isinstance(cur, float) and isinstance(value, int):
        return float(value)
    if cur is None and isinstance(value, list):
        return tuple(value)
    return value


def _set_path(obj: Any, path: str, value: Any) -> Any:
    head, _, rest = path.partition(".")
    if rest:
        return dataclasses.replace(obj, **{head: _set_path(getattr(obj, head), rest, value)})
    return dataclasses.replace(obj, **{head: _coerce(getattr(obj, head), value)})


def _config_from_flat(flat: Dict[str, Any]) -> Config:
    meta = flat.get("MODEL.META_ARCHITECTURE", "CenterNet2Detector")
    if meta != "CenterNet2Detector":
        raise ValueError(f"not a CenterNet2Detector yaml (META_ARCHITECTURE={meta!r})")

    roi_feats = _parse_value(flat.get("MODEL.ROI_HEADS.IN_FEATURES", ["p3", "p4", "p5"]))
    if tuple(roi_feats) != ("p3", "p4", "p5"):
        raise DeadReferenceConfigError(
            f"ROI_HEADS.IN_FEATURES={list(roi_feats)}: CenterNet2Detector hard-indexes "
            "features['p3'/'p4'/'p5'] (fsod_cen.py:202-213) — this configuration is "
            "dead in the reference too (PARITY.md: finetune_dla2.yaml / finetune_R_50_F.yaml)."
        )

    cfg = Config()
    builder = flat.get("MODEL.BACKBONE.NAME")
    if builder is not None:
        if builder not in BACKBONE_BUILDERS:
            raise KeyError(
                f"unknown BACKBONE.NAME {builder!r}; have {sorted(BACKBONE_BUILDERS)}"
            )
        cfg = cfg.replace(backbone_name=BACKBONE_BUILDERS[builder])

    for key, raw in flat.items():
        value = _parse_value(raw)
        if key == "DATASETS.TRAIN":
            cfg = cfg.replace(train_dataset=tuple(value)[0] if isinstance(value, (list, tuple)) else value)
        elif key == "DATASETS.TEST":
            cfg = cfg.replace(test_dataset=tuple(value)[0] if isinstance(value, (list, tuple)) else value)
        elif key in KEY_MAP:
            cfg = _set_path(cfg, KEY_MAP[key], value)
        elif key in IGNORED_KEYS:
            continue
        else:
            raise KeyError(f"unmapped config key {key!r} — add it to KEY_MAP or IGNORED_KEYS")
    return cfg


def _baseline_from_flat(flat: Dict[str, Any]):
    from .pipelines.attention_rpn import BaselineConfig

    cfg = BaselineConfig()
    for key, raw in flat.items():
        value = _parse_value(raw)
        if key in BASELINE_KEY_MAP:
            if key == "MODEL.ROI_HEADS.IOU_THRESHOLDS":
                value = value[0]
            cfg = dataclasses.replace(
                cfg, **{BASELINE_KEY_MAP[key]: _coerce(getattr(cfg, BASELINE_KEY_MAP[key]), value)}
            )
        elif any(key.startswith(p) or key == p.rstrip(".") for p in BASELINE_IGNORED_PREFIXES):
            continue
        else:
            raise KeyError(f"unmapped baseline config key {key!r}")
    return cfg


def load_yaml(path: str):
    """Dispatch on META_ARCHITECTURE: Config or BaselineConfig."""
    flat = _flatten(load_merged_yaml(path))
    meta = flat.get("MODEL.META_ARCHITECTURE", "CenterNet2Detector")
    if meta == "FsodRCNN":
        return _baseline_from_flat(flat)
    return _config_from_flat(flat)


def load_yaml_config(path: str) -> Config:
    """Load a CenterNet2Detector yaml into a `Config` (raises on FsodRCNN yamls)."""
    return _config_from_flat(_flatten(load_merged_yaml(path)))
