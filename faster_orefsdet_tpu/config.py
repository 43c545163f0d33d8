"""Typed configuration tree for the few-shot ore detector.

Replaces the reference's layered yacs config stack (detectron2 defaults →
fewx/config/defaults.py in-place extension → fewx/config/config.py get_cfg()
additions → YAML `_BASE_` inheritance → CLI overrides) with one frozen
dataclass tree carrying the same effective key set for the live path.

Defaults reproduce the *effective* configuration of the published model
(configs/fsod/finetune_vovnet.yaml resolved against Base-FSOD-C4.yaml and the
code defaults; confirmed against the golden eval log config dump,
log/fsod_finetune_stone_vovnet_25_test_log.txt:20-547).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Sequence, Tuple


@dataclass(frozen=True)
class VoVNetConfig:
    """Backbone spec. Reference: detectron2.7z!modeling/backbone/vovnet.py:50-58
    (V-19-slim-eSE stage spec) and fewx/config/defaults.py:63-73."""

    conv_body: str = "V-19-slim-eSE"
    out_features: Tuple[str, ...] = ("stage3", "stage4", "stage5")
    norm: str = "FrozenBN"
    freeze_at: int = 3  # freeze stem + stage2 + stage3 (vovnet.py:455-469)


@dataclass(frozen=True)
class FPNConfig:
    """Reference: detectron2.7z!modeling/backbone/fpn.py + finetune_vovnet.yaml:13-15."""

    in_features: Tuple[str, ...] = ("stage3", "stage4", "stage5")
    out_channels: int = 128
    fuse_type: str = "sum"
    top_levels: int = 0  # MODEL.FCOS.TOP_LEVELS: 0 → pure P3-P5
    # BiFPN-only (bifpn_fcos.py:423-440 + fewx/config/cfg.py:57-62):
    # GN on lateral/output convs; output convs lose their bias under a norm.
    bifpn_norm: str = "GN"
    bifpn_repeats: int = 4  # BIFPN.NUM_BIFPN (finetune_dla.yaml:18)


@dataclass(frozen=True)
class DLAConfig:
    """DLA-34 bottom-up for the BiFPN family. Reference:
    detectron2.7z!modeling/backbone/dlafpn.py:395-400 (dla34) with
    fewx/config/cfg.py:65-71 defaults; finetune_dla.yaml sets NORM:"BN"
    (trainable BatchNorm — the DLA configs do NOT freeze their norm, and
    FREEZE_AT is a no-op for the dla builders)."""

    num_layers: int = 34
    norm: str = "BN"  # "BN" (trainable, batch_stats collection) | "FrozenBN"


@dataclass(frozen=True)
class CenterNetConfig:
    """CenterNet proposal generator. Reference: fewx/modeling/fsod/fsod_rpn.py:491-641
    with effective values from finetune_vovnet.yaml:37-56 over
    fewx/config/config.py:12-52 defaults."""

    num_classes: int = 1
    in_features: Tuple[str, ...] = ("p3", "p4", "p5")
    fpn_strides: Tuple[int, ...] = (8, 16, 32)
    sizes_of_interest: Tuple[Tuple[int, int], ...] = ((0, 64), (48, 192), (128, 1000000))
    score_thresh: float = 1e-5  # INFERENCE_TH
    hm_min_overlap: float = 0.8
    min_radius: int = 4
    hm_focal_alpha: float = 0.25
    hm_focal_beta: float = 4.0
    loss_gamma: float = 2.0
    reg_weight: float = 1.0
    not_norm_reg: bool = True
    with_agn_hm: bool = True
    only_proposal: bool = True
    pos_weight: float = 0.5
    neg_weight: float = 0.5
    sigmoid_clamp: float = 1e-4
    ignore_high_fp: float = 0.85
    loc_loss_type: str = "giou"
    more_pos: bool = False
    more_pos_thresh: float = 0.2
    more_pos_topk: int = 9
    not_nms: bool = False
    pre_nms_topk_train: int = 4000
    post_nms_topk_train: int = 2000
    pre_nms_topk_test: int = 1000
    post_nms_topk_test: int = 256
    nms_thresh_train: float = 0.9
    nms_thresh_test: float = 0.6
    # TPU impl choice (no reference analog): run proposal NMS as the Pallas
    # VMEM-resident kernel (ops/pallas_nms.py) instead of the XLA fixpoint.
    # Identical results (equivalence-tested); TPU-only, so default off.
    use_pallas_nms: bool = False
    # Head (CenterNet2/centernet/modeling/dense_heads/centernet_head.py:21-121)
    norm: str = "GN"
    num_cls_convs: int = 1
    num_box_convs: int = 1
    num_share_convs: int = 0
    prior_prob: float = 0.01


@dataclass(frozen=True)
class ROIConfig:
    """Cascade ROI heads. Reference: fewx/modeling/fsod/fsod_roi_heads.py:282-520 and
    modified detectron2.7z!modeling/roi_heads/{roi_heads.py:534-614,cascade_rcnn.py:86-146},
    effective values from the golden log dump (ROI_* blocks)."""

    in_features: Tuple[str, ...] = ("p3", "p4", "p5")
    num_classes: int = 1
    # Cascade: 1 stage in the live config.
    cascade_ious: Tuple[float, ...] = (0.6,)
    cascade_bbox_reg_weights: Tuple[Tuple[float, float, float, float], ...] = (
        (10.0, 10.0, 5.0, 5.0),
    )
    pooler_resolution: int = 8
    pooler_resolution2: int = 4
    pooler_sampling_ratio: int = 0  # 0 = adaptive (exact ROIAlignV2 semantics, ops/roi_align.py)
    canonical_box_size: int = 224
    canonical_level: int = 4
    batch_size_per_image: int = 128
    positive_fraction: float = 0.5
    proposal_append_gt: bool = True
    fc_dim: int = 128  # fc1: 8192 -> 128 (log :741)
    score_thresh_test: float = 0.0
    nms_thresh_test: float = 0.9
    detections_per_image: int = 100
    # TPU impl choice (see CenterNetConfig.use_pallas_nms)
    use_pallas_nms: bool = False
    mult_proposal_score: bool = False
    # Effectively OFF at eval: the second _forward_box definition
    # (fsod_roi_heads.py:404) overrides the first (:316) and never multiplies.
    cls_agnostic_bbox_reg: bool = True
    smooth_l1_beta: float = 0.0


@dataclass(frozen=True)
class FewShotConfig:
    """INPUT.FS.* — fewx/config/defaults.py:13-16 + finetune_vovnet.yaml:62-65."""

    few_shot: bool = False
    support_way: int = 1
    support_shot: int = 24
    support_crop_size: int = 240  # dataset_mapper.py:209


@dataclass(frozen=True)
class InputConfig:
    """INPUT.* — Base-FSOD-C4.yaml + finetune_vovnet.yaml:66-71."""

    min_size_train: Tuple[int, ...] = (200, 240, 280, 320, 360, 400, 440)
    max_size_train: int = 1000
    min_size_test: int = 320
    max_size_test: int = 1000
    format: str = "BGR"
    # detectron2 ImageNet BGR pixel stats (detectron2.7z!config/defaults.py)
    pixel_mean: Tuple[float, float, float] = (103.530, 116.280, 123.675)
    pixel_std: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    # Canvas divisibility for every QUERY canvas (loader, serving, demo,
    # AsyncPredictor; round 5 — was a dead knob). Must be a positive
    # multiple of 32: the FPN's deepest level is stride 32, so smaller
    # values break the feature-pyramid shape contract. (The 240→256
    # support-crop canvas is a fixed architecture contract, not governed
    # by this knob.)
    size_divisibility: int = 32
    random_flip: bool = True

    def __post_init__(self):
        if self.size_divisibility < 32 or self.size_divisibility % 32:
            raise ValueError(
                f"size_divisibility={self.size_divisibility}: must be a "
                "positive multiple of 32 (FPN stride contract)"
            )


@dataclass(frozen=True)
class SolverConfig:
    """SOLVER.* — finetune_vovnet.yaml:57-61 + fewx/solver/build.py:93-167."""

    ims_per_batch: int = 1
    base_lr: float = 0.001
    momentum: float = 0.9
    nesterov: bool = False
    weight_decay: float = 1e-4
    weight_decay_norm: float = 0.0
    bias_lr_factor: float = 1.0
    head_lr_factor: float = 2.0  # Base-FSOD-C4.yaml:26 (box_predictor 2x LR)
    steps: Tuple[int, ...] = (10000, 11000)
    gamma: float = 0.1
    max_iter: int = 12000
    # "WarmupMultiStepLR" (live path) | "WarmupCosineLR"
    # (fewx/solver/build.py:142-167)
    lr_scheduler_name: str = "WarmupMultiStepLR"
    warmup_iters: int = 500
    warmup_factor: float = 0.00025
    warmup_method: str = "linear"  # "linear" | "constant" (lr_scheduler.py:212-238)
    checkpoint_period: int = 100
    clip_gradients: bool = True
    clip_type: str = "value"  # "value" (d2 default) | "norm" (build.py:14-36)
    clip_value: float = 1.0
    norm_type: float = 2.0  # p-norm for clip_type="norm" (build.py:26-27)


@dataclass(frozen=True)
class StaticShapeConfig:
    """TPU-specific static-shape budget (no reference analog; replaces dynamic
    candidate counts with masked fixed-K tensors, SURVEY.md §7 hard parts)."""

    max_gt_per_image: int = 100
    # NMS working-set cap at test time (candidates entering suppression),
    # threaded into decode_proposals by the inference builders (round 5 —
    # previously decode hardcoded 1024 and this knob was silently dead).
    # Measured on v5e: 2048 -> 894 img/s, 1024 -> 934, 512 -> 950 pure
    # compute; 1024 keeps a comfortable margin over the 256 post-NMS keep.
    # (The per-level pre-concat cap is CenterNetConfig.pre_nms_topk_test.)
    nms_budget_test: int = 1024
    train_canvas: Tuple[int, ...] = (448,)  # square train canvas buckets
    # (the test canvas is DERIVED from the eval records — data/loader.py
    # eval_canvas — not configured; a test_canvas knob here was dead and
    # was removed in round 5)


@dataclass(frozen=True)
class Config:
    model_name: str = "CenterNet2Detector"
    # Backbone+neck family feeding the CenterNet2 head:
    #   "vovnet_fpn"  — V-19-slim-eSE + FPN (the published live model)
    #   "dla_bifpn"   — DLA-34 + BiFPN (finetune_dla.yaml,
    #                   build_p35_fcos_dla_bifpn_backbone)
    #   "mnv3_fpn"    — MobileNetV3-small + FPN
    #                   (build_mobilenetV3small_fpn_backbone)
    #   "resnet_fpn"  — ResNet-50 + FPN P3-P5 (fpn_p5.py
    #                   build_p35_resnet_fpn_backbone)
    backbone_name: str = "vovnet_fpn"
    # Computation dtype for the conv/matmul-heavy modules (params stay f32;
    # box decode, NMS and losses always run f32). "bfloat16" doubles MXU
    # throughput and halves HBM traffic; default f32 for exact parity tests.
    compute_dtype: str = "float32"
    # Post-training quantization for serving: "none" | "int8" (W8A8 symmetric,
    # per-out-channel weights / dynamic per-example activations, int32 MXU
    # accumulation — ops/quant.py) | "int8_static" (same weights path, but
    # activation scales are CALIBRATED constants — pipelines/quant_calib.py —
    # so no in-program abs-max reductions; builders then require act_scales=).
    # Plumbed for the vovnet_fpn family's dense convs (backbone + FPN);
    # params stay f32 so checkpoints are unchanged.
    quantize: str = "none"
    # Serve the CGM correlation + conv3 projection through the fused Pallas
    # VMEM kernel (ops/pallas_cgm.py) instead of the XLA composition — the
    # stencil chain, residual and 2C->C projection run in one kernel with a
    # single HBM read/write per level. A/B'd per model size (RESULTS.md);
    # levels too large for VMEM fall back to XLA automatically.
    use_pallas_cgm: bool = False
    vovnet: VoVNetConfig = field(default_factory=VoVNetConfig)
    dla: DLAConfig = field(default_factory=DLAConfig)
    fpn: FPNConfig = field(default_factory=FPNConfig)
    centernet: CenterNetConfig = field(default_factory=CenterNetConfig)
    roi: ROIConfig = field(default_factory=ROIConfig)
    fs: FewShotConfig = field(default_factory=FewShotConfig)
    input: InputConfig = field(default_factory=InputConfig)
    solver: SolverConfig = field(default_factory=SolverConfig)
    static: StaticShapeConfig = field(default_factory=StaticShapeConfig)
    train_dataset: str = "coco_2017_train_stone"
    test_dataset: str = "coco_2017_val_stone"
    # in-training eval cadence (d2 TEST.EVAL_PERIOD / EvalHook,
    # engine/defaults.py:461); 0 = off, matching the reference which ships
    # with EVAL_PERIOD commented out (finetune_vovnet.yaml:73). The CLI
    # --eval-period flag overrides this.
    eval_period: int = 0
    output_dir: str = "./output/fsod/vovnet_25shot"
    seed: int = 0

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def finetune_vovnet_25shot() -> Config:
    """The published model configuration (configs/fsod/finetune_vovnet.yaml)."""
    return Config()


def finetune_vovnet_kshot(shot: int) -> Config:
    cfg = Config()
    return cfg.replace(fs=dataclasses.replace(cfg.fs, support_shot=shot))


def finetune_r50_c4_1x() -> Config:
    """configs/fsod/finetune_R_50_C4_1x.yaml: CenterNet2Detector over
    ResNet-50 + FPN (res3-res5 → P3-P5). The yaml shrinks the main ROI
    pooler to 4x4 (ROI_BOX_HEAD.POOLER_RESOLUTION: 4; pooler2 stays 4,
    fewx/config/config.py:66), runs 9-shot support, and steps the LR at
    (10000, 12000)."""
    cfg = Config(backbone_name="resnet_fpn", output_dir="./output/fsod/r50")
    return cfg.replace(
        roi=dataclasses.replace(cfg.roi, pooler_resolution=4),
        fpn=dataclasses.replace(cfg.fpn, in_features=("res3", "res4", "res5")),
        fs=dataclasses.replace(cfg.fs, support_shot=9),
        solver=dataclasses.replace(cfg.solver, steps=(10000, 12000)),
    )


def finetune_dla() -> Config:
    """configs/fsod/finetune_dla.yaml: CenterNet2Detector over DLA-34 +
    BiFPN (160 channels, build_p35_fcos_dla_bifpn_backbone), 7x7 main ROI
    pooler, final-NMS 0.9 also for the proposal stage (NMS_TH_TEST: 0.9),
    9-shot support, LR steps (10000, 12000), 12100 iters."""
    cfg = Config(backbone_name="dla_bifpn", output_dir="./output/fsod/dla")
    return cfg.replace(
        fpn=dataclasses.replace(
            cfg.fpn, out_channels=160, in_features=("dla3", "dla4", "dla5")
        ),
        roi=dataclasses.replace(cfg.roi, pooler_resolution=7),
        centernet=dataclasses.replace(cfg.centernet, nms_thresh_test=0.9),
        fs=dataclasses.replace(cfg.fs, support_shot=9),
        solver=dataclasses.replace(cfg.solver, steps=(10000, 12000), max_iter=12100),
    )


def serving_vovnet() -> Config:
    """TPU serving preset: the published finetune_vovnet model with the
    serving knobs on — bf16 compute + Pallas VMEM NMS (no reference analog;
    numerics equivalence-tested, RESULTS.md round-2 tables)."""
    cfg = finetune_vovnet_25shot().replace(
        compute_dtype="bfloat16",
        # fused VMEM CGM: +1.9% (parity budgets) / +2.8% (fast preset) at
        # batch 128, 100% box agreement (tools/cgm_ab.py, RESULTS.md r4)
        use_pallas_cgm=True,
    )
    return cfg.replace(
        centernet=dataclasses.replace(cfg.centernet, use_pallas_nms=True),
        roi=dataclasses.replace(cfg.roi, use_pallas_nms=True),
    )


def serving_vovnet_fast() -> Config:
    """serving_vovnet + post_nms_topk_test=64: the round-3 proposal-budget
    ablation measured AP-NEUTRAL accuracy at 1/4 the ROI budget (1060-image
    synthetic val, 24-shot: AP 65.1 @64 vs 64.7 @256) for 1.75x serving
    throughput (3613 vs 2059 img/s at batch 128 — the ROI stage is the
    serving floor, RESULTS.md round-3). The published budget (256,
    fsod_rpn.py:1199-1206) remains the default elsewhere for strict parity;
    AP-neutrality is established on the synthetic protocol — re-check on
    real data before production use."""
    cfg = serving_vovnet()
    return cfg.replace(
        centernet=dataclasses.replace(cfg.centernet, post_nms_topk_test=64),
    )


def serving_vovnet_int8() -> Config:
    """serving_vovnet_fast + W8A8 int8 quantization of the backbone+FPN convs
    (ops/quant.py). TPU v5e runs int8 on the MXU at 2x the bf16 peak; AP delta
    vs the bf16 preset is measured on the synthetic val protocol
    (tests/test_quant.py, RESULTS.md round-3). Params stay f32 — the same
    converted checkpoint serves all presets."""
    return serving_vovnet_fast().replace(quantize="int8")


def serving_vovnet_int8_static() -> Config:
    """serving_vovnet_fast + STATIC-calibrated W8A8 int8 (ops/quant.py +
    pipelines/quant_calib.py): activation scales measured once on a
    calibration batch and baked into the program, removing the dynamic
    abs-max reduction passes that made the dynamic-int8 preset 35% slower.
    Measured (RESULTS.md round-4 A/B): AP-neutral and recovers the whole
    dynamic penalty (2,372 → 3,674 img/s at batch 128) but only TIES the
    bf16 fast preset (+1%, within session noise) — the per-conv dequant
    boundaries keep materialized intermediates at bf16 width, so PTQ
    insertion does not reduce the HBM-roofline-bound path's traffic
    (RESULTS.md reconciliation, round 5). Serve bf16 for speed; this
    preset exists for memory-constrained deployments.
    Builders require act_scales= (calibrate_act_scales)."""
    return serving_vovnet_fast().replace(quantize="int8_static")


def serving_vovnet_turbo() -> Config:
    """serving_vovnet_fast + halved decode candidate budgets (round 5):
    pre_nms_topk_test 1000→256 (per-level top-k; p3's cap dominates the
    decode top-k cost) and nms_budget_test 1024→512 (the suppression
    working set). Both measured AP-NEUTRAL on the synthetic 512-image
    protocol against the SAME trained model (tools/resident_ap_ab.py,
    RESULTS.md round 5: deltas <0.005 AP) — the final detections come from
    the top-64 ROI boxes, which deep-tail candidates essentially never
    displace. TPU speed A/B vs the fast preset is staged in the round-5
    queue; AP-neutrality should be re-checked on real ore data before
    production (same caveat as the fast preset). Reference budgets being
    cut: fsod_rpn.py:1157-1210 (per-level topk 1000 + full-set NMS)."""
    import dataclasses as _dc

    cfg = serving_vovnet_fast()
    return cfg.replace(
        centernet=_dc.replace(cfg.centernet, pre_nms_topk_test=256),
        static=_dc.replace(cfg.static, nms_budget_test=512),
    )


def serving_vovnet_int8_resident() -> Config:
    """serving_vovnet_fast + int8-RESIDENT backbone (round 5): the VoVNet
    stem/OSA conv chains flow int8 tensors end-to-end — each conv's epilogue
    fuses dequant+FrozenBN+relu+requant and WRITES int8, and the OSA concat
    happens in int8 with per-branch scales folded into the aggregation
    conv's weights (ops.quant.QTensor/qconcat, models.layers.ConvNorm
    resident path). This is the structural fix for why int8_static only
    tied bf16: there every conv dequantized to the wide compute dtype and
    the concat materialized wide (RESULTS.md round-5 reconciliation —
    backbone bytes 325 MB/img static vs 287 bf16). The FPN keeps the
    int8_static scheme (float stage-output inputs).
    Builders require act_scales= calibrated WITH THIS config (the resident
    scale set adds OSA-input and conv-OUTPUT keys)."""
    return serving_vovnet_fast().replace(quantize="int8_resident")


_NAMED_CONFIGS = {
    "finetune_vovnet": finetune_vovnet_25shot,
    "serving_vovnet": serving_vovnet,
    "serving_vovnet_fast": serving_vovnet_fast,
    "serving_vovnet_int8": serving_vovnet_int8,
    "serving_vovnet_int8_static": serving_vovnet_int8_static,
    "serving_vovnet_int8_resident": serving_vovnet_int8_resident,
    "serving_vovnet_turbo": serving_vovnet_turbo,
    "finetune_vovnet_25shot": finetune_vovnet_25shot,
    "finetune_vovnet_5shot": lambda: finetune_vovnet_kshot(5),
    "finetune_vovnet_15shot": lambda: finetune_vovnet_kshot(15),
    "finetune_R_50_C4_1x": finetune_r50_c4_1x,
    "finetune_dla": finetune_dla,
    # The AttentionRPN baseline (Base-FSOD-C4.yaml / FsodRCNN) uses its own
    # config type: pipelines.attention_rpn.BaselineConfig.
}


def get_config(name: str = "finetune_vovnet") -> Config:
    try:
        return _NAMED_CONFIGS[name]()
    except KeyError:
        raise KeyError(f"unknown config '{name}'; have {sorted(_NAMED_CONFIGS)}")


def apply_overrides(cfg: Config, overrides: Sequence[str]) -> Config:
    """CLI `key=value` overrides with dotted paths, e.g. `fs.support_shot=5`.

    Replaces the reference's `--opts KEY VALUE` mechanism (fsod_train_net.py:81-83).
    """
    import ast

    def set_path(obj: Any, path: Sequence[str], value: Any) -> Any:
        name = path[0]
        if not hasattr(obj, name):
            raise KeyError(f"config has no field {'.'.join(path)}")
        if len(path) == 1:
            cur = getattr(obj, name)
            if cur is not None and not isinstance(value, type(cur)):
                if isinstance(cur, bool) and isinstance(value, str):
                    # yacs-style lowercase bools ("key=true") don't
                    # literal_eval; a leftover string would be truthy even
                    # for "false"
                    low = value.strip().lower()
                    if low in ("true", "1", "yes"):
                        value = True
                    elif low in ("false", "0", "no"):
                        value = False
                    else:
                        raise ValueError(f"{'.'.join(path)}: not a bool: {value!r}")
                elif isinstance(cur, bool) and isinstance(value, int):
                    # "key=1" literal_evals to int; store a real bool so
                    # config equality/serialization stay well-typed
                    if value in (0, 1):
                        value = bool(value)
                    else:
                        raise ValueError(f"{'.'.join(path)}: not a bool: {value!r}")
                elif isinstance(cur, tuple) and isinstance(value, (list, tuple)):
                    value = tuple(value)
                elif isinstance(cur, float) and isinstance(value, int):
                    value = float(value)
            return dataclasses.replace(obj, **{name: value})
        return dataclasses.replace(obj, **{name: set_path(getattr(obj, name), path[1:], value)})

    for ov in overrides:
        key, _, raw = ov.partition("=")
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw
        cfg = set_path(cfg, key.strip().split("."), value)
    return cfg
