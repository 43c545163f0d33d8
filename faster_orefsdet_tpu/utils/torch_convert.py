"""Torch checkpoint → flax param-tree conversion.

Converts the reference's released weights (model_final.pth — a torch
state_dict of the CenterNet2Detector whose exact module tree is dumped in
log/fsod_finetune_stone_vovnet_25_test_log.txt:548-805) into this framework's
parameter pytree. Key transformations:

  conv   [O,I,kh,kw]  → HWIO [kh,kw,I,O]
  linear [O,I]        → [I,O]
  FrozenBatchNorm     → folded affine: scale = w/sqrt(var+eps),
                        bias = b - mean*scale
  roi box-head fc1    → input-permuted: torch flattens CHW (c*64+h*8+w),
                        ours flattens HWC (h*8C+w*C+c)
  dead params dropped → roi fc2/fc3 (fsod_roi_heads.py:515-516 compute is
                        discarded), meta-arch conv1/conv2 (commented-out
                        branch, fsod_cen.py:244)

Accepts either a raw state_dict or a d2 checkpoint dict with a "model" key.
Works without torch installed if given a dict of numpy arrays.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _np(t):
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _conv(sd, key):
    return np.transpose(_np(sd[key + ".weight"]), (2, 3, 1, 0))


def _linear(sd, key):
    return np.transpose(_np(sd[key + ".weight"]), (1, 0))


def _frozen_bn(sd, key, eps=1e-5):
    w = _np(sd[key + ".weight"])
    b = _np(sd[key + ".bias"])
    mean = _np(sd[key + ".running_mean"])
    var = _np(sd[key + ".running_var"])
    scale = w / np.sqrt(var + eps)
    return {"scale": scale, "bias": b - mean * scale}


def _conv_unit(sd, prefix, unit):
    """conv+FrozenBN pair named `<unit>/conv`, `<unit>/norm`."""
    return {
        "conv": {"kernel": _conv(sd, f"{prefix}.{unit}/conv")},
        "norm": _frozen_bn(sd, f"{prefix}.{unit}/norm"),
    }


def _dense(sd, key):
    out = {"kernel": _linear(sd, key)}
    if key + ".bias" in sd:
        out["bias"] = _np(sd[key + ".bias"])
    return out


def _conv_b(sd, key):
    out = {"kernel": _conv(sd, key)}
    if key + ".bias" in sd:
        out["bias"] = _np(sd[key + ".bias"])
    return out


def _dense_from_1x1_conv(sd, key):
    """torch Conv2d(I,O,1) → flax Dense: weight [O,I,1,1] → [I,O]."""
    w = _np(sd[key + ".weight"])[:, :, 0, 0]
    out = {"kernel": np.transpose(w, (1, 0))}
    if key + ".bias" in sd:
        out["bias"] = _np(sd[key + ".bias"])
    return out


def _fc1_permuted(sd, key, c: int, p: int):
    """Box-head fc1: reorder input rows from torch CHW-flatten to HWC-flatten."""
    w = _np(sd[key + ".weight"])  # [O, C*P*P] with index c*P*P + h*P + w
    o = w.shape[0]
    w = w.reshape(o, c, p, p)  # [O, C, H, W]
    w = np.transpose(w, (0, 2, 3, 1)).reshape(o, p * p * c)  # [O, HWC]
    return {"kernel": np.transpose(w, (1, 0)), "bias": _np(sd[key + ".bias"])}


def _vip(sd, prefix):
    return {
        "mlp_h": {"kernel": _linear(sd, f"{prefix}.mlp_h")},
        "mlp_w": {"kernel": _linear(sd, f"{prefix}.mlp_w")},
        "reweight_fc1": _dense(sd, f"{prefix}.reweighting.fc1"),
        "reweight_fc2": _dense(sd, f"{prefix}.reweighting.fc2"),
        "proj": _dense(sd, f"{prefix}.proj"),
    }


def convert_torch_checkpoint(
    state_dict: Dict,
    conv_body: str = "V-19-slim-eSE",
    num_stages: int = 1,
) -> Dict:
    """Returns the flax 'params' tree for CenterNet2Detector."""
    from ..models.vovnet import VOVNET_STAGE_SPECS

    sd = state_dict.get("model", state_dict)
    _, _, _, layer_per_block, blocks, _ = VOVNET_STAGE_SPECS[conv_body]

    bu = "backbone.bottom_up"
    backbone: Dict = {}
    for i, unit in enumerate(["stem_1", "stem_2", "stem_3"]):
        backbone[f"stem{i + 1}"] = _conv_unit(sd, f"{bu}.stem", unit)
    for si in range(4):
        stage = si + 2
        for b in range(blocks[si]):
            mod = f"OSA{stage}_{b + 1}"
            prefix = f"{bu}.stage{stage}.{mod}"
            entry: Dict = {}
            for li in range(layer_per_block):
                entry[f"layer{li}"] = _conv_unit(sd, f"{prefix}.layers.{li}", f"{mod}_{li}")
            entry["concat"] = _conv_unit(sd, f"{prefix}.concat", f"{mod}_concat")
            entry["ese"] = {"fc": _conv_b(sd, f"{prefix}.ese.fc")}
            backbone[f"stage{stage}_block{b}"] = entry

    fpn: Dict = {}
    for s in (3, 4, 5):
        fpn[f"lateral{s}"] = _conv_b(sd, f"backbone.fpn_lateral{s}")
        fpn[f"output{s}"] = _conv_b(sd, f"backbone.fpn_output{s}")

    hd = "proposal_generator.centernet_head"
    head: Dict = {}
    # bbox_tower: Sequential [conv, GN, ReLU] repeated
    j = 0
    ti = 0
    while f"{hd}.bbox_tower.{ti}.weight" in sd:
        head[f"bbox_tower{j}"] = _conv_b(sd, f"{hd}.bbox_tower.{ti}")
        head[f"bbox_tower{j}_gn"] = {
            "scale": _np(sd[f"{hd}.bbox_tower.{ti + 1}.weight"]),
            "bias": _np(sd[f"{hd}.bbox_tower.{ti + 1}.bias"]),
        }
        j += 1
        ti += 3
    head["bbox_pred"] = _conv_b(sd, f"{hd}.bbox_pred")
    head["agn_hm"] = _conv_b(sd, f"{hd}.agn_hm")
    si = 0
    while f"{hd}.scales.{si}.scale" in sd:
        head[f"scale{si}"] = {"scale": _np(sd[f"{hd}.scales.{si}.scale"])}
        si += 1

    rh = "roi_heads"
    roi: Dict = {
        "dsa_conv1": _dense_from_1x1_conv(sd, f"{rh}.conv1"),
        "dsa_conv2": _dense_from_1x1_conv(sd, f"{rh}.conv2"),
        "dsa_conv3": _dense_from_1x1_conv(sd, f"{rh}.conv3"),
    }
    for st in range(num_stages):
        c = _np(sd[f"{rh}.conv3.weight"]).shape[0]  # FPN channels
        roi[f"stage{st}_fc1"] = _fc1_permuted(sd, f"{rh}.box_head.{st}.fc1", c, 8)
        roi[f"stage{st}_cls"] = _dense(sd, f"{rh}.box_predictor.{st}.cls_score")
        roi[f"stage{st}_bbox"] = _dense(sd, f"{rh}.box_predictor.{st}.bbox_pred")

    params = {
        "backbone": backbone,
        "fpn": fpn,
        "head": head,
        "roi": roi,
        "vip_p3": _vip(sd, "vip_p3"),
        "vip_p4": _vip(sd, "vip_p4"),
        "vip_p5": _vip(sd, "vip_p5"),
        "cgm_conv3": _dense_from_1x1_conv(sd, "conv3"),
    }
    return _to_jax(params)


def _to_jax(tree):
    import jax.numpy as jnp

    if isinstance(tree, dict):
        return {k: _to_jax(v) for k, v in tree.items()}
    return jnp.asarray(tree)


def load_torch_pth(path: str) -> Dict:
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def convert_torchvision_resnet(state_dict: Dict, depth: int = 50) -> Dict:
    """torchvision ResNet state_dict → ResNetC4 param tree (stem + res2-res4)
    plus the detached res5 stage — the tool/convert-torchvision-to-d2.py
    analog. Use stride_in_1x1=False on the model when loading these weights
    (torchvision places the stride on the 3x3 conv)."""
    from ..models.resnet import RESNET_DEPTH_SPECS

    sd = state_dict.get("model", state_dict)
    blocks = RESNET_DEPTH_SPECS[depth]

    def conv_bn(conv_key, bn_key):
        return {
            "conv": {"kernel": _conv(sd, conv_key)},
            "norm": _frozen_bn(sd, bn_key),
        }

    tree: Dict = {"stem": conv_bn("conv1", "bn1")}
    stage_names = ["res2", "res3", "res4", "res5"]
    for si, layer in enumerate(["layer1", "layer2", "layer3", "layer4"]):
        stage: Dict = {}
        for b in range(blocks[si]):
            p = f"{layer}.{b}"
            entry = {
                "conv1": conv_bn(f"{p}.conv1", f"{p}.bn1"),
                "conv2": conv_bn(f"{p}.conv2", f"{p}.bn2"),
                "conv3": conv_bn(f"{p}.conv3", f"{p}.bn3"),
            }
            if f"{p}.downsample.0.weight" in sd:
                entry["shortcut"] = conv_bn(f"{p}.downsample.0", f"{p}.downsample.1")
            stage[f"block{b}"] = entry
        tree[stage_names[si]] = stage
    return _to_jax(tree)
