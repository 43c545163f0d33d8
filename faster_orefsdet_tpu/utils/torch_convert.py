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


def _norm_pair(sd, key, norm: str, eps=1e-5):
    """Torch norm layer at `key` → (params subtree, batch_stats subtree|None).

    norm="BN" keeps the affine under "bn" and running stats in the
    batch_stats collection; "FrozenBN" folds to the affine FrozenBatchNorm
    under "norm" (models/dla.py naming)."""
    if norm == "BN":
        p = {"bn": {"scale": _np(sd[key + ".weight"]),
                    "bias": _np(sd[key + ".bias"])}}
        s = {"bn": {"mean": _np(sd[key + ".running_mean"]),
                    "var": _np(sd[key + ".running_var"])}}
        return p, s
    return {"norm": _frozen_bn(sd, key, eps)}, None


def _merge_stats(dst, key, stats):
    if stats is not None:
        dst[key] = stats


def convert_dla_bifpn_backbone(
    state_dict: Dict,
    num_layers: int = 34,
    norm: str = "BN",
    bifpn_repeats: int = 4,
    out_channels: int = 160,
) -> Tuple[Dict, Dict]:
    """Reference DLA-34+BiFPN checkpoint (CenterNet2_DLA-BiFPN-P3_4x.pth init
    of finetune_dla.yaml; module tree per detectron2.7z!modeling/backbone/
    dlafpn.py:189-253 under `backbone.bottom_up.backbone` and
    bifpn_fcos.py:152-190 under `backbone.repeated_bifpn.{r}`) →
    ({"backbone": ..., "fpn": ...} params, batch_stats or None).

    Merge the params into a full detector tree with utils.params.merge_params;
    batch_stats is {"backbone": ...} when norm="BN" (trainable BatchNorm),
    None for FrozenBN folding."""
    from ..models.dla import DLA_SPECS

    sd = state_dict.get("model", state_dict)
    levels, channels = DLA_SPECS[num_layers]
    bp = "backbone.bottom_up.backbone"

    def conv_norm(tconv, tnorm):
        p, s = _norm_pair(sd, tnorm, norm)
        return {"conv": {"kernel": _conv(sd, tconv)}, **p}, s

    def basic_block(tp):
        """BasicBlock (dlafpn.py:36-64): conv1/bn1 + conv2/bn2."""
        p1, s1 = conv_norm(f"{tp}.conv1", f"{tp}.bn1")
        p2, s2 = conv_norm(f"{tp}.conv2", f"{tp}.bn2")
        params = {"conv1": p1, "conv2": p2}
        stats: Dict = {}
        _merge_stats(stats, "conv1", s1)
        _merge_stats(stats, "conv2", s2)
        return params, (stats or None)

    def tree(tp, lv, c_in, c_out):
        """Tree (dlafpn.py:131-186): tree1/tree2 (+project, +root at lv==1)."""
        params: Dict = {}
        stats: Dict = {}
        if c_in != c_out:
            pp, ps = conv_norm(f"{tp}.project.0", f"{tp}.project.1")
            params["project"] = pp
            _merge_stats(stats, "project", ps)
        if lv == 1:
            for name in ("tree1", "tree2"):
                bp_, bs = basic_block(f"{tp}.{name}")
                params[name] = bp_
                _merge_stats(stats, name, bs)
            rp, rs = conv_norm(f"{tp}.root.conv", f"{tp}.root.bn")
            params["root"] = {"conv": rp}
            if rs is not None:
                stats["root"] = {"conv": rs}
        else:
            t1p, t1s = tree(f"{tp}.tree1", lv - 1, c_in, c_out)
            t2p, t2s = tree(f"{tp}.tree2", lv - 1, c_out, c_out)
            params["tree1"], params["tree2"] = t1p, t2p
            _merge_stats(stats, "tree1", t1s)
            _merge_stats(stats, "tree2", t2s)
        return params, (stats or None)

    backbone: Dict = {}
    bstats: Dict = {}
    p, s = conv_norm(f"{bp}.base_layer.0", f"{bp}.base_layer.1")
    backbone["base"] = p
    _merge_stats(bstats, "base", s)
    for li, n_convs in enumerate(levels[:2]):
        for i in range(n_convs):
            p, s = conv_norm(f"{bp}.level{li}.{3 * i}", f"{bp}.level{li}.{3 * i + 1}")
            backbone[f"level{li}_{i}"] = p
            _merge_stats(bstats, f"level{li}_{i}", s)
    c_in = channels[1]
    for si in range(2, 6):
        p, s = tree(f"{bp}.level{si}", levels[si], c_in, channels[si])
        backbone[f"level{si}"] = p
        _merge_stats(bstats, f"level{si}", s)
        c_in = channels[si]

    # ---- BiFPN cells (GN is stateless — params only)
    from ..models.bifpn import NODES_3LEVEL

    fpn: Dict = {}
    in_ch = tuple(channels[3:6])  # dla3/4/5
    for r in range(bifpn_repeats):
        tp = f"backbone.repeated_bifpn.{r}"
        cell: Dict = {}
        node_ch = list(in_ch if r == 0 else (out_channels,) * 3)
        for feat_level, offsets in NODES_3LEVEL:
            for off in offsets:
                lname = f"lateral_{off}_f{feat_level}"
                if node_ch[off] != out_channels and lname not in cell:
                    cell[lname] = {
                        "conv": _conv_b(sd, f"{tp}.{lname}"),
                        "gn": {"scale": _np(sd[f"{tp}.{lname}.norm.weight"]),
                               "bias": _np(sd[f"{tp}.{lname}.norm.bias"])},
                    }
            suffix = f"f{feat_level}_" + "_".join(map(str, offsets))
            cell[f"weights_{suffix}"] = _np(sd[f"{tp}.weights_{suffix}"])
            cell[f"output_{suffix}"] = {
                "conv": {"kernel": _conv(sd, f"{tp}.outputs_{suffix}")},
                "gn": {"scale": _np(sd[f"{tp}.outputs_{suffix}.norm.weight"]),
                       "bias": _np(sd[f"{tp}.outputs_{suffix}.norm.bias"])},
            }
            node_ch.append(out_channels)
        fpn[f"repeat{r}"] = cell

    params = _to_jax({"backbone": backbone, "fpn": fpn})
    batch_stats = _to_jax({"backbone": bstats}) if bstats else None
    return params, batch_stats


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
