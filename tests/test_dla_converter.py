"""DLA-34 + BiFPN checkpoint converter parity.

Builds a synthetic state_dict with the reference's exact module names
(detectron2.7z!modeling/backbone/dlafpn.py:189-253 under
`backbone.bottom_up.backbone`, bifpn_fcos.py:152-190 under
`backbone.repeated_bifpn.{r}`), runs an independent torch functional
transcription of both forwards, and checks the converted flax modules
reproduce the outputs (BN eval mode with the checkpoint's running stats).
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from faster_orefsdet_tpu.models.bifpn import NODES_3LEVEL, BiFPN
from faster_orefsdet_tpu.models.dla import DLA
from faster_orefsdet_tpu.utils.torch_convert import convert_dla_bifpn_backbone

CHANNELS = [16, 32, 64, 128, 256, 512]
LEVELS = [1, 1, 1, 2, 2, 1]
OUT = 160
REPEATS = 2

_rng = np.random.default_rng(0)


def _add_conv(sd, key, cin, cout, k):
    sd[key + ".weight"] = (
        _rng.standard_normal((cout, cin, k, k)) * (1.5 / np.sqrt(cin * k * k))
    ).astype(np.float32)


def _add_bn(sd, key, c):
    sd[key + ".weight"] = (1.0 + 0.1 * _rng.standard_normal(c)).astype(np.float32)
    sd[key + ".bias"] = (0.1 * _rng.standard_normal(c)).astype(np.float32)
    sd[key + ".running_mean"] = (0.1 * _rng.standard_normal(c)).astype(np.float32)
    sd[key + ".running_var"] = (0.5 + np.abs(_rng.standard_normal(c))).astype(np.float32)


def _build_tree_sd(sd, tp, lv, cin, cout, level_root, root_dim=0):
    """Mirror of the torch Tree constructor (dlafpn.py:131-160)."""
    if root_dim == 0:
        root_dim = 2 * cout
    if level_root:
        root_dim += cin
    if cin != cout:
        _add_conv(sd, f"{tp}.project.0", cin, cout, 1)
        _add_bn(sd, f"{tp}.project.1", cout)
    if lv == 1:
        for name, ci in (("tree1", cin), ("tree2", cout)):
            _add_conv(sd, f"{tp}.{name}.conv1", ci, cout, 3)
            _add_bn(sd, f"{tp}.{name}.bn1", cout)
            _add_conv(sd, f"{tp}.{name}.conv2", cout, cout, 3)
            _add_bn(sd, f"{tp}.{name}.bn2", cout)
        _add_conv(sd, f"{tp}.root.conv", root_dim, cout, 1)
        _add_bn(sd, f"{tp}.root.bn", cout)
    else:
        _build_tree_sd(sd, f"{tp}.tree1", lv - 1, cin, cout, False, 0)
        _build_tree_sd(sd, f"{tp}.tree2", lv - 1, cout, cout, False,
                       root_dim + cout)


def build_state_dict():
    sd = {}
    bp = "backbone.bottom_up.backbone"
    _add_conv(sd, f"{bp}.base_layer.0", 3, CHANNELS[0], 7)
    _add_bn(sd, f"{bp}.base_layer.1", CHANNELS[0])
    _add_conv(sd, f"{bp}.level0.0", CHANNELS[0], CHANNELS[0], 3)
    _add_bn(sd, f"{bp}.level0.1", CHANNELS[0])
    _add_conv(sd, f"{bp}.level1.0", CHANNELS[0], CHANNELS[1], 3)
    _add_bn(sd, f"{bp}.level1.1", CHANNELS[1])
    cin = CHANNELS[1]
    for si in range(2, 6):
        _build_tree_sd(sd, f"{bp}.level{si}", LEVELS[si], cin, CHANNELS[si],
                       level_root=(si > 2))
        cin = CHANNELS[si]
    # bifpn
    for r in range(REPEATS):
        tp = f"backbone.repeated_bifpn.{r}"
        node_ch = list(CHANNELS[3:6] if r == 0 else [OUT] * 3)
        for feat_level, offsets in NODES_3LEVEL:
            for off in offsets:
                lname = f"{tp}.lateral_{off}_f{feat_level}"
                if node_ch[off] != OUT and lname + ".weight" not in sd:
                    _add_conv(sd, lname, node_ch[off], OUT, 1)
                    sd[lname + ".bias"] = (
                        0.1 * _rng.standard_normal(OUT)).astype(np.float32)
                    _add_bn(sd, lname + ".norm", OUT)
                    del sd[lname + ".norm.running_mean"]
                    del sd[lname + ".norm.running_var"]
            sfx = f"f{feat_level}_" + "_".join(map(str, offsets))
            sd[f"{tp}.weights_{sfx}"] = (
                1.0 + 0.2 * _rng.standard_normal(len(offsets))).astype(np.float32)
            _add_conv(sd, f"{tp}.outputs_{sfx}", OUT, OUT, 3)
            _add_bn(sd, f"{tp}.outputs_{sfx}.norm", OUT)
            del sd[f"{tp}.outputs_{sfx}.norm.running_mean"]
            del sd[f"{tp}.outputs_{sfx}.norm.running_var"]
            node_ch.append(OUT)
    return sd


# ---------------------------------------------------------------- torch side
def _t_bn(x, sd, key):
    w = torch.from_numpy(sd[key + ".weight"])
    b = torch.from_numpy(sd[key + ".bias"])
    m = torch.from_numpy(sd[key + ".running_mean"])
    v = torch.from_numpy(sd[key + ".running_var"])
    return (x - m[:, None, None]) / torch.sqrt(v[:, None, None] + 1e-5) * \
        w[:, None, None] + b[:, None, None]


def _t_conv(x, sd, key, stride=1, pad=0):
    return F.conv2d(x, torch.from_numpy(sd[key + ".weight"]), None,
                    stride=stride, padding=pad)


def _t_block(x, sd, tp, residual, stride):
    out = F.relu(_t_bn(_t_conv(x, sd, f"{tp}.conv1", stride, 1), sd, f"{tp}.bn1"))
    out = _t_bn(_t_conv(out, sd, f"{tp}.conv2", 1, 1), sd, f"{tp}.bn2")
    return F.relu(out + residual)


def _t_tree(x, sd, tp, lv, cin, cout, stride, level_root, children=None):
    children = [] if children is None else children
    bottom = F.max_pool2d(x, stride, stride) if stride > 1 else x
    if cin != cout:
        residual = _t_bn(_t_conv(bottom, sd, f"{tp}.project.0"), sd,
                         f"{tp}.project.1")
    else:
        residual = bottom
    if level_root:
        children.append(bottom)
    if lv == 1:
        x1 = _t_block(x, sd, f"{tp}.tree1", residual, stride)
        x2 = _t_block(x1, sd, f"{tp}.tree2", x1, 1)
        cat = torch.cat([x2, x1] + children, 1)
        return F.relu(_t_bn(_t_conv(cat, sd, f"{tp}.root.conv"), sd,
                            f"{tp}.root.bn"))
    x1 = _t_tree(x, sd, f"{tp}.tree1", lv - 1, cin, cout, stride, False)
    children.append(x1)
    return _t_tree(x1, sd, f"{tp}.tree2", lv - 1, cout, cout, 1, False, children)


def _t_dla(sd, x):
    bp = "backbone.bottom_up.backbone"
    x = F.relu(_t_bn(_t_conv(x, sd, f"{bp}.base_layer.0", 1, 3), sd,
                     f"{bp}.base_layer.1"))
    x = F.relu(_t_bn(_t_conv(x, sd, f"{bp}.level0.0", 1, 1), sd, f"{bp}.level0.1"))
    x = F.relu(_t_bn(_t_conv(x, sd, f"{bp}.level1.0", 2, 1), sd, f"{bp}.level1.1"))
    outs = {}
    cin = CHANNELS[1]
    for si in range(2, 6):
        x = _t_tree(x, sd, f"{bp}.level{si}", LEVELS[si], cin, CHANNELS[si], 2,
                    level_root=(si > 2))
        outs[f"dla{si}"] = x
        cin = CHANNELS[si]
    return outs


def _t_conv_gn(x, sd, key, pad, bias):
    w = torch.from_numpy(sd[key + ".weight"])
    b = torch.from_numpy(sd[key + ".bias"]) if bias else None
    x = F.conv2d(x, w, b, padding=pad)
    return F.group_norm(x, 32, torch.from_numpy(sd[key + ".norm.weight"]),
                        torch.from_numpy(sd[key + ".norm.bias"]), eps=1e-5)


def _t_bifpn(sd, feats):
    for r in range(REPEATS):
        tp = f"backbone.repeated_bifpn.{r}"
        feats = list(feats)
        node_ch = [f.shape[1] for f in feats]
        for feat_level, offsets in NODES_3LEVEL:
            th, tw = feats[feat_level].shape[-2:]
            inputs = []
            for off in offsets:
                node = feats[off]
                if node_ch[off] != OUT:
                    node = _t_conv_gn(node, sd, f"{tp}.lateral_{off}_f{feat_level}",
                                      0, bias=True)
                h, w = node.shape[-2:]
                if h > th and w > tw:
                    node = F.max_pool2d(node, 3, stride=2, padding=1)
                elif h < th or w < tw:
                    node = F.interpolate(node, size=(th, tw), mode="nearest")
                inputs.append(node)
            sfx = f"f{feat_level}_" + "_".join(map(str, offsets))
            w = F.relu(torch.from_numpy(sd[f"{tp}.weights_{sfx}"]))
            w = w / (w.sum() + 1e-4)
            fused = sum(wi * xi for wi, xi in zip(w, inputs))
            fused = fused * torch.sigmoid(fused)
            feats.append(_t_conv_gn(fused, sd, f"{tp}.outputs_{sfx}", 1, bias=False))
            node_ch.append(OUT)
        out = [None, None, None]
        for ni in range(len(NODES_3LEVEL) - 1, -1, -1):
            lvl = NODES_3LEVEL[ni][0]
            if out[lvl] is None:
                out[lvl] = feats[3 + ni]
        feats = out
    return feats


def test_dla_bifpn_converter_parity():
    sd = build_state_dict()
    params, stats = convert_dla_bifpn_backbone(
        sd, num_layers=34, norm="BN", bifpn_repeats=REPEATS, out_channels=OUT
    )
    assert stats is not None

    x = _rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    with torch.no_grad():
        t_feats = _t_dla(sd, tx)
        t_pyr = _t_bifpn(sd, [t_feats[f] for f in ("dla3", "dla4", "dla5")])

    dla = DLA(num_layers=34, out_features=("dla3", "dla4", "dla5"), norm="BN")
    j_feats = dla.apply(
        {"params": params["backbone"], "batch_stats": stats["backbone"]},
        jnp.asarray(x),
    )
    for k in ("dla3", "dla4", "dla5"):
        np.testing.assert_allclose(
            np.asarray(j_feats[k]),
            np.transpose(t_feats[k].numpy(), (0, 2, 3, 1)),
            atol=2e-3, rtol=1e-3,
        )

    bifpn = BiFPN(in_channels=tuple(CHANNELS[3:6]), out_channels=OUT,
                  num_repeats=REPEATS, norm="GN")
    j_pyr = bifpn.apply({"params": params["fpn"]}, j_feats)
    for i, k in enumerate(("p3", "p4", "p5")):
        np.testing.assert_allclose(
            np.asarray(j_pyr[k]),
            np.transpose(t_pyr[i].numpy(), (0, 2, 3, 1)),
            atol=5e-3, rtol=1e-3,
        )

    # converted trees load into the real detector variables (structure match)
    from faster_orefsdet_tpu.config import get_config
    from faster_orefsdet_tpu.pipelines.inference import make_detector

    cfg = get_config("finetune_dla")
    import dataclasses

    cfg = cfg.replace(fpn=dataclasses.replace(cfg.fpn, bifpn_repeats=REPEATS))
    model = make_detector(cfg)
    ref = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 64, 64, 3)), method=model.features),
        jax.random.PRNGKey(0),
    )

    def treedef_shapes(t):
        return jax.tree.map(lambda l: tuple(l.shape), t)

    assert treedef_shapes(ref["params"]["backbone"]) == treedef_shapes(
        params["backbone"]
    )
    assert treedef_shapes(ref["params"]["fpn"]) == treedef_shapes(params["fpn"])
    assert treedef_shapes(ref["batch_stats"]["backbone"]) == treedef_shapes(
        stats["backbone"]
    )
