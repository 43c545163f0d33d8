"""BiFPN — bidirectional feature pyramid with fast-normalized fusion.

Re-architecture of detectron2.7z!modeling/backbone/bifpn_fcos.py:103-330
(the EfficientDet-style pyramid used by finetune_dla.yaml via
build_p35_fcos_dla_bifpn_backbone): repeated SingleBiFPN cells whose fusion
nodes combine resampled inputs with learned relu-normalized weights, swish
activation, then a 3x3 output conv. The 3-level node graph (:141-148):

  node4 = fuse(f1, f2↑)      node5 = fuse(f0, f4↑)
  node6 = fuse(f1, f4, f5↓)  node7 = fuse(f2, f6↓)
  outputs = (f0-level: node5, f1-level: node6, f2-level: node7)

Norm (BIFPN.NORM, default "GN", fewx/config/cfg.py:60): lateral 1x1 convs
keep their bias and add GroupNorm(32) (bifpn_fcos.py:162-166, d2 Conv2d
default bias); output 3x3 convs drop the bias under a norm
(bifpn_fcos.py:184-190, bias=(norm=="")). norm="" reproduces the bare-conv
variant. GroupNorm eps follows torch's 1e-5.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import upsample_nearest_2x

# (feat_level, input_offsets) for the 3-level cell (bifpn_fcos.py:141-148)
NODES_3LEVEL = [
    (1, (1, 2)),
    (0, (0, 3)),
    (1, (1, 3, 4)),
    (2, (2, 5)),
]


def swish(x):
    return x * nn.sigmoid(x)


def _resample(x, target_hw, out_channels):
    """Match spatial size: maxpool 3x3/2 to downsample, nearest to upsample
    (bifpn_fcos.py:222-240)."""
    h, w = x.shape[-3], x.shape[-2]
    th, tw = target_hw
    if h > th and w > tw:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 3) + [(1, 1), (1, 1), (0, 0)],
                    constant_values=jnp.asarray(-jnp.inf, x.dtype))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
    elif h < th or w < tw:
        x = upsample_nearest_2x(x)
        assert x.shape[-3] == th and x.shape[-2] == tw, (x.shape, target_hw)
    return x


class _ConvGN(nn.Module):
    """d2 Conv2d(..., norm=get_norm('GN', C)): conv → GroupNorm(32, C)."""

    features: int
    kernel: int = 1
    use_bias: bool = True
    norm: str = "GN"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding=self.kernel // 2, use_bias=self.use_bias,
                    dtype=self.dtype, name="conv")(x)
        if self.norm == "GN":
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                             name="gn")(x)
        return x


class SingleBiFPN(nn.Module):
    out_channels: int = 160
    in_channels_list: Tuple[int, ...] = (128, 256, 512)
    norm: str = "GN"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]) -> List[jnp.ndarray]:
        assert len(feats) == len(self.in_channels_list) == 3
        feats = list(feats)
        node_channels = list(self.in_channels_list)
        laterals = {}  # shared per (offset, feat_level) — the reference's
        # add_module overwrite makes later nodes reuse the same lateral conv
        for ni, (feat_level, offsets) in enumerate(NODES_3LEVEL):
            target_hw = (feats[feat_level].shape[-3], feats[feat_level].shape[-2])
            inputs = []
            for off in offsets:
                node = feats[off]
                if node_channels[off] != self.out_channels:
                    lname = f"lateral_{off}_f{feat_level}"
                    if lname not in laterals:
                        laterals[lname] = _ConvGN(
                            self.out_channels, 1, use_bias=True, norm=self.norm,
                            dtype=self.dtype, name=lname,
                        )
                    node = laterals[lname](node)
                node = _resample(node, target_hw, self.out_channels)
                inputs.append(node)
            w = self.param(
                f"weights_f{feat_level}_" + "_".join(map(str, offsets)),
                nn.initializers.ones, (len(offsets),),
            )
            w = nn.relu(w)
            w = w / (jnp.sum(w) + 1e-4)
            fused = sum(wi * xi for wi, xi in zip(w, inputs))
            fused = swish(fused)
            fused = _ConvGN(self.out_channels, 3, use_bias=(self.norm == ""),
                            norm=self.norm, dtype=self.dtype,
                            name=f"output_f{feat_level}_" + "_".join(map(str, offsets)))(fused)
            feats.append(fused)
            node_channels.append(self.out_channels)
        # outputs: last-produced node per level (bifpn_fcos.py:258-265)
        out = [None, None, None]
        for ni in range(len(NODES_3LEVEL) - 1, -1, -1):
            lvl = NODES_3LEVEL[ni][0]
            if out[lvl] is None:
                out[lvl] = feats[len(self.in_channels_list) + ni]
        return out


class BiFPN(nn.Module):
    """Repeated BiFPN over 3 bottom-up levels → {'p3','p4','p5'}."""

    in_features: Tuple[str, ...] = ("dla3", "dla4", "dla5")
    in_channels: Tuple[int, ...] = (128, 256, 512)
    out_channels: int = 160
    num_repeats: int = 4
    norm: str = "GN"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, bottom_up: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        feats = [bottom_up[f] for f in self.in_features]
        chans = self.in_channels
        for r in range(self.num_repeats):
            feats = SingleBiFPN(self.out_channels, tuple(chans), norm=self.norm,
                                dtype=self.dtype, name=f"repeat{r}")(feats)
            chans = (self.out_channels,) * 3
        return {"p3": feats[0], "p4": feats[1], "p5": feats[2]}
