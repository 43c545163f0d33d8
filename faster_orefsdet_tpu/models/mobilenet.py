"""MobileNetV3-small backbone (ALT lightweight family).

Re-architecture of detectron2.7z!modeling/backbone/mobilenetv3small.py
(torchvision MobileNetV3-small wrapped as a d2 backbone emitting
res2/res3/res4/res5 at strides 4/8/16/32): hardswish stem, 11 inverted
residual blocks with squeeze-excitation, 1x1 expansion tail. BatchNorm is
folded to affine (FrozenBN) like the other backbones.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import FrozenBatchNorm, hsigmoid


def hardswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


class _IRConf(NamedTuple):
    kernel: int
    expanded: int
    out: int
    use_se: bool
    use_hs: bool  # hardswish vs relu
    stride: int


# torchvision mobilenet_v3_small inverted-residual table
MNV3_SMALL = [
    _IRConf(3, 16, 16, True, False, 2),
    _IRConf(3, 72, 24, False, False, 2),
    _IRConf(3, 88, 24, False, False, 1),
    _IRConf(5, 96, 40, True, True, 2),
    _IRConf(5, 240, 40, True, True, 1),
    _IRConf(5, 240, 40, True, True, 1),
    _IRConf(5, 120, 48, True, True, 1),
    _IRConf(5, 144, 48, True, True, 1),
    _IRConf(5, 288, 96, True, True, 2),
    _IRConf(5, 576, 96, True, True, 1),
    _IRConf(5, 576, 96, True, True, 1),
]
# feature taps: after block idx (0-based into `features` incl. stem at 0)
# -> {'res2': after block1, 'res3': after block3, 'res4': after block8,
#     'res5': after the 1x1 tail} (mobilenetv3small.py:228-238)


class _ConvBNAct(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: str = "hardswish"  # "relu" | "hardswish" | "none"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel), strides=self.stride,
                    padding=self.kernel // 2, feature_group_count=self.groups,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = FrozenBatchNorm(self.features, name="norm")(x)
        if self.act == "relu":
            x = nn.relu(x)
        elif self.act == "hardswish":
            x = hardswish(x)
        return x


class SqueezeExcite(nn.Module):
    """torchvision MNv3 SE: squeeze ch//4 (rounded to 8), relu, hsigmoid."""

    channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        sq = max(8, ((self.channels // 4) + 4) // 8 * 8)
        g = jnp.mean(x, axis=(-3, -2), keepdims=True)
        g = nn.relu(nn.Conv(sq, (1, 1), use_bias=True, dtype=self.dtype, name="fc1")(g))
        g = nn.Conv(self.channels, (1, 1), use_bias=True, dtype=self.dtype, name="fc2")(g)
        return x * hsigmoid(g)


class InvertedResidual(nn.Module):
    conf: _IRConf
    in_channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        c = self.conf
        act = "hardswish" if c.use_hs else "relu"
        identity = x
        h = x
        if c.expanded != self.in_channels:
            h = _ConvBNAct(c.expanded, 1, 1, act=act, dtype=self.dtype, name="expand")(h)
        h = _ConvBNAct(c.expanded, c.kernel, c.stride, groups=c.expanded, act=act,
                       dtype=self.dtype, name="depthwise")(h)
        if c.use_se:
            h = SqueezeExcite(c.expanded, dtype=self.dtype, name="se")(h)
        h = _ConvBNAct(c.out, 1, 1, act="none", dtype=self.dtype, name="project")(h)
        if c.stride == 1 and self.in_channels == c.out:
            h = h + identity
        return h


class MobileNetV3Small(nn.Module):
    out_features: Tuple[str, ...] = ("res3", "res4", "res5")
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = _ConvBNAct(16, 3, 2, act="hardswish", dtype=self.dtype, name="stem")(x)
        taps = {1: "res2", 3: "res3", 8: "res4"}
        outputs = {}
        in_ch = 16
        for i, conf in enumerate(MNV3_SMALL):
            x = InvertedResidual(conf, in_ch, dtype=self.dtype, name=f"block{i}")(x)
            in_ch = conf.out
            if (i + 1) in taps and taps[i + 1] in self.out_features:
                outputs[taps[i + 1]] = x
        x = _ConvBNAct(576, 1, 1, act="hardswish", dtype=self.dtype, name="tail")(x)
        if "res5" in self.out_features:
            outputs["res5"] = x
        return outputs

    @staticmethod
    def out_channels() -> Dict[str, int]:
        return {"res2": 16, "res3": 24, "res4": 48, "res5": 576}

    @staticmethod
    def out_strides() -> Dict[str, int]:
        return {"res2": 4, "res3": 8, "res4": 16, "res5": 32}
