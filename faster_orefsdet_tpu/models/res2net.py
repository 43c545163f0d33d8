"""Res2Net backbone (multi-scale bottlenecks) — ALT backbone family.

Re-architecture of detectron2.7z!modeling/backbone/res2net.py (Res2Net-50,
basewidth 26, scale 4): the bottleneck's 3x3 stage splits its channels into
`scale` groups processed by a cascade of 3x3 convs with cross-group residual
accumulation; the last group passes through (stride 1) or average-pools
(stride 2). Layout otherwise mirrors ResNet-C4/FPN.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .resnet import RESNET_DEPTH_SPECS, ConvBN


class Bottle2neck(nn.Module):
    """res2net.py:116-263 with stride placed on the 3x3 stage (stride_in_1x1
    False in the res2net builder) and avg-pool downsampling of the passthrough
    group."""

    bottleneck_channels: int
    out_channels: int
    stride: int = 1
    has_shortcut: bool = False
    scale: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        width = self.bottleneck_channels // self.scale
        nums = 1 if self.scale == 1 else self.scale - 1
        identity = x
        if self.has_shortcut:
            # res2net d2 builder uses avgpool+1x1 shortcut for stride 2
            s = x
            if self.stride > 1:
                s = nn.avg_pool(s, (self.stride, self.stride),
                                strides=(self.stride, self.stride))
            identity = ConvBN(self.out_channels, 1, 1, dtype=self.dtype,
                              name="shortcut")(s)

        out = ConvBN(self.bottleneck_channels, 1, 1, relu=True,
                     dtype=self.dtype, name="conv1")(x)
        groups = [out[..., i * width : (i + 1) * width] for i in range(self.scale)]
        outs = []
        sp = None
        first_block = self.has_shortcut  # in_channels != out_channels case
        for i in range(nums):
            if i == 0 or first_block:
                sp = groups[i]
            else:
                sp = sp + groups[i]
            sp = ConvBN(width, 3, self.stride, relu=True, dtype=self.dtype,
                        name=f"conv2_{i}")(sp)
            outs.append(sp)
        if self.scale != 1:
            last = groups[-1]
            if self.stride > 1:
                last = nn.avg_pool(last, (3, 3), strides=(self.stride, self.stride),
                                   padding=((1, 1), (1, 1)))
            outs.append(last)
        out = jnp.concatenate(outs, axis=-1)
        out = ConvBN(self.out_channels, 1, 1, dtype=self.dtype, name="conv3")(out)
        return nn.relu(out + identity)


class Res2Net(nn.Module):
    """Res2Net-50 trunk emitting res2..res5 (subset via out_features)."""

    depth: int = 50
    out_features: Tuple[str, ...] = ("res3", "res4", "res5")
    basewidth: int = 26
    scale: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        blocks = RESNET_DEPTH_SPECS[self.depth]
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = ConvBN(64, 7, 2, relu=True, dtype=self.dtype, name="stem")(x)
        x = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)],
                    constant_values=jnp.asarray(-jnp.inf, x.dtype))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        outputs = {}
        stages = ["res2", "res3", "res4", "res5"]
        out_ch = [256, 512, 1024, 2048]
        for i, name in enumerate(stages):
            if name == "res5" and "res5" not in self.out_features:
                break
            bc = self.basewidth * self.scale * (2**i)
            for b in range(blocks[i]):
                x = Bottle2neck(
                    bc, out_ch[i], stride=2 if (i > 0 and b == 0) else 1,
                    has_shortcut=(b == 0), scale=self.scale, dtype=self.dtype,
                    name=f"{name}_block{b}",
                )(x)
            if name in self.out_features:
                outputs[name] = x
        return outputs
