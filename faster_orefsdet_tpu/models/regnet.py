"""RegNet backbone family (RegNetX/RegNetY) — ALT backbone.

Re-architecture of detectron2.7z!modeling/backbone/regnet.py (the stock d2
RegNet): SimpleStem (3x3/2) + four AnyStages of grouped-bottleneck residual
blocks (optional squeeze-excitation for RegNetY), with per-stage widths and
depths generated from the (w_a, w_0, w_m, d) parameterization
(generate_regnet_parameters, :369-385).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .layers import FrozenBatchNorm


def generate_regnet_parameters(w_a: float, w_0: int, w_m: float, d: int, q: int = 8):
    """Per-stage (widths, depths) from the RegNet design-space parameters."""
    ws_cont = np.arange(d) * w_a + w_0
    ks = np.round(np.log(ws_cont / w_0) / np.log(w_m))
    ws_all = w_0 * np.power(w_m, ks)
    ws_all = np.round(ws_all / q).astype(int) * q
    ws, ds = np.unique(ws_all, return_counts=True)
    return ws.tolist(), ds.tolist()


class _ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    relu: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel), strides=self.stride,
                    padding=self.kernel // 2, feature_group_count=self.groups,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = FrozenBatchNorm(self.features, name="norm")(x)
        return nn.relu(x) if self.relu else x


class ResBottleneckBlock(nn.Module):
    """regnet.py:161-201: 1x1 -> grouped 3x3 (stride) -> [SE] -> 1x1 + res."""

    out_channels: int
    stride: int = 1
    group_width: int = 16
    bottleneck_ratio: float = 1.0
    se_ratio: float = 0.0
    has_shortcut: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        w_b = int(round(self.out_channels * self.bottleneck_ratio))
        # d2 adjust_ws_gs_compat: group width capped at w_b, w_b rounded to a
        # multiple of the group width
        gw = min(self.group_width, w_b)
        w_b = int(round(w_b / gw) * gw)
        groups = w_b // gw
        identity = x
        if self.has_shortcut:
            identity = _ConvBN(self.out_channels, 1, self.stride, relu=False,
                               dtype=self.dtype, name="shortcut")(x)
        h = _ConvBN(w_b, 1, 1, dtype=self.dtype, name="a")(x)
        h = _ConvBN(w_b, 3, self.stride, groups=groups, dtype=self.dtype, name="b")(h)
        if self.se_ratio > 0:
            se_ch = max(1, int(round(x.shape[-1] * self.se_ratio)))
            g = jnp.mean(h, axis=(-3, -2), keepdims=True)
            g = nn.relu(nn.Conv(se_ch, (1, 1), name="se_fc1")(g))
            g = nn.sigmoid(nn.Conv(w_b, (1, 1), name="se_fc2")(g))
            h = h * g
        h = _ConvBN(self.out_channels, 1, 1, relu=False, dtype=self.dtype, name="c")(h)
        return nn.relu(h + identity)


class RegNet(nn.Module):
    """RegNet trunk emitting {'s1'..'s4'} at strides 4/8/16/32.

    Default parameters = RegNetX-400MF (d2 model-zoo convention)."""

    w_a: float = 24.48
    w_0: int = 24
    w_m: float = 2.54
    depth: int = 22
    group_width: int = 16
    se_ratio: float = 0.0  # 0.25 for RegNetY
    out_features: Tuple[str, ...] = ("s2", "s3", "s4")
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        widths, depths = generate_regnet_parameters(
            self.w_a, self.w_0, self.w_m, self.depth
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = _ConvBN(32, 3, 2, dtype=self.dtype, name="stem")(x)
        outputs = {}
        in_ch = 32
        for si, (wi, di) in enumerate(zip(widths, depths), start=1):
            for b in range(di):
                x = ResBottleneckBlock(
                    wi, stride=2 if b == 0 else 1,
                    group_width=self.group_width, se_ratio=self.se_ratio,
                    has_shortcut=(b == 0 and (in_ch != wi or True)),
                    dtype=self.dtype, name=f"s{si}_block{b}",
                )(x)
                in_ch = wi
            name = f"s{si}"
            if name in self.out_features:
                outputs[name] = x
        return outputs
