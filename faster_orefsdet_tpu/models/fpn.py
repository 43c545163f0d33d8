"""Feature pyramid network (P3-P5, 128 channels in the live config).

Re-architecture of detectron2.7z!modeling/backbone/fpn.py:17-180: per-level
1x1 lateral convs (with bias — FPN.NORM="" in the live config), top-down
nearest-x2 fusion, and 3x3 output convs. The live model uses no top block
(FCOS.TOP_LEVELS=0 → pure P3-P5, vovnet.py:539-546); LastLevelP6 is provided
for the alt configs (detectron2.7z!modeling/backbone/fpn.py:230-245)."""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import upsample_nearest_2x


class FPN(nn.Module):
    in_features: Tuple[str, ...] = ("stage3", "stage4", "stage5")
    out_channels: int = 128
    fuse_type: str = "sum"
    top_levels: int = 0  # 0 = none, 1 = P6 (maxpoolless conv), matching LastLevelP6
    dtype: Optional[jnp.dtype] = None
    quant: bool = False  # int8 MXU path for lateral/output convs (same params)

    @nn.compact
    def __call__(self, bottom_up: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        from .layers import QuantConv

        def conv(features, ksize, name, strides=1):
            if self.quant:
                return QuantConv(features, (ksize, ksize), strides=strides,
                                 padding=ksize // 2, use_bias=True,
                                 dtype=self.dtype, name=name)
            return nn.Conv(features, (ksize, ksize), strides=strides,
                           padding=ksize // 2, use_bias=True, dtype=self.dtype,
                           name=name)

        feats = [bottom_up[f] for f in self.in_features]  # high→low resolution
        n = len(feats)
        # stage number of the first input feature (stage3 → p3)
        first_stage = int(self.in_features[0][-1])

        laterals = [
            conv(self.out_channels, 1, f"lateral{first_stage + i}")(f)
            for i, f in enumerate(feats)
        ]
        # top-down accumulation (fpn.py:126-145)
        results = [None] * n
        prev = laterals[-1]
        results[-1] = prev
        for i in range(n - 2, -1, -1):
            td = upsample_nearest_2x(prev)
            prev = laterals[i] + td
            if self.fuse_type == "avg":
                prev = prev / 2.0
            results[i] = prev
        out = {}
        for i in range(n):
            out[f"p{first_stage + i}"] = conv(
                self.out_channels, 3, f"output{first_stage + i}"
            )(results[i])
        if self.top_levels >= 1:
            # LastLevelP6: stride-2 3x3 conv on p5 (fpn.py:230-245)
            p_top = int(self.in_features[-1][-1])
            out[f"p{p_top + 1}"] = nn.Conv(
                self.out_channels, (3, 3), strides=2, padding=1, use_bias=True,
                name=f"top_p{p_top + 1}",
            )(out[f"p{p_top}"])
        if self.top_levels >= 2:
            p_top = int(self.in_features[-1][-1]) + 1
            out[f"p{p_top + 1}"] = nn.Conv(
                self.out_channels, (3, 3), strides=2, padding=1, use_bias=True,
                name=f"top_p{p_top + 1}",
            )(nn.relu(out[f"p{p_top}"]))
        return out
