"""CenterNet head: per-level towers + agnostic heatmap + ltrb regression.

Re-architecture of CenterNet2/centernet/modeling/dense_heads/centernet_head.py:21-162
in the live configuration (only_proposal=True, with_agn_hm=True → empty cls
tower, bbox tower = 1 x {3x3 conv, GN(32), ReLU}; confirmed by golden log
:703-716): shared weights across levels, a learned per-level Scale on the
regression, relu-clamped ltrb output.

Init parity: conv weights ~ N(0, 0.01); bbox_pred bias = 8.0 (:99); agn_hm
bias = -log((1-p)/p), p=0.01 (:100-108).
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import Scale


def _conv_init(std=0.01):
    return nn.initializers.normal(stddev=std)


class CenterNetHead(nn.Module):
    in_channels: int = 128
    num_levels: int = 3
    num_cls_convs: int = 0  # only_proposal=True → no cls tower
    num_classes: int = 1
    num_box_convs: int = 1
    num_share_convs: int = 0
    with_agn_hm: bool = True
    only_proposal: bool = True
    norm_groups: int = 32
    prior_prob: float = 0.01
    dtype: "jnp.dtype | None" = None

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        """features: list of [B, H_l, W_l, C] NHWC maps.

        Returns (agn_hm_logits, bbox_reg): lists of [B, H_l, W_l, 1] / [..., 4].
        """
        assert len(features) == self.num_levels
        bias_value = -math.log((1.0 - self.prior_prob) / self.prior_prob)

        # Shared tower/prediction convs: instantiate ONCE, apply per level.
        cls_convs = [
            (
                nn.Conv(self.in_channels, (3, 3), padding=1, dtype=self.dtype,
                        kernel_init=_conv_init(), name=f"cls_tower{j}"),
                nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-5,
                             name=f"cls_tower{j}_gn"),
            )
            for j in range(0 if self.only_proposal else self.num_cls_convs)
        ]
        cls_logits_conv = None
        if not self.only_proposal:
            cls_logits_conv = nn.Conv(
                self.num_classes, (3, 3), padding=1, use_bias=True,
                kernel_init=_conv_init(),
                bias_init=nn.initializers.constant(bias_value), name="cls_logits",
            )
        share_convs = [
            (
                nn.Conv(self.in_channels, (3, 3), padding=1, dtype=self.dtype,
                        kernel_init=_conv_init(), name=f"share_tower{j}"),
                nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-5,
                             name=f"share_tower{j}_gn"),
            )
            for j in range(self.num_share_convs)
        ]
        box_convs = [
            (
                nn.Conv(self.in_channels, (3, 3), padding=1, use_bias=True,
                        dtype=self.dtype, kernel_init=_conv_init(),
                        name=f"bbox_tower{j}"),
                nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-5,
                             name=f"bbox_tower{j}_gn"),
            )
            for j in range(self.num_box_convs)
        ]
        bbox_pred = nn.Conv(
            4, (3, 3), padding=1, use_bias=True, kernel_init=_conv_init(),
            bias_init=nn.initializers.constant(8.0), name="bbox_pred",
        )
        scales = [Scale(name=f"scale{i}") for i in range(self.num_levels)]
        agn_hm_conv = None
        if self.with_agn_hm:
            agn_hm_conv = nn.Conv(
                1, (3, 3), padding=1, use_bias=True, kernel_init=_conv_init(),
                bias_init=nn.initializers.constant(bias_value), name="agn_hm",
            )

        agn_hms: List[jnp.ndarray] = []
        bbox_regs: List[jnp.ndarray] = []
        clss: List[jnp.ndarray] = []
        for i, feat in enumerate(features):
            x = feat
            for conv, gn in share_convs:
                x = nn.relu(gn(conv(x)))
            ct = x
            for conv, gn in cls_convs:
                ct = nn.relu(gn(conv(ct)))
            bt = x
            for conv, gn in box_convs:
                bt = nn.relu(gn(conv(bt)))
            reg = scales[i](bbox_pred(bt))
            bbox_regs.append(nn.relu(reg))
            agn_hms.append(agn_hm_conv(bt) if self.with_agn_hm else None)
            clss.append(None if self.only_proposal else cls_logits_conv(ct))
        if self.only_proposal:
            return agn_hms, bbox_regs
        return clss, agn_hms, bbox_regs
