"""Attention zoo: CoT and CBAM blocks (NHWC, flax).

Re-architecture of the reference's attention modules at
fewx/modeling/fsod/fsod_cen.py:638-680 (CoTAttention), :729-812
(ChannelAttention/SpatialAttention/CBAMBlock). NOTE: in the reference these
are DEAD CODE — every construction site is commented out
(fsod_cen.py:80-88) — they are rebuilt here for inventory completeness and
as drop-in experiment blocks. The live polarized attention variant
(fsod_rcnn.py:571, actually constructed by FsodRCNN) lives in
models/attention_rpn.PolarizedChannelAttention.

All matmul-style 1x1 convs are Dense layers on the channel axis (MXU
friendly); CoT's BatchNorms carry a `batch_stats` collection
(use_running_average=not train) like the DLA trainable-BN path.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class CoTAttention(nn.Module):
    """Contextual-transformer attention (fsod_cen.py:638-680).

    key_embed: grouped 3x3 conv + BN + relu; value_embed: 1x1 conv + BN;
    attention: [k1; x] → 1x1 bottleneck (2C→2C/4) + BN + relu → 1x1 to
    k²·C, mean over the k² taps, softmax over the SPATIAL axis, times v.
    Output k1 + k2."""

    dim: int
    kernel_size: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        assert c == self.dim
        k = self.kernel_size

        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name)

        k1 = nn.Conv(c, (k, k), padding=k // 2, feature_group_count=4,
                     use_bias=False, dtype=self.dtype, name="key_conv")(x)
        k1 = nn.relu(bn("key_bn")(k1))

        v = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                    name="value_conv")(x)
        v = bn("value_bn")(v).reshape(b, h * w, c)

        y = jnp.concatenate([k1, x], axis=-1)
        att = nn.Conv(2 * c // 4, (1, 1), use_bias=False, dtype=self.dtype,
                      name="att_conv1")(y)
        att = nn.relu(bn("att_bn")(att))
        att = nn.Conv(k * k * c, (1, 1), dtype=self.dtype, name="att_conv2")(att)
        # output channel o = c_i·k² + tap (torch reshape(bs,c,k²,h,w) order);
        # mean over the k² taps, softmax over the SPATIAL axis
        att = att.reshape(b, h * w, c, k * k).mean(axis=3)
        att = nn.softmax(att, axis=1)  # torch: softmax(dim=-1) over h*w
        k2 = (att * v).reshape(b, h, w, c)
        return k1 + k2


class ChannelAttention(nn.Module):
    """CBAM channel gate (fsod_cen.py:729-746): shared SE MLP over global
    max- and avg-pools, sigmoid of the sum."""

    channel: int
    reduction: int = 16
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        se1 = nn.Dense(self.channel // self.reduction, use_bias=False,
                       dtype=self.dtype, name="se_fc1")
        se2 = nn.Dense(self.channel, use_bias=False, dtype=self.dtype,
                       name="se_fc2")
        mx = jnp.max(x, axis=(1, 2))
        av = jnp.mean(x, axis=(1, 2))
        out = se2(nn.relu(se1(mx))) + se2(nn.relu(se1(av)))
        return nn.sigmoid(out)[:, None, None, :]  # [B,1,1,C]


class SpatialAttention(nn.Module):
    """CBAM spatial gate (fsod_cen.py:748-760): conv over [max_c; mean_c]."""

    kernel_size: int = 7
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        mx = jnp.max(x, axis=-1, keepdims=True)
        av = jnp.mean(x, axis=-1, keepdims=True)
        y = jnp.concatenate([mx, av], axis=-1)
        y = nn.Conv(1, (self.kernel_size, self.kernel_size),
                    padding=self.kernel_size // 2, dtype=self.dtype,
                    name="conv")(y)
        return nn.sigmoid(y)  # [B,H,W,1]


class CBAMBlock(nn.Module):
    """CBAM (fsod_cen.py:762-812): x·ca(x)·sa(·) + residual."""

    channel: int
    reduction: int = 16
    kernel_size: int = 49
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        out = x * ChannelAttention(self.channel, self.reduction,
                                   dtype=self.dtype, name="ca")(x)
        out = out * SpatialAttention(self.kernel_size, dtype=self.dtype,
                                     name="sa")(out)
        return out + x
