"""ResNet backbone (C4 layout) for the AttentionRPN baseline model family.

Re-architecture of detectron2's ResNet (detectron2.7z!modeling/backbone/
resnet.py) in the configuration the baseline configs use
(Base-FSOD-C4.yaml → MODEL.RESNETS: depth 50, OUT_FEATURES [res4], FrozenBN,
stride_in_1x1=True caffe-style): stem 7x7/2 + maxpool 3x3/2, bottleneck
stages res2-res4 in the backbone; res5 lives in the ROI head
(fsod_roi_heads.py:84-109) and is exposed here as `res5_stage`.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import FrozenBatchNorm, max_pool_ceil

# depth -> blocks per stage (res2..res5)
RESNET_DEPTH_SPECS = {
    18: [2, 2, 2, 2],
    34: [3, 4, 6, 3],
    50: [3, 4, 6, 3],
    101: [3, 4, 23, 3],
    152: [3, 8, 36, 3],
}


class ConvBN(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    relu: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        pad = self.kernel_size // 2
        x = nn.Conv(
            self.features, (self.kernel_size, self.kernel_size),
            strides=self.stride, padding=pad, use_bias=False, dtype=self.dtype,
            name="conv",
        )(x)
        x = FrozenBatchNorm(self.features, name="norm")(x)
        return nn.relu(x) if self.relu else x


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with FrozenBN. stride_in_1x1=True puts
    the stride on the FIRST 1x1 conv (caffe style, the d2 default for C4
    models); False puts it on the 3x3 (torchvision style, used when importing
    torchvision weights — tool/convert-torchvision-to-d2.py workflow)."""

    bottleneck_channels: int
    out_channels: int
    stride: int = 1
    has_shortcut: bool = False
    stride_in_1x1: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        identity = x
        if self.has_shortcut:
            identity = ConvBN(
                self.out_channels, 1, self.stride, dtype=self.dtype, name="shortcut"
            )(x)
        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        out = ConvBN(self.bottleneck_channels, 1, s1, relu=True,
                     dtype=self.dtype, name="conv1")(x)
        out = ConvBN(self.bottleneck_channels, 3, s3, relu=True,
                     dtype=self.dtype, name="conv2")(out)
        out = ConvBN(self.out_channels, 1, 1, dtype=self.dtype, name="conv3")(out)
        return nn.relu(out + identity)


class ResNetStage(nn.Module):
    num_blocks: int
    bottleneck_channels: int
    out_channels: int
    first_stride: int = 1
    stride_in_1x1: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_blocks):
            x = BottleneckBlock(
                self.bottleneck_channels,
                self.out_channels,
                stride=self.first_stride if i == 0 else 1,
                has_shortcut=(i == 0),
                stride_in_1x1=self.stride_in_1x1,
                dtype=self.dtype,
                name=f"block{i}",
            )(x)
        return x


class ResNetC4(nn.Module):
    """ResNet producing {'res2'..'res4'} maps (res5 is the ROI head's)."""

    depth: int = 50
    out_features: Tuple[str, ...] = ("res4",)
    stride_in_1x1: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        blocks = RESNET_DEPTH_SPECS[self.depth]
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = ConvBN(64, 7, 2, relu=True, dtype=self.dtype, name="stem")(x)
        # d2 stem maxpool: kernel 3, stride 2, padding 1
        x = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)],
                    constant_values=jnp.asarray(-jnp.inf, x.dtype))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        outputs = {}
        channels = [(64, 256), (128, 512), (256, 1024), (512, 2048)]
        stages = ["res2", "res3", "res4"]
        if "res5" in self.out_features:
            stages.append("res5")  # full-trunk layout (FPN-style models)
        for i, name in enumerate(stages):
            bc, oc = channels[i]
            x = ResNetStage(
                blocks[i], bc, oc, first_stride=1 if i == 0 else 2,
                stride_in_1x1=self.stride_in_1x1, dtype=self.dtype, name=name,
            )(x)
            if name in self.out_features:
                outputs[name] = x
        return outputs


class Res5Stage(nn.Module):
    """The res5 block used inside FsodRes5ROIHeads (fsod_roi_heads.py:84-109):
    3 bottlenecks, stride [2,1,1], 2048 out channels, operating on pooled
    14x14 ROI features -> 7x7x2048."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return ResNetStage(3, 512, 2048, first_stride=2, dtype=self.dtype, name="res5")(x)
