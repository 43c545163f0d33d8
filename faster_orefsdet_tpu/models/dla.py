"""DLA (deep layer aggregation) backbone — the finetune_dla.yaml ALT family.

Re-architecture of detectron2.7z!modeling/backbone/dlafpn.py:30-260 (dla34:
levels [1,1,1,2,2,1], channels [16,32,64,128,256,512], BasicBlock): a base
7x7 conv, two plain conv levels, then four hierarchical Tree stages with
root-node aggregation.

Norm follows the reference's finetune_dla DLA.NORM:"BN" — trainable
BatchNorm (dlafpn.py:43-48 via get_norm). norm="BN" uses flax BatchNorm with
a `batch_stats` collection (torch momentum 0.1 → flax momentum 0.9,
eps 1e-5); pass `train=True` + mutable=["batch_stats"] during training.
norm="FrozenBN" folds to the affine FrozenBatchNorm (exact at eval).
The trainable BN modules are named "bn" (not "norm") so the solver's
frozen-norm mask (solver.param_labels) leaves them trainable with
WEIGHT_DECAY_NORM, matching d2's optimizer grouping.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import FrozenBatchNorm

DLA_SPECS = {
    34: ([1, 1, 1, 2, 2, 1], [16, 32, 64, 128, 256, 512]),
}


class _ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    norm: str = "FrozenBN"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel), strides=self.stride,
                    padding=self.kernel // 2, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        if self.norm == "BN":
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        else:
            x = FrozenBatchNorm(self.features, name="norm")(x)
        return nn.relu(x) if self.relu else x


class BasicBlock(nn.Module):
    """DLA BasicBlock (dlafpn.py:30-60): two 3x3 convs + residual."""

    features: int
    stride: int = 1
    norm: str = "FrozenBN"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        out = _ConvBN(self.features, 3, self.stride, norm=self.norm,
                      dtype=self.dtype, name="conv1")(x, train)
        out = _ConvBN(self.features, 3, 1, relu=False, norm=self.norm,
                      dtype=self.dtype, name="conv2")(out, train)
        return nn.relu(out + residual)


class Root(nn.Module):
    """Aggregation node (dlafpn.py:108-128): 1x1 conv over concatenated children."""

    features: int
    residual: bool = False
    norm: str = "FrozenBN"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, *children, train: bool = False):
        x = jnp.concatenate(children, axis=-1)
        x = _ConvBN(self.features, 1, 1, relu=False, norm=self.norm,
                    dtype=self.dtype, name="conv")(x, train)
        if self.residual:
            x = x + children[0]
        return nn.relu(x)


class Tree(nn.Module):
    """Hierarchical tree stage (dlafpn.py:131-186)."""

    levels: int
    in_channels: int
    out_channels: int
    stride: int = 1
    level_root: bool = False
    root_dim: int = 0
    norm: str = "FrozenBN"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, residual=None, children=None, train: bool = False):
        children = [] if children is None else list(children)
        root_dim = self.root_dim or 2 * self.out_channels
        if self.level_root:
            root_dim += self.in_channels

        bottom = x
        if self.stride > 1:
            bottom = nn.max_pool(x, (self.stride, self.stride),
                                 strides=(self.stride, self.stride))
        if self.in_channels != self.out_channels:
            residual_in = _ConvBN(self.out_channels, 1, 1, relu=False,
                                  norm=self.norm, dtype=self.dtype,
                                  name="project")(bottom, train)
        else:
            residual_in = bottom
        if self.level_root:
            children.append(bottom)

        if self.levels == 1:
            x1 = BasicBlock(self.out_channels, self.stride, norm=self.norm,
                            dtype=self.dtype, name="tree1")(x, residual_in, train)
            x2 = BasicBlock(self.out_channels, 1, norm=self.norm,
                            dtype=self.dtype, name="tree2")(x1, train=train)
            return Root(self.out_channels, norm=self.norm, dtype=self.dtype,
                        name="root")(x2, x1, *children, train=train)
        x1 = Tree(self.levels - 1, self.in_channels, self.out_channels,
                  self.stride, norm=self.norm, dtype=self.dtype,
                  name="tree1")(x, train=train)
        children.append(x1)
        return Tree(self.levels - 1, self.out_channels, self.out_channels,
                    root_dim=root_dim + self.out_channels, norm=self.norm,
                    dtype=self.dtype, name="tree2")(x1, children=children,
                                                    train=train)


class DLA(nn.Module):
    """DLA backbone producing {'dla2'..'dla5'} (strides 4..32)."""

    num_layers: int = 34
    out_features: Tuple[str, ...] = ("dla3", "dla4", "dla5")
    norm: str = "FrozenBN"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        levels, channels = DLA_SPECS[self.num_layers]
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = _ConvBN(channels[0], 7, 1, norm=self.norm, dtype=self.dtype,
                    name="base")(x, train)
        # level0: convs at stride 1; level1: stride 2
        for i in range(levels[0]):
            x = _ConvBN(channels[0], 3, 1, norm=self.norm, dtype=self.dtype,
                        name=f"level0_{i}")(x, train)
        for i in range(levels[1]):
            x = _ConvBN(channels[1], 3, 2 if i == 0 else 1, norm=self.norm,
                        dtype=self.dtype, name=f"level1_{i}")(x, train)
        outputs = {}
        in_ch = channels[1]
        for si, (lv, ch) in enumerate(zip(levels[2:], channels[2:]), start=2):
            x = Tree(lv, in_ch, ch, stride=2, level_root=(si > 2),
                     norm=self.norm, dtype=self.dtype, name=f"level{si}")(
                         x, train=train)
            in_ch = ch
            name = f"dla{si}"
            if name in self.out_features:
                outputs[name] = x
        return outputs

    @staticmethod
    def out_channels(num_layers: int = 34) -> Dict[str, int]:
        _, channels = DLA_SPECS[num_layers]
        return {f"dla{i}": channels[i] for i in range(2, 6)}

    @staticmethod
    def out_strides() -> Dict[str, int]:
        return {"dla2": 4, "dla3": 8, "dla4": 16, "dla5": 32}
