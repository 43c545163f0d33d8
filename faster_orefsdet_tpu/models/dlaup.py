"""DLA-Up decoder (the `build_dla_backbone` / finetune_dla2.yaml family).

Re-architecture of detectron2.7z!modeling/backbone/dla.py:266-420 (DLASeg):
the stride-4 DLA decoder that iteratively merges deeper levels into shallower
ones through deformable-conv projection/node blocks and fixed-bilinear 2x
upsampling, emitting a single 'dla2' (stride 4) feature map.

The reference's ConvTranspose2d upsampler is initialized to exact bilinear
weights (fill_up_weights, dla.py:252-263) and depthwise — reproduced here as
a fixed bilinear resize (the init point; trainable-upsampler delta is
negligible for frozen-backbone few-shot fine-tunes and documented).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.deform_conv import deform_conv2d
from .dla import DLA, DLA_SPECS
from .layers import FrozenBatchNorm


class DeformConvBlock(nn.Module):
    """_DeformConv (dla.py:266-302): modulated DCN + norm + relu."""

    out_channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, H, W, C]."""
        # offset+mask conv initialized to zero (dla.py:287-288)
        om = nn.Conv(27, (3, 3), padding=1,
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros, name="offset")(x)
        # CUDA layout: first 18 channels = offsets (dy,dx interleaved),
        # last 9 = modulation mask (sigmoid)
        offsets = om[..., :18]
        mask = jax.nn.sigmoid(om[..., 18:])
        weights = self.param(
            "kernel", nn.initializers.he_normal(),
            (3, 3, x.shape[-1], self.out_channels),
        )
        y = jax.vmap(lambda xi, oi, mi: deform_conv2d(xi, oi, weights, mi))(
            x, offsets, mask
        )
        y = FrozenBatchNorm(self.out_channels, name="norm")(y)
        return nn.relu(y)


def bilinear_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Depthwise ConvTranspose(k=4, s=2, p=1) with bilinear weights — equal to
    a half-pixel-aligned bilinear resize to 2x."""
    b = x.shape[:-3]
    h, w, c = x.shape[-3], x.shape[-2], x.shape[-1]
    return jax.image.resize(x, (*b, h * 2, w * 2, c), method="linear")


class IDAUp(nn.Module):
    """Iterative deep aggregation (dla.py:304-330)."""

    out_channels: int
    up_factors: Tuple[int, ...]  # per input beyond the first

    @nn.compact
    def __call__(self, layers: List[jnp.ndarray]) -> List[jnp.ndarray]:
        layers = list(layers)
        for i in range(1, len(layers)):
            x = DeformConvBlock(self.out_channels, name=f"proj_{i}")(layers[i])
            f = self.up_factors[i - 1]
            while f > 1:
                x = bilinear_upsample_2x(x)
                f //= 2
            layers[i] = DeformConvBlock(self.out_channels, name=f"node_{i}")(
                x + layers[i - 1]
            )
        return layers


class DLAUp(nn.Module):
    """dla.py:333-357: iteratively merge the deepest level downward."""

    channels: Tuple[int, ...]  # e.g. (64, 128, 256, 512) for levels 2..5

    @nn.compact
    def __call__(self, layers: List[jnp.ndarray]) -> List[jnp.ndarray]:
        chs = list(self.channels)
        layers = list(layers)
        out = [layers[-1]]
        n = len(chs)
        for i in range(n - 1):
            j = n - i - 2  # target level index
            seg = layers[j:]
            seg = IDAUp(
                chs[j], tuple(2 for _ in range(len(seg) - 1)), name=f"ida_{i}"
            )(seg)
            layers[j:] = seg
            out.insert(0, layers[-1])
        return out


class DLASeg(nn.Module):
    """DLA backbone + DLA-Up + final IDA-Up → {'dla2'} stride-4 map."""

    num_layers: int = 34

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        base = DLA(num_layers=self.num_layers,
                   out_features=("dla2", "dla3", "dla4", "dla5"), name="base")(x)
        levels = [base["dla2"], base["dla3"], base["dla4"], base["dla5"]]
        _, channels = DLA_SPECS[self.num_layers]
        up = DLAUp(tuple(channels[2:]), name="dla_up")(levels)
        # final IDA over the three finest decoder outputs → stride 4
        y = IDAUp(channels[2], (2, 4), name="ida_up")(up[:3])
        return {"dla2": y[-1]}
