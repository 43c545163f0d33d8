"""Shared NN building blocks (Flax linen, NHWC layout).

TPU-native equivalents of the detectron2 layer zoo actually exercised by the
live model: FrozenBatchNorm2d (folded to affine), GroupNorm, ceil-mode max
pool, nearest x2 upsampling, hard sigmoid. All convs run channel-last with
HWIO kernels — the natural TPU layout (lane dim = channels).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """FrozenBatchNorm2d (detectron2.7z!layers/batch_norm.py) folded to a
    per-channel affine y = x * scale + bias.

    The reference freezes BN everywhere on the live path (VOVNET.NORM =
    "FrozenBN", golden log model dump). Folding (scale = w/sqrt(var+eps),
    bias = b - mean*scale) happens at weight-conversion time; fresh
    initialization is identity. Parameters are excluded from optimization by
    the solver's frozen-mask (solver.py)."""

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # keep activations in the compute dtype (bf16 path stays bf16)
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


def hsigmoid(x):
    """Hsigmoid: relu6(x + 3) / 6 (vovnet.py:238-244)."""
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


class QuantConv(nn.Module):
    """Drop-in nn.Conv replacement running on the int8 MXU path
    (ops.quant.int8_conv): f32 master weights (SAME param tree as nn.Conv —
    'kernel' [+ 'bias'] in HWIO, so converted checkpoints load unchanged),
    quantized per-output-channel inside the jitted program; activations
    quantized per-example dynamically, or with a calibrated static scale
    when the trace runs inside ops.quant.static_act_scales(...) (keyed by
    this module's path). Bias stays float, added post-dequant.

    Calibration: applying with mutable=["act_amax"] records the conv-input
    abs-max into that collection (pipelines.quant_calib turns it into the
    static-scale dict)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: int = 1
    padding: int = 0
    use_bias: bool = False
    dtype: Optional[jnp.dtype] = None  # dequant output dtype

    @nn.compact
    def __call__(self, x, *, raw: bool = False):
        from ..ops import quant

        is_q = isinstance(x, quant.QTensor)
        in_ch = x.channels if is_q else x.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, in_ch, self.features),
        )
        if not is_q:
            out_dtype = self.dtype or x.dtype
            if self.is_mutable_collection("act_amax"):
                self.sow(
                    "act_amax",
                    "amax",
                    jnp.max(jnp.abs(x.astype(jnp.float32))),
                    reduce_fn=jnp.maximum,
                    init_fn=lambda: jnp.zeros((), jnp.float32),
                )
            act_scale = None
            scales = quant.current_act_scales()
            if scales is not None:
                key = "/".join(self.path)
                act_scale = scales.get(key)
                if act_scale is None:
                    # a silent miss would fall back to DYNAMIC quantization for
                    # just this conv — the program would quietly mix static and
                    # dynamic (stale calibration file after a module rename)
                    raise ValueError(
                        f"int8_static: no calibrated activation scale for conv "
                        f"{key!r} (calibration has {len(scales)} entries) — "
                        "re-run pipelines.quant_calib.calibrate_act_scales"
                    )
            if not raw:
                y = quant.int8_conv(
                    x, kernel, self.strides, self.padding,
                    out_dtype=out_dtype, act_scale=act_scale,
                )
                if self.use_bias:
                    bias = self.param("bias", nn.initializers.zeros, (self.features,))
                    y = y + bias.astype(y.dtype)
                return y
            # raw over a float input: quantize here (static scale, or a
            # per-TENSOR dynamic scalar — resident tensors carry one scale,
            # not the per-example [B,1,1,1] of the plain int8 path), then
            # fall through to the resident conv
            if act_scale is not None:
                x = quant.QTensor(quant.quantize_static(x, act_scale), act_scale)
            else:
                q, s = quant.quantize_symmetric(x)
                x = quant.QTensor(q, s)
        # int8-resident input: incoming (possibly per-channel) scale folds
        # into the weights; no quantize pass, no input sow (the producer's
        # epilogue owns that boundary)
        acc, factor = quant.int8_conv_resident(
            x, kernel, self.strides, self.padding
        )
        if raw:
            return acc, factor
        y = (acc.astype(jnp.float32) * factor).astype(self.dtype or jnp.float32)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class ConvNorm(nn.Module):
    """conv (no bias) + FrozenBN [+ relu] — the VoVNet conv3x3/conv1x1 unit
    (vovnet.py:205-236). quant=True swaps the conv onto the int8 MXU path
    (identical param tree).

    resident=True (implies quant) runs the int8-RESIDENT pipeline: the conv
    consumes a float array OR an ops.quant.QTensor, and the whole epilogue
    — int32 dequant, FrozenBN affine, relu, requantize — fuses into one
    per-channel elementwise pass so the tensor written to HBM is int8
    (emit_float=False) with a calibrated output scale keyed by this module's
    path (dynamic abs-max when no static_act_scales context is active, i.e.
    during calibration). This is what the plain int8_static mode cannot do:
    there each conv dequantizes to the wide compute dtype and the OSA concat
    materializes wide (RESULTS.md round-5 roofline reconciliation)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    relu: bool = True
    dtype: Optional[jnp.dtype] = None
    quant: bool = False
    resident: bool = False
    emit_float: bool = False  # resident only: skip the output requant

    @nn.compact
    def __call__(self, x):
        from ..ops import quant as quant_ops

        if self.resident:
            acc, factor = QuantConv(
                self.features,
                (self.kernel_size, self.kernel_size),
                strides=self.stride,
                padding=self.kernel_size // 2,
                use_bias=False,
                name="conv",
            )(x, raw=True)
            y = acc.astype(jnp.float32) * factor
            y = FrozenBatchNorm(self.features, name="norm")(y)
            if self.relu:
                y = nn.relu(y)
            if self.emit_float:
                return y.astype(self.dtype or jnp.float32)
            if self.is_mutable_collection("act_amax"):
                self.sow(
                    "act_amax",
                    "amax",
                    jnp.max(jnp.abs(y)),
                    reduce_fn=jnp.maximum,
                    init_fn=lambda: jnp.zeros((), jnp.float32),
                )
            scales = quant_ops.current_act_scales()
            if scales is not None:
                key = "/".join(self.path)
                s_out = scales.get(key)
                if s_out is None:
                    raise ValueError(
                        f"int8_resident: no calibrated OUTPUT scale for "
                        f"{key!r} (calibration has {len(scales)} entries) — "
                        "re-run calibrate_act_scales with the resident config"
                    )
            else:
                s_out = jnp.maximum(jnp.max(jnp.abs(y)) / 127.0, 1e-8)
            return quant_ops.requantize(y, s_out)
        if self.quant:
            x = QuantConv(
                self.features,
                (self.kernel_size, self.kernel_size),
                strides=self.stride,
                padding=self.kernel_size // 2,
                use_bias=False,
                dtype=self.dtype,
                name="conv",
            )(x)
        else:
            x = nn.Conv(
                self.features,
                (self.kernel_size, self.kernel_size),
                strides=self.stride,
                padding=self.kernel_size // 2,
                use_bias=False,
                dtype=self.dtype,
                name="conv",
            )(x)
        x = FrozenBatchNorm(self.features, name="norm")(x)
        if self.relu:
            x = nn.relu(x)
        return x


def max_pool_ceil(x: jnp.ndarray, window: int = 3, stride: int = 2) -> jnp.ndarray:
    """MaxPool2d(kernel=3, stride=2, ceil_mode=True) (vovnet.py:350).

    torch ceil mode: out = ceil((H - window)/stride) + 1; emulated by padding
    bottom/right with -inf before a VALID-window reduce."""
    h, w = x.shape[-3], x.shape[-2]

    def pad_amount(size):
        out = -(-(size - window) // stride) + 1
        return max(0, (out - 1) * stride + window - size)

    ph, pw = pad_amount(h), pad_amount(w)
    neg = jnp.asarray(-jnp.inf, x.dtype)
    x = jnp.pad(
        x,
        [(0, 0)] * (x.ndim - 3) + [(0, ph), (0, pw), (0, 0)],
        constant_values=neg,
    )
    return nn.max_pool(x, (window, window), strides=(stride, stride), padding="VALID")


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """F.interpolate(scale_factor=2, mode='nearest') (fpn.py:139)."""
    x = jnp.repeat(x, 2, axis=-3)
    x = jnp.repeat(x, 2, axis=-2)
    return x


class Scale(nn.Module):
    """Learned scalar multiplier (centernet_head.py:13-19)."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        s = self.param("scale", nn.initializers.constant(self.init_value), (1,))
        return x * s


def group_norm(x, num_groups: int = 32, name: str = "gn"):
    return nn.GroupNorm(num_groups=num_groups, epsilon=1e-5, name=name)(x)
