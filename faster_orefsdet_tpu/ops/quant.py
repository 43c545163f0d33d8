"""Post-training int8 quantization (W8A8) for the serving conv path.

TPU v5e's MXU runs int8 at 2x the bf16 peak (393.7 vs 196.9 TOPS), so for
serving we offer symmetric post-training quantization: per-output-channel
int8 weights, int8 activations, int32 accumulation on the MXU, dequantized
back to the compute dtype after each conv. No reference analog (the
reference serves f32 torch); this is a TPU-serving capability in the spirit
of its speed goal (BASELINE.md: "detection speed reaches 50 FPS").

Two activation-scale modes:

- DYNAMIC (default): per-example abs-max computed in-program. Simple, no
  calibration, but each conv input pays an extra reduction+broadcast pass
  over the activation tensor — measurably SLOWER on this HBM-bandwidth-bound
  model family (round-3 RESULTS.md: 2,367 vs 3,611 img/s).
- STATIC (calibrated): per-conv scalar scales measured once on a calibration
  batch (pipelines.quant_calib) and baked into the program as constants via
  `static_act_scales(...)` around the trace (models.layers.QuantConv looks
  its path up). The quantize step becomes a pure elementwise op that XLA
  fuses into the producing fusion — no reduction pass, and inter-conv
  activations can materialize as int8 (half the bf16 bytes) on the
  HBM-bound serving path.

Numerics: symmetric scales (zero-point 0) keep the conv a plain int8 dot —
no zero-point correction terms — and per-channel weight scales recover most
of the accuracy of the f32 model (AP A/B in tests/test_quant.py and
RESULTS.md). Quantization happens inside the jitted program: weights are
runtime inputs under jit, so the per-call requantize cost is a few K-element
elementwise pass, invisible next to the conv itself.
"""

from __future__ import annotations

import contextlib
from typing import Dict, Mapping, NamedTuple, Optional, Sequence, Tuple, Union

import numpy as np

import jax.numpy as jnp
from jax import lax

_EPS = 1e-8


class QTensor(NamedTuple):
    """An int8-resident activation: `q * scale` approximates the real tensor.

    `scale` is a positive scalar or per-channel [C] vector (last axis of q).
    In static-calibrated serving it is a Python float / numpy constant, so it
    bakes into the program; in dynamic (calibration) mode it is a traced
    scalar. Flowing QTensors between convs is what keeps inter-conv HBM
    traffic at 1 byte/element — the int8-RESIDENT mode of the module
    docstring: the producer's epilogue writes int8, the consumer folds the
    incoming scale into its own weights (see int8_conv_resident)."""

    q: jnp.ndarray  # int8, channels-last
    scale: Union[float, np.ndarray, jnp.ndarray]

    @property
    def channels(self) -> int:
        return self.q.shape[-1]

    def dequant(self, dtype=jnp.float32) -> jnp.ndarray:
        s = jnp.asarray(self.scale, jnp.float32)
        return (self.q.astype(jnp.float32) * s).astype(dtype)


def qconcat(parts: Sequence[QTensor], axis: int = -1) -> QTensor:
    """Concatenate int8-resident tensors along the channel axis.

    Per-part scalar (or per-channel) scales become one per-channel scale
    vector — no requantization pass: the consumer conv folds the vector into
    its weights (int8_conv_resident), so mixing branch scales is free. This
    is the OSA-concat enabler (the reference concatenates f32 feature maps,
    vovnet.py:326-331; here the concatenated tensor materializes as int8)."""
    assert axis in (-1, parts[0].q.ndim - 1), "qconcat is channels-last only"
    q = jnp.concatenate([p.q for p in parts], axis=-1)
    static = all(not isinstance(p.scale, jnp.ndarray) for p in parts)
    xp = np if static else jnp
    scales = [
        xp.broadcast_to(xp.asarray(p.scale, xp.float32).reshape(-1), (p.channels,))
        for p in parts
    ]
    return QTensor(q, xp.concatenate(scales))

# Trace-time stack of {module_path: float_scale} dicts for static activation
# quantization. Only consulted while a trace is being built (QuantConv reads
# it in Python), so the scales become compile-time constants of the program.
_ACT_SCALES_STACK: list = []


@contextlib.contextmanager
def static_act_scales(scales: Optional[Mapping[str, float]]):
    """Activate calibrated per-conv activation scales for traces built inside
    this context. `scales` maps "/".join(module.path) of each QuantConv to a
    positive float (see pipelines.quant_calib.calibrate_act_scales). None is
    a no-op (dynamic quantization)."""
    if scales is None:
        yield
        return
    _ACT_SCALES_STACK.append(dict(scales))
    try:
        yield
    finally:
        _ACT_SCALES_STACK.pop()


def current_act_scales() -> Optional[Dict[str, float]]:
    return _ACT_SCALES_STACK[-1] if _ACT_SCALES_STACK else None


def quantize_symmetric(
    x: jnp.ndarray, axes: Optional[Tuple[int, ...]] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantization: returns (x_int8, scale) with
    x ≈ x_int8 * scale.

    axes: reduction axes for the abs-max. None = per-tensor (scalar scale);
    otherwise the scale keeps the non-reduced axes (per-channel when axes
    covers all but the channel dim).
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axes, keepdims=axes is not None)
    scale = jnp.maximum(amax / 127.0, _EPS)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_static(x: jnp.ndarray, scale) -> jnp.ndarray:
    """int8-quantize with a fixed (compile-time) scale: pure elementwise."""
    return (
        jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / scale)), -127, 127)
        .astype(jnp.int8)
    )


def int8_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    strides: Union[int, Tuple[int, int]] = 1,
    padding: Union[int, str] = 0,
    feature_group_count: int = 1,
    out_dtype: Optional[jnp.dtype] = None,
    act_scale: Optional[float] = None,
) -> jnp.ndarray:
    """NHWC x HWIO convolution on the int8 MXU path.

    x: [H, W, C] or [B, H, W, C] activations (any float dtype). Activation
    quantization is per-example: the dynamic abs-max reduces over the
    spatial+channel axes only, keeping any leading batch axis — one outlier
    image cannot degrade the whole batch. With `act_scale` (a calibrated
    Python float) the quantize is a pure elementwise op with a baked-in
    constant instead (static mode — see module docstring).
    kernel: [kh, kw, C/groups, O] float weights (quantized per-O-channel).
    Returns float activations in out_dtype (default: x.dtype).
    """
    out_dtype = out_dtype or x.dtype
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    if act_scale is not None:
        xq = quantize_static(x, act_scale)
        sx = jnp.float32(act_scale)
    else:
        # per-example scale: reduce spatial+channel, keep the batch axis
        xq, sx = quantize_symmetric(x, axes=(1, 2, 3))  # sx [B,1,1,1]
    wq, sw = quantize_symmetric(kernel, axes=(0, 1, 2))  # [1,1,1,O]
    if isinstance(strides, int):
        strides = (strides, strides)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    dn = lax.conv_dimension_numbers(xq.shape, wq.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        xq,
        wq,
        strides,
        padding,
        dimension_numbers=dn,
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (sx * sw.reshape(1, 1, 1, -1))
    y = y.astype(out_dtype)
    return y[0] if squeeze else y


def int8_conv_resident(
    x: QTensor,
    kernel: jnp.ndarray,
    strides: Union[int, Tuple[int, int]] = 1,
    padding: Union[int, str] = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """int8 x int8 → int32 convolution over an int8-RESIDENT input.

    The input's (scalar or per-input-channel) scale is folded into the float
    weights BEFORE per-output-channel weight quantization — so a concat of
    branches with different scales (qconcat) costs nothing at the conv: the
    dot is a plain int8 MXU conv either way. Returns the raw int32
    accumulator plus the per-output-channel dequant factor [O]; the caller
    fuses its own epilogue (BN affine, relu, requant) on top — see
    models.layers.ConvNorm resident path.

    Numerics: conv(x.q, quant(kernel * s_in)) * s_w == conv(x_real, kernel)
    up to weight-quantization rounding (same rounding class as int8_conv's).
    """
    s_in = jnp.asarray(x.scale, jnp.float32).reshape(-1)  # scalar -> [1]
    w_eff = kernel.astype(jnp.float32) * s_in.reshape(1, 1, -1, 1)
    wq, sw = quantize_symmetric(w_eff, axes=(0, 1, 2))  # sw [1,1,1,O]
    if isinstance(strides, int):
        strides = (strides, strides)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    xq = x.q
    squeeze = xq.ndim == 3
    if squeeze:
        xq = xq[None]
    dn = lax.conv_dimension_numbers(xq.shape, wq.shape, ("NHWC", "HWIO", "NHWC"))
    acc = lax.conv_general_dilated(
        xq,
        wq,
        strides,
        padding,
        dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    if squeeze:
        acc = acc[0]
    return acc, sw.reshape(-1)


def requantize(y: jnp.ndarray, scale) -> QTensor:
    """float activations → int8-resident with the given (calibrated or
    dynamic) scale: pure elementwise, fuses into the producing epilogue.
    Same int8 grid as quantize_static by construction (it IS the call)."""
    return QTensor(quantize_static(y, scale), scale)


def int8_matmul(
    x: jnp.ndarray, w: jnp.ndarray, out_dtype: Optional[jnp.dtype] = None
) -> jnp.ndarray:
    """[..., K] @ [K, N] on the int8 MXU path (per-tensor x, per-N-column w)."""
    out_dtype = out_dtype or x.dtype
    xq, sx = quantize_symmetric(x)
    wq, sw = quantize_symmetric(w, axes=(0,))  # [1, N]
    y = lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (y.astype(jnp.float32) * (sx * sw)).astype(out_dtype)
