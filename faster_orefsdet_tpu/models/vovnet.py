"""VoVNet backbone family (V-19-slim-eSE is the live spec).

Re-architecture of detectron2.7z!modeling/backbone/vovnet.py:30-489 as Flax
modules in NHWC. Stage specs transcribed from :30-108; the live V-19-slim-eSE
(:50-58): stem [64,64,128], per-stage conv channels [64,80,96,112], concat
channels [112,256,384,512], 3 convs per OSA module, 1 block per stage, eSE on.
Structure confirmed against the golden log model dump (log :557-700).

Freezing (FREEZE_AT=3 → stem+stage2+stage3, vovnet.py:455-469) is handled by
the optimizer mask in solver.py, not by the module.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvNorm, FrozenBatchNorm, hsigmoid, max_pool_ceil

# name -> (stem_chs, stage_conv_chs, stage_out_chs, layer_per_block,
#          block_per_stage, depthwise)
VOVNET_STAGE_SPECS = {
    "V-19-slim-eSE": ([64, 64, 128], [64, 80, 96, 112], [112, 256, 384, 512], 3, [1, 1, 1, 1], False),
    "V-19-eSE": ([64, 64, 128], [128, 160, 192, 224], [256, 512, 768, 1024], 3, [1, 1, 1, 1], False),
    "V-39-eSE": ([64, 64, 128], [128, 160, 192, 224], [256, 512, 768, 1024], 5, [1, 1, 2, 2], False),
    "V-57-eSE": ([64, 64, 128], [128, 160, 192, 224], [256, 512, 768, 1024], 5, [1, 1, 4, 3], False),
    "V-99-eSE": ([64, 64, 128], [128, 160, 192, 224], [256, 512, 768, 1024], 5, [1, 3, 9, 3], False),
    "V-19-slim-dw-eSE": ([64, 64, 64], [64, 80, 96, 112], [112, 256, 384, 512], 3, [1, 1, 1, 1], True),
    "V-19-dw-eSE": ([64, 64, 64], [128, 160, 192, 224], [256, 512, 768, 1024], 3, [1, 1, 1, 1], True),
}


class ESEModule(nn.Module):
    """Effective squeeze-excitation (vovnet.py:247-260): global-average-pool →
    1x1 conv (with bias) → hsigmoid gate."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        g = jnp.mean(x, axis=(-3, -2), keepdims=True)  # [..., 1, 1, C]
        g = nn.Conv(self.features, (1, 1), use_bias=True, dtype=self.dtype, name="fc")(g)
        return x * hsigmoid(g)


class DWConvNorm(nn.Module):
    """dw_conv3x3 (vovnet.py:110-130): depthwise 3x3 + pointwise 1x1, norm on
    the pointwise only."""

    features: int
    stride: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, feature_group_count=x.shape[-1],
                    dtype=self.dtype, name="dw")(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pw")(x)
        x = FrozenBatchNorm(self.features, name="norm")(x)
        return nn.relu(x)


class OSAModule(nn.Module):
    """One-shot-aggregation module (vovnet.py:263-332): chain of 3x3 convs
    whose outputs (plus the input) concatenate into a 1x1 projection + eSE.
    Depthwise variant adds a reduction 1x1 when in != stage channels
    (vovnet.py:284-288)."""

    stage_ch: int
    concat_ch: int
    layer_per_block: int
    identity: bool = False
    depthwise: bool = False
    dtype: Optional[jnp.dtype] = None
    quant: bool = False
    resident: bool = False  # int8-resident chain + concat (layers.ConvNorm)

    @nn.compact
    def __call__(self, x):
        if self.resident:
            return self._resident(x)
        identity_feat = x
        outputs = [x]
        if self.depthwise and x.shape[-1] != self.stage_ch:
            x = ConvNorm(self.stage_ch, kernel_size=1, dtype=self.dtype,
                         quant=self.quant, name="reduction")(x)
        for i in range(self.layer_per_block):
            if self.depthwise:
                x = DWConvNorm(self.stage_ch, dtype=self.dtype, name=f"layer{i}")(x)
            else:
                x = ConvNorm(self.stage_ch, kernel_size=3, dtype=self.dtype,
                             quant=self.quant, name=f"layer{i}")(x)
            outputs.append(x)
        x = jnp.concatenate(outputs, axis=-1)
        x = ConvNorm(self.concat_ch, kernel_size=1, dtype=self.dtype,
                     quant=self.quant, name="concat")(x)
        x = ESEModule(self.concat_ch, dtype=self.dtype, name="ese")(x)
        if self.identity:
            x = x + identity_feat
        return x

    def _resident(self, x):
        """int8-resident OSA: the conv chain and the aggregation concat stay
        int8 end-to-end (per-branch scales ride QTensor metadata and fold
        into the concat conv's weights — ops.quant.qconcat); only the eSE
        gate and the stage output are float. Same param tree as the float /
        int8_static paths. Reference structure: vovnet.py:263-332."""
        from ..ops import quant as quant_ops

        assert not self.depthwise, "int8_resident supports dense OSA only"
        identity_feat = x
        if not isinstance(x, quant_ops.QTensor):
            # one quantize serves both the chain input and the concat
            # contribution; scale keyed by this module's path
            scales = quant_ops.current_act_scales()
            if scales is not None:
                key = "/".join(self.path)
                s_in = scales.get(key)
                if s_in is None:
                    raise ValueError(
                        f"int8_resident: no calibrated input scale for OSA "
                        f"{key!r} — re-run calibrate_act_scales"
                    )
            else:
                s_in = jnp.maximum(
                    jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0, 1e-8
                )
            if self.is_mutable_collection("act_amax"):
                self.sow(
                    "act_amax",
                    "amax",
                    jnp.max(jnp.abs(x.astype(jnp.float32))),
                    reduce_fn=jnp.maximum,
                    init_fn=lambda: jnp.zeros((), jnp.float32),
                )
            x = quant_ops.requantize(x.astype(jnp.float32), s_in)
        outputs = [x]
        for i in range(self.layer_per_block):
            x = ConvNorm(self.stage_ch, kernel_size=3, dtype=self.dtype,
                         quant=True, resident=True, name=f"layer{i}")(x)
            outputs.append(x)
        x = quant_ops.qconcat(outputs)
        x = ConvNorm(self.concat_ch, kernel_size=1, dtype=self.dtype,
                     quant=True, resident=True, emit_float=True,
                     name="concat")(x)
        x = ESEModule(self.concat_ch, dtype=self.dtype, name="ese")(x)
        if self.identity:
            assert not isinstance(identity_feat, quant_ops.QTensor)
            x = x + identity_feat
        return x


class VoVNet(nn.Module):
    """VoVNet backbone producing {'stage2'..'stage5'} NHWC feature maps."""

    conv_body: str = "V-19-slim-eSE"
    out_features: Tuple[str, ...] = ("stage3", "stage4", "stage5")
    dtype: Optional[jnp.dtype] = None
    # int8 MXU path for the dense 3x3/1x1 convs (depthwise convs and the eSE
    # gate stay in the compute dtype — they are VPU-bound / accuracy gates)
    quant: bool = False
    # int8-RESIDENT: stem chain + OSA internals materialize as int8 between
    # convs (QTensor flow; see layers.ConvNorm); stage outputs stay float at
    # the eSE gates, so the FPN/heads are unchanged. Dense specs only.
    resident: bool = False

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        stem_chs, conv_chs, out_chs, layer_per_block, blocks, depthwise = (
            VOVNET_STAGE_SPECS[self.conv_body]
        )
        if self.resident and depthwise:
            raise ValueError(
                "quantize='int8_resident' supports the dense VoVNet specs "
                f"only (got {self.conv_body!r})"
            )
        if self.dtype is not None:
            x = x.astype(self.dtype)
        # stem: stride-2, stride-1, stride-2 3x3 convs (vovnet.py:407-412);
        # dw variants use depthwise stem convs 2 and 3 (:408-411)
        stem_q = self.resident
        # the stem chain can stay int8-resident straight into stage2's OSA
        # (no pool between, vovnet.py:349: stage2 does not downsample) —
        # unless the caller wants the stem feature map itself
        stem_emits_float = "stem" in self.out_features
        x = ConvNorm(stem_chs[0], stride=2, dtype=self.dtype,
                     quant=self.quant, resident=stem_q, name="stem1")(x)
        if depthwise:
            x = DWConvNorm(stem_chs[1], stride=1, dtype=self.dtype, name="stem2")(x)
            x = DWConvNorm(stem_chs[2], stride=2, dtype=self.dtype, name="stem3")(x)
        else:
            x = ConvNorm(stem_chs[1], stride=1, dtype=self.dtype,
                         quant=self.quant, resident=stem_q, name="stem2")(x)
            x = ConvNorm(stem_chs[2], stride=2, dtype=self.dtype,
                         quant=self.quant, resident=stem_q,
                         emit_float=stem_emits_float, name="stem3")(x)

        outputs = {}
        if "stem" in self.out_features:
            outputs["stem"] = x
        for i in range(4):
            stage_num = i + 2
            name = f"stage{stage_num}"
            if stage_num != 2:  # stages 3-5 downsample first (vovnet.py:349-350)
                x = max_pool_ceil(x, 3, 2)
            for b in range(blocks[i]):
                # only the last block of a multi-block stage keeps eSE in the
                # reference; V-19 has 1 block/stage so eSE is always on
                x = OSAModule(
                    conv_chs[i],
                    out_chs[i],
                    layer_per_block,
                    identity=(b > 0),
                    depthwise=depthwise,
                    dtype=self.dtype,
                    quant=self.quant,
                    resident=self.resident,
                    name=f"{name}_block{b}",
                )(x)
            if name in self.out_features:
                outputs[name] = x
        return outputs

    @staticmethod
    def out_channels(conv_body: str) -> Dict[str, int]:
        stem_chs, _, out_chs, _, _, _ = VOVNET_STAGE_SPECS[conv_body]
        d = {"stem": stem_chs[2]}
        for i in range(4):
            d[f"stage{i + 2}"] = out_chs[i]
        return d

    @staticmethod
    def out_strides() -> Dict[str, int]:
        return {"stem": 4, "stage2": 4, "stage3": 8, "stage4": 16, "stage5": 32}
