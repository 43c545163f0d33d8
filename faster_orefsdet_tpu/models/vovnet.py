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

    @nn.compact
    def __call__(self, x):
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


class VoVNet(nn.Module):
    """VoVNet backbone producing {'stage2'..'stage5'} NHWC feature maps."""

    conv_body: str = "V-19-slim-eSE"
    out_features: Tuple[str, ...] = ("stage3", "stage4", "stage5")
    dtype: Optional[jnp.dtype] = None
    # int8 MXU path for the dense 3x3/1x1 convs (depthwise convs and the eSE
    # gate stay in the compute dtype — they are VPU-bound / accuracy gates)
    quant: bool = False

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        stem_chs, conv_chs, out_chs, layer_per_block, blocks, depthwise = (
            VOVNET_STAGE_SPECS[self.conv_body]
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
        # stem: stride-2, stride-1, stride-2 3x3 convs (vovnet.py:407-412);
        # dw variants use depthwise stem convs 2 and 3 (:408-411)
        x = ConvNorm(stem_chs[0], stride=2, dtype=self.dtype,
                     quant=self.quant, name="stem1")(x)
        if depthwise:
            x = DWConvNorm(stem_chs[1], stride=1, dtype=self.dtype, name="stem2")(x)
            x = DWConvNorm(stem_chs[2], stride=2, dtype=self.dtype, name="stem3")(x)
        else:
            x = ConvNorm(stem_chs[1], stride=1, dtype=self.dtype,
                         quant=self.quant, name="stem2")(x)
            x = ConvNorm(stem_chs[2], stride=2, dtype=self.dtype,
                         quant=self.quant, name="stem3")(x)

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
