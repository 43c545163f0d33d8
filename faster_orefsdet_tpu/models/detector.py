"""CenterNet2Detector — the few-shot ore detection meta-architecture.

Re-architecture of fewx/modeling/fsod/fsod_cen.py:38-571 as a multi-method
Flax module. The torch original interleaves per-image python loops, host-side
caches and registry indirection; here each phase is a pure method so the
pipelines can jit the full query path as ONE XLA program:

  features          backbone+FPN                     (fsod_cen.py:165,435)
  refine_support    agp → SM block → transpose quirk (:216-222,367-373)
  correlate         CGM correlation + conv3 fuse     (:230-275,458-509)
  proposal_head     CenterNet head                   (fsod_rpn.py:644-699)
  roi_stage         DSA cascade stage                (fsod_roi_heads.py:459-520)

Support-kernel pooling (1x1 / 1x3 / 3x1) is parameter-free and lives in
`support_kernels` below. Note the reference's `.permute(0,3,2,1)` after the
SM block (fsod_cen.py:220-222) transposes the spatial axes of the support map
(W↔H); we reproduce it because the pooled 1x3/3x1 kernels inherit that
orientation and the released checkpoint encodes it.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..config import Config
from ..ops.adaptive_pool import adaptive_avg_pool2d
from ..ops.correlation import cgm_correlate
from .cascade_roi import DSACascadeHead, StageOutput
from .centernet_head import CenterNetHead
from .fpn import FPN
from .sm_block import SMBlock
from .vovnet import VoVNet

# per-level SM pool size == seg_dim (fsod_cen.py:66-71): p3→32, p4→16, p5→8
SM_POOL_SIZES = {"p3": 32, "p4": 16, "p5": 8}


def support_kernels(mean_map: jnp.ndarray):
    """Pool a (shot-mean, spatially-transposed) support map [W, H, C] into the
    three CGM correlation kernels (fsod_cen.py:72-75,230-232)."""
    k1 = adaptive_avg_pool2d(mean_map, (1, 1))[0, 0]  # [C]
    k13 = adaptive_avg_pool2d(mean_map, (1, 3))[0]  # [3, C] — W-taps on query
    k31 = adaptive_avg_pool2d(mean_map, (3, 1))[:, 0]  # [3, C] — H-taps on query
    return k1, k13, k31


class CenterNet2Detector(nn.Module):
    cfg: Config

    def setup(self):
        import jax.numpy as _jnp

        dtype = None
        if self.cfg.compute_dtype and self.cfg.compute_dtype != "float32":
            dtype = _jnp.dtype(self.cfg.compute_dtype)
        self.compute_dtype = dtype
        qmode = getattr(self.cfg, "quantize", "none")
        if qmode not in ("none", "int8", "int8_static", "int8_resident"):
            # a typo must not silently build an unquantized model
            raise ValueError(
                f"cfg.quantize={qmode!r}; expected 'none', 'int8', "
                "'int8_static' or 'int8_resident'"
            )
        quant = qmode in ("int8", "int8_static", "int8_resident")
        name = self.cfg.backbone_name
        if quant and name != "vovnet_fpn":
            raise ValueError(
                "quantize='int8' is plumbed for the vovnet_fpn family (the "
                f"published live model); got backbone_name={name!r}"
            )
        if name == "vovnet_fpn":
            self.backbone = VoVNet(
                conv_body=self.cfg.vovnet.conv_body,
                out_features=self.cfg.vovnet.out_features,
                dtype=dtype,
                quant=quant,
                # backbone int8-resident; the FPN keeps the int8_static
                # scheme (its inputs are the float stage outputs)
                resident=(qmode == "int8_resident"),
            )
            self.fpn = FPN(
                in_features=self.cfg.fpn.in_features,
                out_channels=self.cfg.fpn.out_channels,
                fuse_type=self.cfg.fpn.fuse_type,
                top_levels=self.cfg.fpn.top_levels,
                dtype=dtype,
                quant=quant,
            )
        elif name == "dla_bifpn":
            from .bifpn import BiFPN
            from .dla import DLA

            self.backbone = DLA(
                num_layers=self.cfg.dla.num_layers,
                out_features=("dla3", "dla4", "dla5"),
                norm=self.cfg.dla.norm,
                dtype=dtype,
            )
            ch = DLA.out_channels(self.cfg.dla.num_layers)
            self.fpn = BiFPN(
                in_features=("dla3", "dla4", "dla5"),
                in_channels=(ch["dla3"], ch["dla4"], ch["dla5"]),
                out_channels=self.cfg.fpn.out_channels,
                num_repeats=self.cfg.fpn.bifpn_repeats,
                norm=self.cfg.fpn.bifpn_norm,
                dtype=dtype,
            )
        elif name == "mnv3_fpn":
            from .mobilenet import MobileNetV3Small

            self.backbone = MobileNetV3Small(out_features=("res3", "res4", "res5"),
                                             dtype=dtype)
            self.fpn = FPN(
                in_features=("res3", "res4", "res5"),
                out_channels=self.cfg.fpn.out_channels,
                fuse_type=self.cfg.fpn.fuse_type,
                top_levels=self.cfg.fpn.top_levels,
                dtype=dtype,
            )
        elif name == "resnet_fpn":
            from .resnet import ResNetC4

            # fpn_p5.build_p35_resnet_fpn_backbone: FPN over res3-res5 → P3-P5
            self.backbone = ResNetC4(
                depth=50, out_features=("res3", "res4", "res5"), dtype=dtype
            )
            self.fpn = FPN(
                in_features=("res3", "res4", "res5"),
                out_channels=self.cfg.fpn.out_channels,
                fuse_type=self.cfg.fpn.fuse_type,
                top_levels=self.cfg.fpn.top_levels,
                dtype=dtype,
            )
        else:
            raise ValueError(f"unknown backbone_name {name!r}")
        c = self.cfg.fpn.out_channels
        self.vip_p3 = SMBlock(c, SM_POOL_SIZES["p3"])
        self.vip_p4 = SMBlock(c, SM_POOL_SIZES["p4"])
        self.vip_p5 = SMBlock(c, SM_POOL_SIZES["p5"])
        # meta-arch conv3 (fsod_cen.py:78) — distinct from the ROI DSA conv3
        self.cgm_conv3 = nn.Dense(c, dtype=dtype, name="cgm_conv3")
        self.head = CenterNetHead(
            in_channels=c,
            dtype=dtype,
            num_levels=len(self.cfg.centernet.in_features),
            num_box_convs=self.cfg.centernet.num_box_convs,
            num_share_convs=self.cfg.centernet.num_share_convs,
            with_agn_hm=self.cfg.centernet.with_agn_hm,
            only_proposal=self.cfg.centernet.only_proposal,
            prior_prob=self.cfg.centernet.prior_prob,
        )
        self.roi = DSACascadeHead(self.cfg.roi)

    @property
    def levels(self) -> Tuple[str, ...]:
        return tuple(self.cfg.centernet.in_features)

    # ---------------------------------------------------------------- phases
    def features(
        self, images: jnp.ndarray, train: bool = False
    ) -> Dict[str, jnp.ndarray]:
        """images: [B, H, W, 3] normalized NHWC → {'p3','p4','p5'} maps.

        `train=True` puts trainable norms (DLA BatchNorm, dla.norm="BN") in
        batch-stats mode; the caller must then apply with
        mutable=["batch_stats"]. Frozen/stateless-norm backbones ignore it.
        """
        if self.cfg.backbone_name == "dla_bifpn":
            return self.fpn(self.backbone(images, train=train))
        return self.fpn(self.backbone(images))

    def refine_support(
        self, sup_feats: Dict[str, jnp.ndarray], *, deterministic: bool = True
    ) -> Dict[str, jnp.ndarray]:
        """Support pyramid [N, h_l, w_l, C] → SM-refined, spatially-transposed
        maps [N, S_l, S_l, C] (S = 32/16/8)."""
        vips = {"p3": self.vip_p3, "p4": self.vip_p4, "p5": self.vip_p5}
        out = {}
        for level in self.levels:
            size = SM_POOL_SIZES[level]
            x = adaptive_avg_pool2d(sup_feats[level], (size, size))
            x = vips[level](x, deterministic=deterministic)
            out[level] = jnp.swapaxes(x, 1, 2)  # the permute(0,3,2,1) quirk
        return out

    def correlate(
        self,
        query_feats: Dict[str, jnp.ndarray],
        kernels: Dict[str, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    ) -> Dict[str, jnp.ndarray]:
        """CGM correlation + shared conv3 fusion per level (fsod_cen.py:235-275).

        With cfg.use_pallas_cgm, the whole level (stencil chain + residual +
        2C->C projection) runs in ONE Pallas VMEM kernel (ops/pallas_cgm.py)
        — kernels[level] must then be per-image-free (the serving cache
        path); init and training keep the XLA composition."""
        use_pallas = (
            getattr(self.cfg, "use_pallas_cgm", False) and not self.is_initializing()
        )
        out = {}
        for level in self.levels:
            q = query_feats[level]
            if use_pallas:
                import jax as _jax

                from ..ops.pallas_cgm import cgm_fused_or_fallback

                w3 = self.variables["params"]["cgm_conv3"]["kernel"]
                b3 = self.variables["params"]["cgm_conv3"]["bias"]
                k1, k13, k31 = kernels[level]
                fused = _jax.vmap(
                    lambda qi: cgm_fused_or_fallback(qi, k1, k13, k31, w3, b3)
                )(q)
                out[level] = fused.astype(q.dtype)
            else:
                corr = cgm_correlate(q, *kernels[level])
                out[level] = nn.relu(
                    self.cgm_conv3(jnp.concatenate([corr, q], axis=-1))
                )
        return out

    def proposal_head(self, pos_features: Dict[str, jnp.ndarray]):
        """CenterNet head over the correlated pyramid → (agn_hms, bbox_regs)."""
        return self.head([pos_features[l] for l in self.levels])

    def roi_stage(
        self,
        features: Sequence[jnp.ndarray],
        boxes: jnp.ndarray,
        support_8: jnp.ndarray,
        support_4: jnp.ndarray,
        stage: int = 0,
    ) -> StageOutput:
        """One cascade stage on the ORIGINAL (un-correlated) pyramid
        (fsod_cen.py:280 passes `features`, not `pos_features`, to roi_heads)."""
        return self.roi(features, boxes, support_8, support_4, stage)
