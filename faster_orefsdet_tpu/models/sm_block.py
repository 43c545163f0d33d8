"""SM block — spatial-shift MLP support refinement (ViP WeightedPermuteMLP).

Re-derivation of fsod_cen.py:573-630 (`SM_Block` + `MLP`): height/width token
mixing through C-sized linear maps on segment-grouped reshapes, followed by a
2-way softmax reweighting. seg_dim is chosen per level so that H*S == C
(p3: 32, p4: 16, p5: 8 with C=128), making mlp_h/mlp_w square [C, C] matrices
— pure MXU matmuls.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class SMBlock(nn.Module):
    dim: int
    seg_dim: int
    drop_rate: float = 0.1  # reweighting-MLP dropout (MLP drop=0.1, :574)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        """x: [B, H, W, C] -> [B, H, W, C]."""
        b, h, w, c = x.shape
        seg = self.seg_dim
        s = c // seg

        # h-mixing (fsod_cen.py:605-615): group channels into `seg` segments,
        # fold H into the feature dim, apply a CxC linear, unfold.
        he = x.reshape(b, h, w, seg, s)
        he = he.transpose(0, 3, 2, 1, 4)  # [B, seg, W, H, S]
        he = he.reshape(b, seg, w, h * s)
        he = nn.Dense(self.dim, use_bias=False, name="mlp_h")(he)
        he = he.reshape(b, seg, w, h, s)
        he = he.transpose(0, 3, 2, 1, 4).reshape(b, h, w, c)

        # w-mixing (:617-618)
        we = x.reshape(b, h, w, seg, s)
        we = we.transpose(0, 3, 1, 2, 4)  # [B, seg, H, W, S]
        we = we.reshape(b, seg, h, w * s)
        we = nn.Dense(self.dim, use_bias=False, name="mlp_w")(we)
        we = we.reshape(b, seg, h, w, s)
        we = we.transpose(0, 2, 3, 1, 4).reshape(b, h, w, c)

        # 2-way reweighting (:620-626): global-mean → MLP(C → C/2 → 2C) →
        # per-channel softmax over the two branches.
        weight = (he + we).mean(axis=(1, 2))  # [B, C]
        weight = nn.Dense(self.dim // 2, name="reweight_fc1")(weight)
        weight = nn.gelu(weight, approximate=False)
        weight = nn.Dropout(self.drop_rate, deterministic=deterministic)(weight)
        weight = nn.Dense(self.dim * 2, name="reweight_fc2")(weight)
        weight = nn.Dropout(self.drop_rate, deterministic=deterministic)(weight)
        weight = weight.reshape(b, c, 2)
        weight = jax.nn.softmax(weight, axis=-1)  # softmax over the 2 branches
        w0 = weight[..., 0][:, None, None, :]  # [B,1,1,C]
        w1 = weight[..., 1][:, None, None, :]

        x = we * w0 + he * w1
        x = nn.Dense(self.dim, name="proj")(x)
        # proj_drop has p=0.0 in the reference → identity
        return x
