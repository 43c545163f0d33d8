"""AttentionRPN baseline model family (FsodRCNN) — TPU-native rebuild.

The reference's second meta-architecture (ALT configs Base-FSOD-C4.yaml /
finetune_R_50_C4_1x.yaml): a ResNet-50-C4 few-shot detector published as the
AttentionRPN/FewX baseline that Faster-OreFSDet compares against
(README.md:27-35). Components re-derived here:

  FsodRCNN          meta-arch              fewx/modeling/fsod/fsod_rcnn.py:36-551
  dense-relation    support enhancement    fsod_rcnn.py:219-247 (pos-encoding +
                    (rpn + rcnn)           channel-k softmax + 0.5*leaky_relu)
  polarized attn    channel-only branch    fsod_rcnn.py:571-613
  FsodRPN           anchor RPN             fsod_rpn.py:74-487 (192-ch head)
  FsodRes5ROIHeads  C4 ROI head            fsod_roi_heads.py:53-215
  multi-relation    3-relation predictor   fsod_fast_rcnn.py:370-589
  head              (global/local/patch)

Static-shape design: anchors are compile-time constants; proposal selection
and anchor sampling are masked fixed-K; the per-class eval loop
(eval_with_support, 100 proposals/class) vmaps over the support-class axis.
"""

from __future__ import annotations

import math
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nms import nms_mask
from ..structures.boxes import apply_deltas, clip_boxes, encode_deltas, pairwise_iou
from ..structures.instances import GroundTruth, Proposals
from .resnet import Res5Stage, ResNetC4


# ------------------------------------------------------------------ anchors
def generate_anchors(
    feat_hw: Tuple[int, int],
    stride: int = 16,
    sizes: Sequence[float] = (32, 64, 128, 256, 512),
    aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0),
) -> jnp.ndarray:
    """d2 DefaultAnchorGenerator (offset 0): [H*W*A, 4] xyxy anchors.

    Cell anchors: for size s, ratio a: w = s/sqrt(a), h = s*sqrt(a), centered
    at grid points (ix*stride, iy*stride). A iterates sizes-major? d2 orders
    cell anchors as [size, aspect] nested (sizes outer loop? — d2
    generate_cell_anchors loops sizes then aspect_ratios)."""
    cell = []
    for s in sizes:
        area = s * s
        for a in aspect_ratios:
            w = math.sqrt(area / a)
            h = a * w
            cell.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    cell = np.asarray(cell, np.float32)  # [A, 4]
    h, w = feat_hw
    sx = np.arange(w, dtype=np.float32) * stride
    sy = np.arange(h, dtype=np.float32) * stride
    gx, gy = np.meshgrid(sx, sy)
    shifts = np.stack([gx.reshape(-1), gy.reshape(-1)] * 2, axis=1)  # [HW, 4]
    anchors = shifts[:, None, :] + cell[None, :, :]  # [HW, A, 4]
    return jnp.asarray(anchors.reshape(-1, 4))


# ------------------------------------------------------------------ RPN head
class RPNHead(nn.Module):
    """StandardRPNHead with the fewx 192-channel hidden conv
    (fsod_rpn.py:100-104)."""

    num_anchors: int = 15
    hidden: int = 192
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, feat: jnp.ndarray):
        t = nn.relu(
            nn.Conv(self.hidden, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=nn.initializers.normal(0.01), name="conv")(feat)
        )
        logits = nn.Conv(self.num_anchors, (1, 1),
                         kernel_init=nn.initializers.normal(0.01),
                         name="objectness")(t)
        deltas = nn.Conv(self.num_anchors * 4, (1, 1),
                         kernel_init=nn.initializers.normal(0.01),
                         name="deltas")(t)
        return logits, deltas


RPN_BOX_WEIGHTS = (1.0, 1.0, 1.0, 1.0)


def rpn_label_anchors(
    anchors: jnp.ndarray,
    gt: GroundTruth,
    rng: jax.Array,
    batch_size: int = 256,
    positive_fraction: float = 0.5,
    thresholds: Tuple[float, float] = (0.3, 0.7),
):
    """d2 Matcher([0.3,0.7],[0,-1,1],allow_low_quality=True) + subsample_labels
    (fsod_rpn.py:262-317). Returns (labels [K] in {-1,0,1} post-sampling,
    matched_gt_boxes [K,4])."""
    iou = pairwise_iou(gt.boxes, anchors)  # [N, K]
    iou = jnp.where(gt.valid[:, None], iou, -1.0)
    matched_idx = jnp.argmax(iou, axis=0)
    matched_iou = jnp.max(iou, axis=0)
    labels = jnp.where(
        matched_iou >= thresholds[1], 1, jnp.where(matched_iou >= thresholds[0], -1, 0)
    )
    # low-quality matches: for each gt, anchors tying its best IoU become fg
    best_per_gt = jnp.max(iou, axis=1, keepdims=True)  # [N,1]
    low_quality = jnp.any(
        (iou >= best_per_gt) & (best_per_gt > 0) & gt.valid[:, None], axis=0
    )
    labels = jnp.where(low_quality, 1, labels)

    # subsample to batch_size with positive_fraction; rest -> -1 (ignore)
    k = anchors.shape[0]
    r = jax.random.uniform(rng, (k,))
    max_pos = int(batch_size * positive_fraction)
    pos = labels == 1
    neg = labels == 0
    pos_rank = jnp.argsort(jnp.argsort(jnp.where(pos, r, 2.0)))
    neg_rank = jnp.argsort(jnp.argsort(jnp.where(neg, r, 2.0)))
    num_pos = jnp.minimum(jnp.sum(pos), max_pos)
    num_neg = jnp.minimum(jnp.sum(neg), batch_size - num_pos)
    sampled = (pos & (pos_rank < num_pos)) | (neg & (neg_rank < num_neg))
    labels = jnp.where(sampled, labels, -1)
    matched_boxes = gt.boxes[matched_idx]
    return labels, matched_boxes


def rpn_losses(
    anchors: jnp.ndarray,
    logits: jnp.ndarray,
    deltas: jnp.ndarray,
    labels: jnp.ndarray,
    matched_boxes: jnp.ndarray,
    batch_size: int = 256,
    smooth_l1_beta: float = 0.0,
):
    """fsod_rpn.py:319-378: BCE on sampled anchors + L1 on positives,
    normalized by batch_size (x num_images=1 per call)."""
    from ..ops.losses import smooth_l1_loss

    pos = labels == 1
    valid = labels >= 0
    gt_deltas = encode_deltas(anchors, matched_boxes, RPN_BOX_WEIGHTS)
    loc = smooth_l1_loss(deltas, gt_deltas, smooth_l1_beta)
    loc = jnp.sum(jnp.where(pos[:, None], loc, 0.0))
    obj = jnp.where(
        valid,
        jnp.maximum(logits, 0) - logits * (labels == 1) + jnp.log1p(jnp.exp(-jnp.abs(logits))),
        0.0,
    )
    obj = jnp.sum(obj)
    return {
        "loss_rpn_cls": obj / batch_size,
        "loss_rpn_loc": loc / batch_size,
    }


def rpn_predict_proposals(
    anchors: jnp.ndarray,
    logits: jnp.ndarray,
    deltas: jnp.ndarray,
    image_hw,
    *,
    pre_nms_topk: int,
    post_nms_topk: int,
    nms_thresh: float = 0.7,
) -> Proposals:
    """find_top_rpn_proposals for the single-level C4 RPN
    (d2 proposal_utils; wired fsod_rpn.py:436-466), fixed-K masked."""
    k = min(pre_nms_topk, logits.shape[0])
    top_scores, top_idx = jax.lax.top_k(logits, k)
    boxes = apply_deltas(deltas[top_idx], anchors[top_idx], RPN_BOX_WEIGHTS)
    boxes = clip_boxes(boxes, image_hw)
    wh = boxes[:, 2:] - boxes[:, :2]
    valid = jnp.isfinite(top_scores) & (wh[:, 0] > 0) & (wh[:, 1] > 0)
    keep = nms_mask(boxes, top_scores, valid, nms_thresh)
    post_nms_topk = min(post_nms_topk, top_scores.shape[0])
    sel_scores, sel_idx = jax.lax.top_k(jnp.where(keep, top_scores, -jnp.inf), post_nms_topk)
    return Proposals(
        boxes=boxes[sel_idx], scores=sel_scores, valid=jnp.isfinite(sel_scores)
    )


# ------------------------------------------------------ support enhancement
def positional_encoding_table(max_len: int, d_model: int) -> jnp.ndarray:
    """Sinusoidal PE (fsod_rcnn.py:553-568) [max_len, d_model]."""
    pe = np.zeros((max_len, d_model), np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * -(math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return jnp.asarray(pe)


class DenseRelationEnhance(nn.Module):
    """Per-shot support enhancement (fsod_rcnn.py:219-241): add positional
    encoding, compute a softmax spatial attention over tokens through a
    channel-k linear, and add 0.5*leaky_relu(global) back."""

    d_model: int  # 1024 (rpn) or 2048 (rcnn)
    max_len: int  # 196 (14x14) or 49 (7x7)

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """tokens: [S, L, C] (S shots, L tokens) -> enhanced [S, L, C]."""
        pe = positional_encoding_table(self.max_len, self.d_model)
        x = tokens + pe[None]
        w = nn.Dense(1, name="channel_k")(x)  # [S, L, 1]
        w = jax.nn.softmax(w, axis=1)
        global_vec = jnp.einsum("slo,slc->soc", w, x)  # [S, 1, C]
        return x + 0.5 * nn.leaky_relu(global_vec)


class PolarizedChannelAttention(nn.Module):
    """Channel-only branch of polarized self-attention, queried by the support
    (fsod_rcnn.py:571-613): weight = sigmoid(LN(Wz @ (Wv(x) @ softmax(Wq(q)))))."""

    channel: int = 1024

    @nn.compact
    def __call__(self, x: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
        """x: [1, H, W, C] pooled query (14x14); q: [1, H, W, C] support map.
        Returns channel weight [1, 1, 1, C]."""
        c = self.channel
        wv = nn.Dense(c // 2, name="ch_wv")(x)  # [1,H,W,C/2]
        wq = nn.Dense(1, name="ch_wq")(q)  # [1,H,W,1]
        b = x.shape[0]
        wv = wv.reshape(b, -1, c // 2)  # [1, HW, C/2]
        wq = jax.nn.softmax(wq.reshape(b, -1, 1), axis=1)  # [1, HW, 1]
        wz = jnp.einsum("bnc,bno->bc", wv, wq)  # [1, C/2]
        z = nn.Dense(c, name="ch_wz")(wz)  # [1, C]
        z = nn.LayerNorm(name="ln")(z)
        return jax.nn.sigmoid(z)[:, None, None, :]  # [1,1,1,C]


# ------------------------------------------------------ multi-relation head
class StagePred(NamedTuple):
    scores: jnp.ndarray  # [R, 2]
    deltas: jnp.ndarray  # [R, 4]


class MultiRelationHead(nn.Module):
    """FsodFastRCNNOutputLayers (fsod_fast_rcnn.py:370-589): global (concat +
    7x7 avgpool FC), local (1024-group depthwise correlation), patch (49x49
    transformer attention) relations; fused scores cor/0.1 + fc + pr and
    boxes bbox_cor/0.1."""

    dim_in: int = 2048
    reduce_dim: int = 256

    @nn.compact
    def __call__(self, x_query: jnp.ndarray, x_support: jnp.ndarray) -> StagePred:
        """x_query [R, 7, 7, 2048]; x_support [1, 7, 7, 2048] (shot-mean)."""
        half = self.dim_in // 2  # 1024
        conv1 = nn.Dense(half, use_bias=False,
                         kernel_init=nn.initializers.normal(0.01), name="conv_1")
        q = nn.relu(conv1(x_query))  # [R,7,7,1024]
        s = nn.relu(conv1(x_support))  # [1,7,7,1024]

        # global relation (:528-534): concat, 7x7 avgpool, linear -> 2
        s_exp = jnp.broadcast_to(s, q.shape)
        cat_fc = jnp.concatenate([q, s_exp], axis=-1).mean(axis=(1, 2))  # [R, 2048]
        cls_fc = nn.Dense(2, kernel_init=nn.initializers.normal(0.01),
                          name="cls_score_fc")(cat_fc)

        # local correlation (:537-548): depthwise 7x7 correlation == per-channel
        # dot product of query and support maps
        x_cor = nn.relu(jnp.einsum("rhwc,ohwc->rc", q, s))  # [R, 1024]
        cls_cor = nn.Dense(2, kernel_init=nn.initializers.normal(0.01),
                           name="cls_score_cor")(x_cor)
        bbox_cor = nn.Dense(4, kernel_init=nn.initializers.normal(0.001),
                            name="bbox_pred_cor")(x_cor)

        # patch relation (:562-576): 49-token cross attention map -> linear
        r = q.shape[0]
        pe = positional_encoding_table(49, half)
        sup_tok = s.reshape(1, 49, half) + pe[None]
        qry_tok = q.reshape(r, 49, half) + pe[None]
        k_mat = nn.Dense(self.reduce_dim, kernel_init=nn.initializers.normal(0.01),
                         name="adapt_k")(sup_tok)
        k_mat = k_mat - k_mat.mean(axis=1, keepdims=True)
        q_mat = nn.Dense(self.reduce_dim, kernel_init=nn.initializers.normal(0.01),
                         name="adapt_q")(qry_tok)
        q_mat = q_mat - q_mat.mean(axis=1, keepdims=True)
        attn = jnp.einsum("rlc,okc->rlk", q_mat, k_mat) / math.sqrt(self.reduce_dim)
        attn = jax.nn.softmax(attn, axis=2)  # [R, 49, 49]
        cls_pr = nn.Dense(2, kernel_init=nn.initializers.normal(0.01),
                          name="cls_score_pr")(attn.reshape(r, -1))

        scores = cls_cor / 0.1 + cls_fc + cls_pr  # (:583)
        deltas = bbox_cor / 0.1  # (:585)
        return StagePred(scores=scores, deltas=deltas)


# ------------------------------------------------------------ the meta-arch
class FsodRCNN(nn.Module):
    """AttentionRPN baseline meta-arch: methods mirror CenterNet2Detector's
    phase structure so the pipelines can jit end-to-end."""

    depth: int = 50
    num_anchors: int = 15
    dtype_str: str = "float32"

    def setup(self):
        dtype = None if self.dtype_str == "float32" else jnp.dtype(self.dtype_str)
        self.backbone = ResNetC4(depth=self.depth, out_features=("res4",), dtype=dtype)
        self.rpn_head_mod = RPNHead(num_anchors=self.num_anchors, dtype=dtype)
        self.res5 = Res5Stage(dtype=dtype)
        self.relation_head = MultiRelationHead()
        self.rpn_enhance = DenseRelationEnhance(1024, 196)
        self.rcnn_enhance = DenseRelationEnhance(2048, 49)
        self.channel_attention = PolarizedChannelAttention(1024)

    # ---- phases
    def features(self, images: jnp.ndarray) -> jnp.ndarray:
        """[B,H,W,3] -> res4 [B,H/16,W/16,1024]."""
        return self.backbone(images)["res4"]

    def enhance_support_rpn(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """[S, 196, 1024] pooled support tokens -> enhanced mean map
        [1, 14, 14, 1024] (fsod_rcnn.py:242-243)."""
        e = self.rpn_enhance(tokens)  # [S,196,1024]
        m = e.mean(axis=0)  # [196, 1024]
        # reference: view(1,-1,14,1024).transpose(1,3) == [1,1024,14,14] NCHW
        # whose NHWC equivalent transposes the spatial axes: [14,14] read as
        # (w-major) -> [1, 14, 14, 1024] with axes swapped
        m = m.reshape(14, 14, 1024)
        return jnp.swapaxes(m, 0, 1)[None]

    def enhance_support_rcnn(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """[S, 49, 2048] res5 support tokens -> [1, 7, 7, 2048]."""
        e = self.rcnn_enhance(tokens)
        m = e.mean(axis=0).reshape(7, 7, 2048)
        return jnp.swapaxes(m, 0, 1)[None]

    def rpn_attention(
        self, query_res4: jnp.ndarray, support_map: jnp.ndarray
    ) -> jnp.ndarray:
        """AttentionRPN + channel attention fusion (fsod_rcnn.py:260-266):
        channel_att = PSA(agp14(query), support) * query
        spatial_att = depthwise 1x1 correlation with support global vector
        returns channel_att + spatial_att. query_res4 [1,h,w,1024];
        support_map [1,14,14,1024]."""
        from ..ops.adaptive_pool import adaptive_avg_pool2d

        pooled_q = adaptive_avg_pool2d(query_res4, (14, 14))
        cw = self.channel_attention(pooled_q, support_map)  # [1,1,1,1024]
        channel_att = cw * query_res4
        sup_vec = support_map.mean(axis=(1, 2))[0]  # [1024]
        spatial_att = query_res4 * sup_vec  # 1x1 depthwise conv == scale
        return channel_att + spatial_att

    def rpn_head(self, pos_features: jnp.ndarray):
        """[1,h,w,1024] -> (logits [h*w*A], deltas [h*w*A,4]) flattened in d2
        anchor order (row-major cells, A fastest)."""
        logits, deltas = self.rpn_head_mod(pos_features)
        b, h, w, a = logits.shape
        return logits.reshape(-1), deltas.reshape(b, h, w, a, 4).reshape(-1, 4)

    def res5_transform(self, pooled: jnp.ndarray) -> jnp.ndarray:
        """[R, 14, 14, 1024] pooled ROIs -> [R, 7, 7, 2048]."""
        return self.res5(pooled)

    def relation(self, x_query: jnp.ndarray, x_support: jnp.ndarray) -> StagePred:
        return self.relation_head(x_query, x_support)
