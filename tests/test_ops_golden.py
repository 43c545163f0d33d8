"""Golden tests: TPU-native ops vs torch CPU reference math.

Each test transcribes the reference computation (cited file:line) in
torch/numpy and compares our JAX op against it on random inputs.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from faster_orefsdet_tpu.ops import (
    adaptive_avg_pool2d,
    batched_nms_mask,
    cgm_correlate,
    iou_loss_ltrb,
    keep_top_scores,
    nms_mask,
    roi_align,
    smooth_l1_loss,
    softmax_cross_entropy,
)
from faster_orefsdet_tpu.ops.losses import binary_heatmap_focal_loss
from faster_orefsdet_tpu.structures.boxes import (
    apply_deltas,
    encode_deltas,
    pairwise_iou,
)


# ---------------------------------------------------------------- adaptive pool
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((30, 30), (32, 32)), ((32, 32), (1, 1)), ((32, 32), (1, 3)), ((16, 16), (3, 1)),
     ((8, 8), (8, 8)), ((15, 15), (16, 16)), ((7, 9), (3, 4))],
)
def test_adaptive_avg_pool_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((2, *in_hw, 5), dtype=np.float32)
    ours = np.asarray(adaptive_avg_pool2d(jnp.asarray(x), out_hw))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
    ref = F.adaptive_avg_pool2d(xt, out_hw).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------- pairwise IoU
def _iou_np(b1, b2):
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return np.where(inter > 0, inter / (a1[:, None] + a2[None] - inter), 0.0)


def _rand_boxes(rng, n, size=100.0):
    xy = rng.uniform(0, size, (n, 2)).astype(np.float32)
    wh = rng.uniform(1, size / 2, (n, 2)).astype(np.float32)
    return np.concatenate([xy, xy + wh], axis=1)


def test_pairwise_iou(rng):
    b1, b2 = _rand_boxes(rng, 13), _rand_boxes(rng, 7)
    ours = np.asarray(pairwise_iou(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(ours, _iou_np(b1, b2), rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------- box deltas
def test_box_deltas_roundtrip(rng):
    """Box2BoxTransform (box_regression.py:42-117), weights (10,10,5,5)."""
    w = (10.0, 10.0, 5.0, 5.0)
    src = _rand_boxes(rng, 20)
    tgt = _rand_boxes(rng, 20)
    d = encode_deltas(jnp.asarray(src), jnp.asarray(tgt), w)
    rec = np.asarray(apply_deltas(d, jnp.asarray(src), w))
    np.testing.assert_allclose(rec, tgt, rtol=1e-4, atol=1e-3)

    # cross-check deltas against the reference formula in torch
    st, tt = torch.from_numpy(src), torch.from_numpy(tgt)
    sw, sh = st[:, 2] - st[:, 0], st[:, 3] - st[:, 1]
    scx, scy = st[:, 0] + 0.5 * sw, st[:, 1] + 0.5 * sh
    tw, th = tt[:, 2] - tt[:, 0], tt[:, 3] - tt[:, 1]
    tcx, tcy = tt[:, 0] + 0.5 * tw, tt[:, 1] + 0.5 * th
    ref = torch.stack(
        [10 * (tcx - scx) / sw, 10 * (tcy - scy) / sh,
         5 * torch.log(tw / sw), 5 * torch.log(th / sh)], dim=1).numpy()
    np.testing.assert_allclose(np.asarray(d), ref, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------- NMS
def _nms_ref(boxes, scores, thresh):
    """Sequential greedy NMS (torchvision semantics, strict > suppression)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    iou = _iou_np(boxes, boxes)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > thresh
        suppressed[i] = True
    return sorted(keep)


def test_nms_matches_reference(rng):
    boxes = _rand_boxes(rng, 64)
    scores = rng.uniform(0, 1, 64).astype(np.float32)
    valid = np.ones(64, bool)
    for thresh in (0.3, 0.6, 0.9):
        keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), thresh))
        assert sorted(np.nonzero(keep)[0].tolist()) == _nms_ref(boxes, scores, thresh)


def test_nms_respects_valid_mask(rng):
    boxes = _rand_boxes(rng, 16)
    scores = rng.uniform(0, 1, 16).astype(np.float32)
    valid = rng.uniform(size=16) > 0.5
    keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5))
    assert not np.any(keep & ~valid)
    sub = _nms_ref(boxes[valid], scores[valid], 0.5)
    assert sorted(np.nonzero(keep[valid])[0].tolist()) == sub


def test_batched_nms_classes_dont_interact(rng):
    boxes = np.tile(_rand_boxes(rng, 8), (2, 1))  # identical boxes, 2 classes
    scores = rng.uniform(0, 1, 16).astype(np.float32)
    classes = np.repeat(np.arange(2), 8).astype(np.int32)
    valid = np.ones(16, bool)
    keep = np.asarray(batched_nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                       jnp.asarray(classes), jnp.asarray(valid), 0.5))
    k0 = _nms_ref(boxes[:8], scores[:8], 0.5)
    k1 = _nms_ref(boxes[8:], scores[8:], 0.5)
    assert sorted(np.nonzero(keep[:8])[0].tolist()) == k0
    assert sorted(np.nonzero(keep[8:])[0].tolist()) == k1


def test_keep_top_scores_kthvalue_semantics(rng):
    """fsod_rpn.py:1198-1206: keep scores >= kth largest (ties all kept)."""
    scores = np.asarray([0.9, 0.8, 0.8, 0.7, 0.1], np.float32)
    valid = np.ones(5, bool)
    keep = np.asarray(keep_top_scores(jnp.asarray(scores), jnp.asarray(valid), 3))
    assert keep.tolist() == [True, True, True, False, False]
    keep2 = np.asarray(keep_top_scores(jnp.asarray(scores), jnp.asarray(valid), 2))
    # kth = 0.8 → ties at 0.8 all kept (reference semantics)
    assert keep2.tolist() == [True, True, True, False, False]
    keep_all = np.asarray(keep_top_scores(jnp.asarray(scores), jnp.asarray(valid), 5))
    assert keep_all.all()


# ---------------------------------------------------------------- ROIAlign
def _roi_align_torch(feat_nchw, boxes, scale, out, ratio):
    """Reference ROIAlignV2 math in torch (torchvision roi_align, aligned=True),
    implemented directly from the kernel definition since torchvision is not
    installed. feat [C,H,W]; boxes [R,4]. ratio=0 → adaptive
    ceil(roi_size/out) per axis (the CUDA kernel's sampling_ratio<=0 path)."""
    import math

    c, hh, ww = feat_nchw.shape
    r = boxes.shape[0]
    outp = torch.zeros((r, c, out, out))
    for bi in range(r):
        x1, y1, x2, y2 = [float(v) * scale - 0.5 for v in boxes[bi]]
        rw = max(x2 - x1, 1e-6)
        rh = max(y2 - y1, 1e-6)
        bin_w = rw / out
        bin_h = rh / out
        ratio_h = ratio if ratio > 0 else max(1, math.ceil(rh / out))
        ratio_w = ratio if ratio > 0 else max(1, math.ceil(rw / out))
        for ph in range(out):
            for pw in range(out):
                acc = torch.zeros(c)
                for iy in range(ratio_h):
                    y = y1 + (ph + (iy + 0.5) / ratio_h) * bin_h
                    for ix in range(ratio_w):
                        x = x1 + (pw + (ix + 0.5) / ratio_w) * bin_w
                        if y < -1.0 or y > hh or x < -1.0 or x > ww:
                            continue
                        yc = min(max(y, 0.0), hh - 1)
                        xc = min(max(x, 0.0), ww - 1)
                        y0, x0 = int(yc), int(xc)
                        y1i = min(y0 + 1, hh - 1)
                        x1i = min(x0 + 1, ww - 1)
                        ly, lx = yc - y0, xc - x0
                        acc += (
                            feat_nchw[:, y0, x0] * (1 - ly) * (1 - lx)
                            + feat_nchw[:, y0, x1i] * (1 - ly) * lx
                            + feat_nchw[:, y1i, x0] * ly * (1 - lx)
                            + feat_nchw[:, y1i, x1i] * ly * lx
                        )
                outp[bi, :, ph, pw] = acc / (ratio_h * ratio_w)
    return outp


@pytest.mark.parametrize("out_size,ratio", [(8, 2), (4, 2), (8, 1), (8, 0), (4, 0)])
def test_roi_align_matches_reference(rng, out_size, ratio):
    feat = rng.standard_normal((24, 32, 6), dtype=np.float32)  # HWC
    boxes = np.asarray(
        [[4.0, 4.0, 60.0, 48.0], [0.0, 0.0, 10.0, 10.0], [30.0, 20.0, 100.0, 90.0],
         [-5.0, -5.0, 20.0, 20.0]],  # partially out of bounds
        np.float32,
    )
    ours = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes), 0.25, out_size, ratio))
    ref = _roi_align_torch(torch.from_numpy(feat).permute(2, 0, 1), boxes, 0.25, out_size, ratio)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------- CGM correlation
def test_cgm_correlate_matches_torch_grouped_conv(rng):
    """fsod_cen.py:235-243: depthwise 1x1 twice + 1x3∘3x1 + residual."""
    C = 16
    q = rng.standard_normal((1, 10, 12, C), dtype=np.float32)
    k1 = rng.standard_normal((C,), dtype=np.float32)
    k13 = rng.standard_normal((3, C), dtype=np.float32)
    k31 = rng.standard_normal((3, C), dtype=np.float32)

    ours = np.asarray(cgm_correlate(jnp.asarray(q), jnp.asarray(k1), jnp.asarray(k13), jnp.asarray(k31)))

    qt = torch.from_numpy(q).permute(0, 3, 1, 2)  # NCHW
    w1 = torch.from_numpy(k1).view(C, 1, 1, 1)
    w13 = torch.from_numpy(k13.T.copy()).view(C, 1, 1, 3)
    w31 = torch.from_numpy(k31.T.copy()).view(C, 1, 3, 1)
    c1 = F.relu(F.conv2d(qt, w1, groups=C))
    c2 = F.relu(F.conv2d(c1, w1, groups=C))
    d1 = F.relu(F.conv2d(qt, w13, padding=(0, 1), groups=C))
    d2 = F.relu(F.conv2d(d1, w31, padding=(1, 0), groups=C))
    ref = (c2 + d2 + qt).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------- losses
def test_binary_heatmap_focal_loss_matches_torch(rng):
    """binary_heatmap_focal_loss (heatmap_focal_loss.py:51-87)."""
    m = 64
    logits = rng.standard_normal(m, dtype=np.float32) * 3
    targets = np.clip(rng.uniform(0, 1, m).astype(np.float32), 0, 1)
    pos = np.asarray([3, 10, 50], np.int64)
    targets[pos] = 1.0

    lt = torch.from_numpy(logits.copy())
    pred = torch.clamp(lt.sigmoid(), 1e-4, 1 - 1e-4)
    neg_w = (1 - torch.from_numpy(targets)) ** 4.0
    pos_pred = pred[pos]
    ref_pos = -(torch.log(pos_pred) * (1 - pos_pred) ** 2.0).sum()
    neg_l = torch.log(1 - pred) * pred**2.0 * neg_w
    neg_l = neg_l * (pred < 0.85).float()
    ref_neg = -neg_l.sum()

    pos_pad = np.concatenate([pos, [0, 0]])
    pos_mask = np.asarray([True, True, True, False, False])
    ours_pos, ours_neg = binary_heatmap_focal_loss(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(pos_pad),
        jnp.asarray(pos_mask), jnp.ones(m, bool),
        beta=4.0, gamma=2.0, sigmoid_clamp=1e-4, ignore_high_fp=0.85,
    )
    np.testing.assert_allclose(float(ours_pos), float(ref_pos), rtol=1e-5)
    np.testing.assert_allclose(float(ours_neg), float(ref_neg), rtol=1e-5)


def test_iou_loss_ltrb_matches_torch(rng):
    """IOULoss giou (iou_loss.py:5-63)."""
    n = 32
    pred = rng.uniform(0.1, 10, (n, 4)).astype(np.float32)
    target = rng.uniform(0.1, 10, (n, 4)).astype(np.float32)
    ours = np.asarray(iou_loss_ltrb(jnp.asarray(pred), jnp.asarray(target), loss_type="giou"))

    p, t = torch.from_numpy(pred), torch.from_numpy(target)
    ta = (t[:, 0] + t[:, 2]) * (t[:, 1] + t[:, 3])
    pa = (p[:, 0] + p[:, 2]) * (p[:, 1] + p[:, 3])
    wi = torch.min(p[:, 0], t[:, 0]) + torch.min(p[:, 2], t[:, 2])
    hi = torch.min(p[:, 3], t[:, 3]) + torch.min(p[:, 1], t[:, 1])
    gw = torch.max(p[:, 0], t[:, 0]) + torch.max(p[:, 2], t[:, 2])
    gh = torch.max(p[:, 3], t[:, 3]) + torch.max(p[:, 1], t[:, 1])
    ac = gw * gh
    ai = wi * hi
    au = ta + pa - ai
    ious = (ai + 1) / (au + 1)
    gious = ious - (ac - au) / ac
    np.testing.assert_allclose(ours, (1 - gious).numpy(), rtol=1e-5, atol=1e-6)


def test_smooth_l1_beta0_is_l1(rng):
    a = rng.standard_normal(10).astype(np.float32)
    b = rng.standard_normal(10).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(smooth_l1_loss(jnp.asarray(a), jnp.asarray(b), 0.0)), np.abs(a - b), rtol=1e-6)


def test_softmax_ce_matches_torch(rng):
    logits = rng.standard_normal((12, 2)).astype(np.float32)
    labels = rng.integers(0, 2, 12).astype(np.int32)
    valid = np.ones(12, bool)
    ours = float(softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(valid)))
    ref = float(F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(labels.astype(np.int64))))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
