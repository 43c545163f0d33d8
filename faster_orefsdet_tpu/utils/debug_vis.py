"""Headless debug overlays — the CenterNet debug_train/debug_test/
debug_second_stage equivalents.

Re-architecture of CenterNet2/centernet/modeling/debug.py:73-258 (reused by
fewx/modeling/fsod/debug.py and gated by cfg.DEBUG in fsod_rpn.py /
fsod_roi_heads.py:269-276). The reference pops cv2.imshow windows; on a
headless TPU host these write PNGs to a directory instead. Heatmaps are
rendered per level with a jet colormap, blended over the (denormalized)
input canvas; boxes/markers follow the reference's color code (gt red,
positives blue markers, proposals green, detections red + score text).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _cv2():
    import cv2

    return cv2


def level_shapes(canvas_hw: Tuple[int, int], strides: Sequence[int]):
    return [(canvas_hw[0] // s, canvas_hw[1] // s) for s in strides]


def split_levels(flat: np.ndarray, canvas_hw, strides) -> List[np.ndarray]:
    """Flat per-pixel vector [M, ...] → per-level maps [Hl, Wl, ...]
    (debug.py:33-48 _decompose_level)."""
    shapes = level_shapes(canvas_hw, strides)
    out, off = [], 0
    for h, w in shapes:
        out.append(np.asarray(flat[off:off + h * w]).reshape(h, w, *flat.shape[1:]))
        off += h * w
    return out


def denormalize(image: np.ndarray, pixel_mean, pixel_std) -> np.ndarray:
    """Normalized canvas [H, W, 3] → uint8 BGR (reference images are BGR)."""
    img = np.asarray(image) * np.asarray(pixel_std) + np.asarray(pixel_mean)
    return np.clip(img, 0, 255).astype(np.uint8)


def heatmap_color(hm: np.ndarray) -> np.ndarray:
    """[H, W] in [0,1] → jet color image (debug.py:9-18)."""
    cv2 = _cv2()
    return cv2.applyColorMap((np.clip(hm, 0, 1) * 255).astype(np.uint8),
                             cv2.COLORMAP_JET)


def blend_heatmaps(image: np.ndarray, hms: Sequence[np.ndarray], a=0.7):
    """Blend per-level heatmaps resized onto the image (debug.py:20-31)."""
    cv2 = _cv2()
    out = image.astype(np.float32)
    for hm in hms:
        cm = cv2.resize(heatmap_color(hm), (image.shape[1], image.shape[0]))
        out = out * a + cm.astype(np.float32) * (1 - a)
    return np.clip(out, 0, 255).astype(np.uint8)


def _draw_boxes(img, boxes, color, thickness=2, scores=None):
    cv2 = _cv2()
    for i, b in enumerate(np.asarray(boxes).reshape(-1, 4)):
        x0, y0, x1, y1 = [int(round(float(v))) for v in b]
        cv2.rectangle(img, (x0, y0), (x1, y1), color, thickness, cv2.LINE_AA)
        if scores is not None:
            cv2.putText(img, f"{float(scores[i]):.2f}", (x0, max(y0 - 3, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.4, color, 1, cv2.LINE_AA)
    return img


def debug_train(
    image: np.ndarray,
    targets,
    gt_boxes: np.ndarray,
    gt_valid: np.ndarray,
    canvas_hw: Tuple[int, int],
    strides: Sequence[int],
    out_dir: str,
    prefix: str = "train",
    pixel_mean=(0, 0, 0),
    pixel_std=(1, 1, 1),
) -> List[str]:
    """GT heatmap per level + gt-box/positive-marker blend (debug.py:73-138).

    targets: ops.heatmap.CenterNetTargets for ONE image."""
    cv2 = _cv2()
    os.makedirs(out_dir, exist_ok=True)
    img = denormalize(image, pixel_mean, pixel_std)
    hms = [h[..., 0] if h.ndim == 3 else h
           for h in split_levels(np.asarray(targets.heatmap), canvas_hw, strides)]
    paths = []
    for l, hm in enumerate(hms):
        p = os.path.join(out_dir, f"{prefix}_gthm_{l}.png")
        cv2.imwrite(p, heatmap_color(hm))
        paths.append(p)
    blend = blend_heatmaps(img, hms)
    _draw_boxes(blend, np.asarray(gt_boxes)[np.asarray(gt_valid)], (0, 0, 255), 3)
    # positive locations (blue markers, debug.py:117-121)
    shapes = level_shapes(canvas_hw, strides)
    sizes = np.asarray([h * w for h, w in shapes])
    offs = np.concatenate([[0], np.cumsum(sizes)])
    pos = np.asarray(targets.pos_inds)[np.asarray(targets.pos_mask)]
    for ind in pos:
        l = int(np.searchsorted(offs, ind, side="right") - 1)
        rel = int(ind - offs[l])
        hl, wl = shapes[l]
        y, x = divmod(rel, wl)
        cx = int((x + 0.5) * strides[l])
        cy = int((y + 0.5) * strides[l])
        cv2.drawMarker(blend, (cx, cy), (255, 0, 0), cv2.MARKER_CROSS, 8, 2)
    p = os.path.join(out_dir, f"{prefix}_blend.png")
    cv2.imwrite(p, blend)
    paths.append(p)
    return paths


def debug_test(
    image: np.ndarray,
    agn_hms: Sequence[np.ndarray],
    proposals,
    out_dir: str,
    prefix: str = "test",
    vis_thresh: float = 0.3,
    pixel_mean=(0, 0, 0),
    pixel_std=(1, 1, 1),
) -> List[str]:
    """Predicted heatmap per level + proposal overlay (debug.py:141-215).

    agn_hms: per-level [Hl, Wl, 1] sigmoided maps; proposals: Proposals."""
    cv2 = _cv2()
    os.makedirs(out_dir, exist_ok=True)
    img = denormalize(image, pixel_mean, pixel_std)
    hms = [np.asarray(h)[..., 0] for h in agn_hms]
    paths = []
    for l, hm in enumerate(hms):
        p = os.path.join(out_dir, f"{prefix}_predhm_{l}.png")
        cv2.imwrite(p, heatmap_color(hm))
        paths.append(p)
    blend = blend_heatmaps(img, hms)
    keep = np.asarray(proposals.valid) & (np.asarray(proposals.scores) > vis_thresh)
    _draw_boxes(blend, np.asarray(proposals.boxes)[keep], (0, 255, 0), 2,
                scores=np.asarray(proposals.scores)[keep])
    p = os.path.join(out_dir, f"{prefix}_proposals.png")
    cv2.imwrite(p, blend)
    paths.append(p)
    return paths


def debug_second_stage(
    image: np.ndarray,
    detections,
    out_dir: str,
    prefix: str = "stage2",
    vis_thresh: float = 0.3,
    pixel_mean=(0, 0, 0),
    pixel_std=(1, 1, 1),
) -> str:
    """Final detections overlay (debug.py:218-258)."""
    cv2 = _cv2()
    os.makedirs(out_dir, exist_ok=True)
    img = denormalize(image, pixel_mean, pixel_std).copy()
    keep = np.asarray(detections.valid) & (
        np.asarray(detections.scores) > vis_thresh
    )
    _draw_boxes(img, np.asarray(detections.boxes)[keep], (0, 0, 255), 2,
                scores=np.asarray(detections.scores)[keep])
    p = os.path.join(out_dir, f"{prefix}_detections.png")
    cv2.imwrite(p, img)
    return p
