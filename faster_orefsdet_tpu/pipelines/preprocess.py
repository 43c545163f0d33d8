"""Image preprocessing: resize-shortest-edge, normalize, pad-to-canvas.

Replaces detectron2's dataloader-side ResizeShortestEdge + ImageList
(detectron2.7z!data/transforms/, structures/image_list.py; test aug wiring
engine/defaults.py:293-295). Two implementations:

  - host path (numpy/cv2): bit-parity-oriented preprocessing for eval/demo;
  - device path (jax.image): resize on-TPU for the batched serving pipeline
    (BASELINE.json north star names a jax.image preprocessing stage).

The reference normalizes FIRST and pads with zeros AFTER (fsod_cen.py:544-546)
— padding pixels therefore hold 0, not -mean/std; we reproduce that.
Static-shape rule: every image lands on a fixed canvas (H_c, W_c) that is a
multiple of 32, with the true resized size carried alongside.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

import jax.numpy as jnp


def resize_shortest_edge_size(
    h: int, w: int, short: int, max_size: int
) -> Tuple[int, int]:
    """d2 ResizeShortestEdge.get_output_shape: scale shorter side to `short`,
    cap the longer side at `max_size`; round with +0.5."""
    scale = short * 1.0 / min(h, w)
    if h < w:
        newh, neww = short, scale * w
    else:
        newh, neww = scale * h, short
    if max(newh, neww) > max_size:
        scale2 = max_size * 1.0 / max(newh, neww)
        newh, neww = newh * scale2, neww * scale2
    return int(newh + 0.5), int(neww + 0.5)


def resize_image_host(img: np.ndarray, newh: int, neww: int) -> np.ndarray:
    """Bilinear resize on host (cv2 INTER_LINEAR ≈ PIL BILINEAR used by d2)."""
    import cv2

    return cv2.resize(img, (neww, newh), interpolation=cv2.INTER_LINEAR)


def normalize(img: np.ndarray, pixel_mean, pixel_std) -> np.ndarray:
    """(x - mean) / std per channel; img HWC float32 in the configured
    channel order (BGR for the reference weights)."""
    mean = np.asarray(pixel_mean, np.float32)
    std = np.asarray(pixel_std, np.float32)
    return (img.astype(np.float32) - mean) / std


def pad_to_canvas(img: np.ndarray, canvas_hw: Tuple[int, int]) -> np.ndarray:
    """Zero-pad bottom/right to the canvas (ImageList.from_tensors semantics).
    Dtype-preserving: f32 on the normalized eval path, uint8 on the raw
    train path (normalization happens on device there)."""
    h, w = img.shape[:2]
    ch, cw = canvas_hw
    assert h <= ch and w <= cw, (img.shape, canvas_hw)
    out = np.zeros((ch, cw, img.shape[2]), img.dtype)
    out[:h, :w] = img
    return out


def preprocess_host(
    img: np.ndarray,
    short: int,
    max_size: int,
    canvas_hw: Tuple[int, int],
    pixel_mean,
    pixel_std,
):
    """Full host preprocessing for one HWC uint8/float image.

    Returns (canvas_image [Hc,Wc,3] f32, (resized_h, resized_w), scale)."""
    h, w = img.shape[:2]
    newh, neww = resize_shortest_edge_size(h, w, short, max_size)
    resized = resize_image_host(img, newh, neww)
    canvas = pad_to_canvas(normalize(resized, pixel_mean, pixel_std), canvas_hw)
    return canvas, (newh, neww), (h / newh, w / neww)


def ceil_to(x: int, d: int = 32) -> int:
    """Round up to the canvas divisibility (cfg.input.size_divisibility;
    32 = the FPN stride contract and the d2 default)."""
    return -(-x // d) * d


def canvas_for(newh: int, neww: int, buckets: Sequence[Tuple[int, int]] | None = None,
               divisibility: int = 32):
    """Pick the smallest bucket fitting (newh, neww); fall back to ceil-div."""
    if buckets:
        for bh, bw in buckets:
            if newh <= bh and neww <= bw:
                return (bh, bw)
    return (ceil_to(newh, divisibility), ceil_to(neww, divisibility))


# ------------------------------------------------------------- device path

def preprocess_device(
    img: jnp.ndarray,
    out_hw,
    canvas_hw: Tuple[int, int],
    pixel_mean,
    pixel_std,
) -> jnp.ndarray:
    """On-device resize+normalize+pad for the serving path.

    img: [H, W, 3] float/uint8 (static input shape); out_hw: static
    (resized_h, resized_w). jax.image bilinear matches cv2 INTER_LINEAR
    (half-pixel centers)."""
    import jax

    x = jax.image.resize(
        img.astype(jnp.float32), (*out_hw, img.shape[-1]), method="linear"
    )
    x = (x - jnp.asarray(pixel_mean)) / jnp.asarray(pixel_std)
    ch, cw = canvas_hw
    return jnp.pad(x, ((0, ch - out_hw[0]), (0, cw - out_hw[1]), (0, 0)))
