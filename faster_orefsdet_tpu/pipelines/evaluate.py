"""End-to-end evaluation: support cache → per-image inference → COCO AP.

The reference protocol (SURVEY.md §3.2): `--eval-only` builds the support
cache from the K-shot support set (first invocation) then runs batch-1
inference over the val split and reports the COCO AP table plus pure-compute
latency (log :806-845). This module reproduces that flow in one invocation
and also reports the timing telemetry the log records.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import Config
from ..data.coco import ImageRecord, SupportEntry
from ..data.loader import eval_canvas, eval_loader
from ..evaluation import COCOEvaluator
from ..models.detector import CenterNet2Detector
from ..pipelines.inference import build_inference_fn
from ..pipelines.preprocess import normalize, pad_to_canvas
from .support_cache import SupportCache, build_support_cache


def encode_support_set(
    model: CenterNet2Detector,
    params,
    entries: Sequence[SupportEntry],
    cfg: Config,
    shot: Optional[int] = None,
    batch_stats=None,
) -> SupportCache:
    """Build the cache from the first `shot` entries of the (single) class —
    init_model caps rows at SUPPORT_SHOT (fsod_cen.py:336-345)."""
    import cv2

    shot = shot or cfg.fs.support_shot
    cs = cfg.fs.support_crop_size
    canvas = (-(-cs // 32) * 32, -(-cs // 32) * 32)
    imgs, boxes = [], []
    for e in entries[:shot]:
        crop = cv2.imread(e.file_path)
        assert crop is not None, e.file_path
        if crop.shape[:2] != (cs, cs):
            crop = cv2.resize(crop, (cs, cs))
        imgs.append(
            pad_to_canvas(normalize(crop, cfg.input.pixel_mean, cfg.input.pixel_std), canvas)
        )
        boxes.append(e.support_box)
    return build_support_cache(
        model,
        params,
        jnp.asarray(np.stack(imgs)),
        jnp.asarray(np.asarray(boxes, np.float32)),
        cfg,
        batch_stats=batch_stats,
    )


def evaluate(
    model: CenterNet2Detector,
    params,
    cache: SupportCache,
    records: Sequence[ImageRecord],
    cfg: Config,
    canvas_hw: Optional[Tuple[int, int]] = None,
    batch_stats=None,
    batch_size: int = 1,
    act_scales=None,
) -> Dict[str, float]:
    """Run the eval loop; returns the AP table + timing stats.

    batch_size > 1 groups images on the shared eval canvas and runs the
    vmapped batched query path — each device dispatch covers B images, so
    the per-dispatch relay RTT (~30-40 ms on this setup) amortizes B-fold.
    Identical detections to batch-1 (the query path is per-image pure).

    act_scales: calibrated static int8 activation scales
    (pipelines.quant_calib). If omitted under a static-quantized config
    (int8_static / int8_resident), scales are auto-calibrated from the
    first <=8 eval canvases — so `cli.train --eval-only` works on the
    quantized presets out of the box."""
    canvas_hw = canvas_hw or eval_canvas(records, cfg)
    if act_scales is None and getattr(cfg, "quantize", "none") in (
        "int8_static",
        "int8_resident",
    ):
        from ..pipelines.quant_calib import calibrate_act_scales

        calib = [
            np.asarray(canvas)
            for _rec, canvas, _hw, _scale in eval_loader(
                records[: min(8, len(records))], cfg, canvas_hw
            )
        ]
        t0 = time.perf_counter()
        act_scales = calibrate_act_scales(
            cfg, params, jnp.asarray(np.stack(calib)), batch_stats, model=model
        )
        print(
            f"auto-calibrated {len(act_scales)} activation scales "
            f"({len(calib)} eval images) in {time.perf_counter() - t0:.2f}s"
        )
    evaluator = COCOEvaluator()
    compute_times: List[float] = []

    def process(rec, det_boxes, det_scores, det_valid, scale):
        sy, sx = scale
        boxes = det_boxes[det_valid] * np.asarray([sx, sy, sx, sy])
        evaluator.process(rec.image_id, boxes, det_scores[det_valid])
        gt_boxes = np.asarray([a.bbox for a in rec.annotations], float).reshape(-1, 4)
        iscrowd = np.asarray([a.iscrowd for a in rec.annotations], bool)
        evaluator.add_ground_truth(rec.image_id, gt_boxes, iscrowd)

    if batch_size > 1:
        from ..pipelines.inference import build_batched_inference_fn

        binfer = build_batched_inference_fn(cfg, model, act_scales=act_scales)
        buf: List = []
        nb = 0

        def flush():
            nonlocal nb
            count = len(buf)
            canvases = [b[1] for b in buf]
            hws = [[float(b[2][0]), float(b[2][1])] for b in buf]
            while len(canvases) < batch_size:  # pad the tail batch
                canvases.append(canvases[0])
                hws.append(hws[0])
            t0 = time.perf_counter()
            det = binfer(
                params, cache, jnp.asarray(np.stack(canvases)), jnp.asarray(hws),
                batch_stats,
            )
            boxes = np.asarray(det.boxes)
            scores = np.asarray(det.scores)
            valid = np.asarray(det.valid)
            dt = time.perf_counter() - t0
            if nb > 0:  # skip compile
                # the device always computes the FULL (padded) batch, so
                # per-image latency divides by batch_size, not the unpadded
                # count — else the tail batch inflates p50/p90
                compute_times.append(dt / batch_size)
            nb += 1
            for i, (rec, _, _, scale) in enumerate(buf):
                process(rec, boxes[i], scores[i], valid[i], scale)
            buf.clear()

        # uint8 canvases: 4x less host->device traffic; the batched fn
        # normalizes on device (the relay link, not compute, bounds eval)
        for item in eval_loader(records, cfg, canvas_hw, raw_uint8=True):
            buf.append(item)
            if len(buf) == batch_size:
                flush()
        if buf:
            flush()
    else:
        infer = build_inference_fn(cfg, model, act_scales=act_scales)
        n = 0
        for rec, canvas, (newh, neww), scale in eval_loader(records, cfg, canvas_hw):
            t0 = time.perf_counter()
            det = infer(
                params, cache, canvas, jnp.asarray([float(newh), float(neww)]),
                batch_stats,
            )
            boxes = np.asarray(det.boxes)
            scores = np.asarray(det.scores)
            valid = np.asarray(det.valid)
            dt = time.perf_counter() - t0
            if n > 0:  # skip compile
                compute_times.append(dt)
            n += 1
            process(rec, boxes, scores, valid, scale)

    results = evaluator.evaluate()
    if compute_times:
        results["latency_p50_s"] = float(np.percentile(compute_times, 50))
        results["latency_mean_s"] = float(np.mean(compute_times))
        results["fps"] = 1.0 / results["latency_mean_s"]
    return results
