"""Single-image / glob demo with box visualization — the demo.py equivalent.

Usage:
  python -m faster_orefsdet_tpu.cli.demo \
      --input 'directory/*.png' --output results/ \
      --params model_final.npz --support-index support_index.json \
      [--confidence 0.3]

Mirrors demo.py:93-193 + predictor.py (VisualizationDemo): preprocess at
MIN_SIZE_TEST, run the jitted query path against the support cache, draw
scored boxes, and print per-stage timings."""

from __future__ import annotations

import argparse
import glob
import os
import time


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="finetune_vovnet")
    p.add_argument("--input", required=True, help="image path or glob")
    p.add_argument("--output", default="results")
    p.add_argument("--params", help=".npz params (random init if omitted)")
    p.add_argument("--support-index", required=True)
    p.add_argument("--confidence", type=float, default=0.3)
    p.add_argument(
        "--debug", action="store_true",
        help="also dump per-level predicted-heatmap overlays (the cfg.DEBUG "
             "debug_test path, CenterNet2 debug.py:141-215) into --output",
    )
    p.add_argument("opts", nargs="*")
    return p.parse_args()


def draw_detections(img, boxes, scores, thresh):
    import cv2

    out = img.copy()
    for box, score in zip(boxes, scores):
        if score < thresh:
            continue
        x1, y1, x2, y2 = [int(v) for v in box]
        cv2.rectangle(out, (x1, y1), (x2, y2), (0, 220, 0), 2)
        cv2.putText(
            out, f"ore {score:.2f}", (x1, max(12, y1 - 4)),
            cv2.FONT_HERSHEY_SIMPLEX, 0.45, (0, 220, 0), 1,
        )
    return out


def main():
    args = parse_args()

    import cv2
    import numpy as np

    import jax
    import jax.numpy as jnp

    from ..config import apply_overrides, get_config
    from ..data.coco import load_support_index
    from ..pipelines.evaluate import encode_support_set
    from ..pipelines.inference import build_inference_fn, make_detector
    from ..pipelines.preprocess import preprocess_host
    from ..utils.checkpoint import load_params_npz
    from ..utils.params import init_params

    cfg = apply_overrides(get_config(args.config), args.opts)
    model = make_detector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    if args.params:
        params = load_params_npz(args.params, params)

    entries = load_support_index(args.support_index)
    t0 = time.perf_counter()
    cache = encode_support_set(model, params, entries, cfg)
    print(f"support cache built in {time.perf_counter() - t0:.2f}s")

    infer = build_inference_fn(cfg, model)
    os.makedirs(args.output, exist_ok=True)
    paths = sorted(glob.glob(args.input)) or [args.input]
    for path in paths:
        img = cv2.imread(path)
        if img is None:
            print(f"skip unreadable {path}")
            continue
        nh, nw = img.shape[:2]
        canvas_hw = None
        from ..pipelines.preprocess import resize_shortest_edge_size

        rh, rw = resize_shortest_edge_size(
            nh, nw, cfg.input.min_size_test, cfg.input.max_size_test
        )
        canvas_hw = (-(-rh // 32) * 32, -(-rw // 32) * 32)
        canvas, (newh, neww), (sy, sx) = preprocess_host(
            img, cfg.input.min_size_test, cfg.input.max_size_test, canvas_hw,
            cfg.input.pixel_mean, cfg.input.pixel_std,
        )
        t0 = time.perf_counter()
        det = infer(params, cache, jnp.asarray(canvas), jnp.asarray([float(newh), float(neww)]))
        det.boxes.block_until_ready()
        dt = time.perf_counter() - t0
        boxes = np.asarray(det.boxes)[np.asarray(det.valid)]
        scores = np.asarray(det.scores)[np.asarray(det.valid)]
        boxes = boxes * np.asarray([sx, sy, sx, sy])
        n_vis = int((scores >= args.confidence).sum())
        print(f"{path}: {len(scores)} detections ({n_vis} ≥ {args.confidence}) in {dt:.3f}s")
        out = draw_detections(img, boxes, scores, args.confidence)
        cv2.imwrite(os.path.join(args.output, os.path.basename(path)), out)

        if args.debug:
            # debug_test overlays: re-run the proposal stages unjitted to
            # expose the per-level heatmaps (debug.py:141-215 equivalent)
            from ..models.centernet import decode_proposals
            from ..models.detector import support_kernels
            from ..utils.debug_vis import debug_test

            variables = {"params": params}
            feats = model.apply(variables, jnp.asarray(canvas)[None],
                                method=model.features)
            kernels = {k: support_kernels(getattr(cache, k))
                       for k in ("p3", "p4", "p5")}
            pos = model.apply(variables, feats, kernels, method=model.correlate)
            hms, regs = model.apply(variables, pos, method=model.proposal_head)
            props = decode_proposals(
                [h[0] for h in hms], [r[0] for r in regs], cfg.centernet,
                (canvas.shape[0], canvas.shape[1]),
                jnp.asarray([float(newh), float(neww)]), training=False,
            )
            stem = os.path.splitext(os.path.basename(path))[0]
            debug_test(
                canvas, [jax.nn.sigmoid(h[0]) for h in hms], props,
                args.output, prefix=f"{stem}_debug",
                vis_thresh=args.confidence,
                pixel_mean=cfg.input.pixel_mean, pixel_std=cfg.input.pixel_std,
            )
            print(f"  debug overlays -> {args.output}/{stem}_debug_*.png")


if __name__ == "__main__":
    main()
