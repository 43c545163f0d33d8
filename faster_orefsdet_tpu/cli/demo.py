"""Single-image / glob / video / webcam demo with box visualization — the
demo.py equivalent.

Usage:
  python -m faster_orefsdet_tpu.cli.demo \
      --input 'directory/*.png' --output results/ \
      --params model_final.npz --support-index support_index.json \
      [--confidence 0.3]
  python -m faster_orefsdet_tpu.cli.demo --video-input clip.mp4 \
      --output results/clip_out.mp4 --support-index support_index.json
  python -m faster_orefsdet_tpu.cli.demo --webcam \
      --output results/webcam.mp4 --max-frames 100 --support-index ...

Mirrors demo.py:93-193 + predictor.py (VisualizationDemo/VideoVisualizer):
preprocess at MIN_SIZE_TEST, run the jitted query path against the support
cache, draw scored boxes, and print per-stage timings. Video frames share one
canvas size so the query path compiles exactly once per stream."""

from __future__ import annotations

import argparse
import glob
import os
import time


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="finetune_vovnet")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="image path or glob")
    src.add_argument("--video-input", help="video file (reference demo.py:116-162)")
    p.add_argument(
        "--frame-batch", type=int, default=8,
        help="video/webcam frames per device dispatch via the fused raw-"
        "uint8 serving program (resize+normalize on device); 1 = per-frame",
    )
    src.add_argument(
        "--webcam", action="store_true",
        help="read camera 0 (reference demo.py:104-115); frames are written "
        "to --output (headless-safe, no imshow window)",
    )
    p.add_argument(
        "--max-frames", type=int, default=0,
        help="stop video/webcam after N frames (0 = whole stream)",
    )
    p.add_argument(
        "--num-devices", type=int, default=1,
        help=">1 shards --frame-batch over a device mesh "
        "(parallel.serve_dp data-parallel serving; frame-batch must be "
        "divisible by it)",
    )
    p.add_argument(
        "--parallel", action="store_true",
        help="AsyncPredictor pipelined inference for globs and per-frame "
        "video (--frame-batch 1): bounded in-flight dispatches on a pinned-"
        "weights program + overlapped result readbacks (the reference "
        "demo's parallel=True AsyncPredictor, predictor.py:150-238)",
    )
    p.add_argument(
        "--calib-glob",
        help="calibration images for the int8_static/int8_resident presets "
        "(<=8 used; defaults to the first --input glob images; REQUIRED for "
        "quantized video/webcam runs — streams cannot self-calibrate)",
    )
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
    # unsupported flag combinations fail loudly (like the --debug guard
    # below) instead of silently ignoring a flag
    if args.parallel and args.num_devices > 1:
        raise SystemExit(
            "--parallel (AsyncPredictor, single-device pinned program) and "
            "--num-devices > 1 (DP serving) are mutually exclusive"
        )
    if args.num_devices > 1 and not (
        (args.video_input or args.webcam) and args.frame_batch > 1
    ):
        raise SystemExit(
            "--num-devices > 1 is DP video serving and requires "
            "--video-input/--webcam with --frame-batch > 1 (the image-glob "
            "and per-frame paths are single-device)"
        )
    if args.parallel and (args.video_input or args.webcam) and args.frame_batch > 1:
        raise SystemExit(
            "--parallel drives per-frame video only: pass --frame-batch 1 "
            "(or drop --parallel to use the fused batched serving program)"
        )

    import cv2
    import numpy as np

    import jax
    import jax.numpy as jnp

    from ..config import apply_overrides, get_config
    from ..data.coco import load_support_index
    from ..pipelines.evaluate import encode_support_set
    from ..pipelines.inference import build_inference_fn, make_detector
    from ..pipelines.preprocess import preprocess_host, resize_shortest_edge_size
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

    act_scales = None
    if getattr(cfg, "quantize", "none") in ("int8_static", "int8_resident"):
        # static-calibrated presets: measure activation scales once on a
        # handful of in-domain images (pipelines.quant_calib), then every
        # builder below bakes them into its program
        src = sorted(glob.glob(args.calib_glob)) if args.calib_glob else (
            sorted(glob.glob(args.input)) if args.input else []
        )
        if not src:
            raise SystemExit(
                f"--config {args.config} (quantize={cfg.quantize}) needs "
                "calibration images: pass --calib-glob 'imgs/*.png' "
                "(video/webcam streams cannot self-calibrate)"
            )
        sized = []
        for pth in src[:8]:
            img = cv2.imread(pth)
            if img is None:
                continue
            rh, rw = resize_shortest_edge_size(
                img.shape[0], img.shape[1],
                cfg.input.min_size_test, cfg.input.max_size_test,
            )
            sized.append((img, rh, rw))
        if not sized:
            raise SystemExit("no readable calibration images")
        dvs = cfg.input.size_divisibility
        chw = (
            max(-(-rh // dvs) * dvs for _, rh, _ in sized),
            max(-(-rw // dvs) * dvs for _, _, rw in sized),
        )
        canvases = [
            preprocess_host(
                img, cfg.input.min_size_test, cfg.input.max_size_test, chw,
                cfg.input.pixel_mean, cfg.input.pixel_std,
            )[0]
            for img, _, _ in sized
        ]
        from ..pipelines.quant_calib import calibrate_act_scales

        t0 = time.perf_counter()
        act_scales = calibrate_act_scales(
            cfg, params, jnp.asarray(np.stack(canvases)), model=model
        )
        print(f"calibrated {len(act_scales)} activation scales "
              f"({len(sized)} images) in {time.perf_counter() - t0:.2f}s")

    infer = build_inference_fn(cfg, model, act_scales=act_scales)

    def detect_frame(img):
        """BGR frame → (boxes, scores, preprocessed canvas, resized hw)."""
        nh, nw = img.shape[:2]
        rh, rw = resize_shortest_edge_size(
            nh, nw, cfg.input.min_size_test, cfg.input.max_size_test
        )
        d = cfg.input.size_divisibility
        canvas_hw = (-(-rh // d) * d, -(-rw // d) * d)
        canvas, (newh, neww), (sy, sx) = preprocess_host(
            img, cfg.input.min_size_test, cfg.input.max_size_test, canvas_hw,
            cfg.input.pixel_mean, cfg.input.pixel_std,
        )
        det = infer(
            params, cache, jnp.asarray(canvas), jnp.asarray([float(newh), float(neww)])
        )
        det.boxes.block_until_ready()
        boxes = np.asarray(det.boxes)[np.asarray(det.valid)]
        scores = np.asarray(det.scores)[np.asarray(det.valid)]
        boxes = boxes * np.asarray([sx, sy, sx, sy])
        return boxes, scores, canvas, (newh, neww)

    if args.video_input or args.webcam:
        # frame-loop inference + rendered output video (demo.py:104-162,
        # predictor.py VideoVisualizer :84-148); frames are constant-size so
        # the jitted query path compiles once on the first frame
        source = 0 if args.webcam else args.video_input
        cap = cv2.VideoCapture(source)
        if not cap.isOpened():
            raise SystemExit(f"cannot open video source {source!r}")
        fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
        w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        if args.output.lower().endswith((".mp4", ".avi", ".mkv")):
            out_path = args.output
            os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        else:
            os.makedirs(args.output, exist_ok=True)
            stem = "webcam" if args.webcam else os.path.splitext(
                os.path.basename(args.video_input))[0]
            out_path = os.path.join(args.output, f"{stem}_out.mp4")
        fourcc = cv2.VideoWriter_fourcc(*("mp4v" if out_path.endswith(".mp4") else "MJPG"))
        writer = cv2.VideoWriter(out_path, fourcc, fps, (w, h))
        n, t_total = 0, 0.0
        fb = max(1, args.frame_batch)
        if fb > 1:
            # fused serving program at the fixed camera resolution: RAW
            # uint8 frames in, boxes in frame coords out — resize, normalize
            # and the whole query path in ONE dispatch per fb frames
            if args.num_devices > 1:
                # data-parallel serving: frames sharded over the mesh,
                # params/cache replicated (parallel/serve_dp.py)
                if fb % args.num_devices:
                    raise SystemExit(
                        f"--frame-batch {fb} not divisible by "
                        f"--num-devices {args.num_devices}"
                    )
                from ..parallel import make_mesh, make_sharded_serving

                mesh = make_mesh(args.num_devices)
                serve, _ = make_sharded_serving(
                    cfg, (h, w), mesh, params, cache, model=model,
                    act_scales=act_scales,
                )

                def sfn_call(frames):
                    return serve(jnp.asarray(np.stack(frames)))
            else:
                from ..pipelines.inference import build_serving_fn

                sfn, _ = build_serving_fn(cfg, (h, w), model,
                                          act_scales=act_scales)

                def sfn_call(frames):
                    return sfn(params, cache, jnp.asarray(np.stack(frames)))
            fbuf = []

            def flush_frames():
                nonlocal n, t_total
                if not fbuf:
                    return
                count = len(fbuf)
                frames = list(fbuf)
                while len(frames) < fb:
                    frames.append(frames[0])
                t0 = time.perf_counter()
                det = sfn_call(frames)
                boxes = np.asarray(det.boxes)
                scores = np.asarray(det.scores)
                valid = np.asarray(det.valid)
                t_total += time.perf_counter() - t0
                for i in range(count):
                    writer.write(draw_detections(
                        fbuf[i], boxes[i][valid[i]], scores[i][valid[i]],
                        args.confidence,
                    ))
                    n += 1
                fbuf.clear()
                if n % 24 < fb:
                    print(f"frame {n}: {n / max(t_total, 1e-9):.1f} fps "
                          "(incl. first compile)")

            while True:
                ok, frame = cap.read()
                if not ok or (args.max_frames and n + len(fbuf) >= args.max_frames):
                    break
                fbuf.append(frame)
                if len(fbuf) == fb:
                    flush_frames()
            flush_frames()
            cap.release()
            writer.release()
            print(f"{n} frames -> {out_path} ({n / max(t_total, 1e-9):.1f} fps)")
            return
        if args.parallel:
            # per-frame AsyncPredictor pipeline: preprocessing thread +
            # in-flight dispatches + overlapped readbacks; frames yield in
            # order so the writer stays sequential
            from ..pipelines.async_predictor import AsyncPredictor

            def frames_iter():
                k = 0
                while True:
                    ok, frame = cap.read()
                    if not ok or (args.max_frames and k >= args.max_frames):
                        break
                    pending.append(frame)
                    k += 1
                    yield frame

            pending = []
            pred = AsyncPredictor(cfg, params, cache, model, depth=8,
                                  readback_workers=8, act_scales=act_scales)
            t0 = time.perf_counter()
            for out in pred.run(frames_iter()):
                frame = pending.pop(0)
                writer.write(draw_detections(
                    frame, out["boxes"], out["scores"], args.confidence))
                n += 1
                if n % 25 == 0:
                    print(f"frame {n}: {len(out['scores'])} dets, "
                          f"{n / max(time.perf_counter() - t0, 1e-9):.1f} fps "
                          "(incl. first compile)")
            t_total = time.perf_counter() - t0
            cap.release()
            writer.release()
            print(f"{n} frames -> {out_path} ({n / max(t_total, 1e-9):.1f} fps, "
                  "AsyncPredictor)")
            return
        while True:
            ok, frame = cap.read()
            if not ok or (args.max_frames and n >= args.max_frames):
                break
            t0 = time.perf_counter()
            boxes, scores, _, _ = detect_frame(frame)
            t_total += time.perf_counter() - t0
            writer.write(draw_detections(frame, boxes, scores, args.confidence))
            n += 1
            if n % 25 == 0:
                print(f"frame {n}: {len(scores)} dets, "
                      f"{n / max(t_total, 1e-9):.1f} fps (incl. first compile)")
        cap.release()
        writer.release()
        print(f"{n} frames -> {out_path} ({n / max(t_total, 1e-9):.1f} fps)")
        return

    os.makedirs(args.output, exist_ok=True)
    paths = sorted(glob.glob(args.input)) or [args.input]
    if args.parallel:
        from ..pipelines.async_predictor import AsyncPredictor

        if args.debug:
            raise SystemExit("--debug needs the sequential path; drop --parallel")
        # stream decodes: pending holds at most ~depth decoded frames (same
        # bounded shape as the video path) — a 20k-image glob must not hold
        # every decoded frame in RAM at once
        pending = []

        def images_iter():
            for path in paths:
                img = cv2.imread(path)
                if img is None:
                    print(f"skip unreadable {path}")
                    continue
                pending.append((path, img))
                yield img

        pred = AsyncPredictor(cfg, params, cache, model, depth=8,
                              readback_workers=8, act_scales=act_scales)
        t0 = time.perf_counter()
        n_done = 0
        for out in pred.run(images_iter()):
            path, img = pending.pop(0)
            n_done += 1
            n_vis = int((out["scores"] >= args.confidence).sum())
            print(f"{path}: {len(out['scores'])} detections "
                  f"({n_vis} ≥ {args.confidence})")
            cv2.imwrite(
                os.path.join(args.output, os.path.basename(path)),
                draw_detections(img, out["boxes"], out["scores"], args.confidence),
            )
        wall = time.perf_counter() - t0
        print(f"{n_done} images in {wall:.2f}s "
              f"({n_done / max(wall, 1e-9):.1f} img/s, AsyncPredictor "
              "incl. first compile)")
        return
    for path in paths:
        img = cv2.imread(path)
        if img is None:
            print(f"skip unreadable {path}")
            continue
        t0 = time.perf_counter()
        boxes, scores, canvas, (newh, neww) = detect_frame(img)
        dt = time.perf_counter() - t0
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
                nms_budget=cfg.static.nms_budget_test,
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
