"""Demo CLI end-to-end on synthetic data, including the --debug overlay path
(demo.py:93-193 + cfg.DEBUG debug_test equivalents)."""

import dataclasses
import glob
import os
import sys

import pytest


def test_demo_cli_with_debug(tmp_path, monkeypatch):
    from faster_orefsdet_tpu.data.coco import save_support_index
    from faster_orefsdet_tpu.data.synthetic import make_synthetic_setup

    records, entries = make_synthetic_setup(str(tmp_path / "data"), num_images=3,
                                            seed=0, crop_size=96)
    idx = str(tmp_path / "support_index.json")
    save_support_index(idx, entries)
    out = str(tmp_path / "out")

    argv = [
        "demo",
        "--input", records[0].file_name,
        "--output", out,
        "--support-index", idx,
        "--confidence", "0.0",
        "--debug",
        "--config", "finetune_vovnet",
        # tiny static shapes so the CPU compile stays fast
        "centernet.pre_nms_topk_test=64", "centernet.post_nms_topk_test=16",
        "roi.detections_per_image=8",
        "input.min_size_test=96", "input.max_size_test=160",
        "fs.support_shot=2", "fs.support_crop_size=96",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    from faster_orefsdet_tpu.cli.demo import main

    main()
    rendered = os.path.join(out, os.path.basename(records[0].file_name))
    assert os.path.exists(rendered)
    dbg = glob.glob(os.path.join(out, "*_debug_*.png"))
    # 3 per-level heatmaps + 1 proposal blend
    assert len(dbg) == 4, dbg


def test_demo_cli_video_input(tmp_path, monkeypatch):
    """--video-input frame-loop parity (reference demo.py:116-162): synthetic
    10-frame clip in → rendered 10-frame clip out."""
    import cv2
    import numpy as np

    from faster_orefsdet_tpu.data.coco import save_support_index
    from faster_orefsdet_tpu.data.synthetic import make_synthetic_setup

    records, entries = make_synthetic_setup(str(tmp_path / "data"), num_images=3,
                                            seed=0, crop_size=96)
    idx = str(tmp_path / "support_index.json")
    save_support_index(idx, entries)

    clip = str(tmp_path / "clip.avi")
    writer = cv2.VideoWriter(clip, cv2.VideoWriter_fourcc(*"MJPG"), 10.0, (128, 96))
    base = cv2.imread(records[0].file_name)
    base = cv2.resize(base, (128, 96))
    for i in range(10):
        writer.write(np.roll(base, i * 3, axis=1))
    writer.release()

    out_vid = str(tmp_path / "out" / "clip_out.mp4")
    argv = [
        "demo",
        "--video-input", clip,
        "--output", out_vid,
        "--support-index", idx,
        "--confidence", "0.0",
        "--config", "finetune_vovnet",
        "centernet.pre_nms_topk_test=64", "centernet.post_nms_topk_test=16",
        "roi.detections_per_image=8",
        "input.min_size_test=96", "input.max_size_test=160",
        "fs.support_shot=2", "fs.support_crop_size=96",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    from faster_orefsdet_tpu.cli.demo import main

    main()
    cap = cv2.VideoCapture(out_vid)
    assert cap.isOpened()
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        assert frame.shape == (96, 128, 3)
        n += 1
    cap.release()
    assert n == 10


def test_demo_cli_max_frames(tmp_path, monkeypatch):
    """--max-frames truncates the stream (webcam-style bounded capture)."""
    import cv2
    import numpy as np

    from faster_orefsdet_tpu.data.coco import save_support_index
    from faster_orefsdet_tpu.data.synthetic import make_synthetic_setup

    records, entries = make_synthetic_setup(str(tmp_path / "data"), num_images=3,
                                            seed=1, crop_size=96)
    idx = str(tmp_path / "support_index.json")
    save_support_index(idx, entries)
    clip = str(tmp_path / "clip.avi")
    writer = cv2.VideoWriter(clip, cv2.VideoWriter_fourcc(*"MJPG"), 10.0, (128, 96))
    base = cv2.resize(cv2.imread(records[0].file_name), (128, 96))
    for _ in range(8):
        writer.write(base)
    writer.release()

    out_dir = str(tmp_path / "outdir")
    argv = [
        "demo", "--video-input", clip, "--output", out_dir, "--max-frames", "3",
        "--frame-batch", "1",  # keep the per-frame path covered
        "--support-index", idx, "--confidence", "0.0",
        "centernet.pre_nms_topk_test=64", "centernet.post_nms_topk_test=16",
        "roi.detections_per_image=8",
        "input.min_size_test=96", "input.max_size_test=160",
        "fs.support_shot=2", "fs.support_crop_size=96",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    from faster_orefsdet_tpu.cli.demo import main

    main()
    cap = cv2.VideoCapture(os.path.join(out_dir, "clip_out.mp4"))
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 3


@pytest.mark.slow
def test_demo_cli_video_dp(tmp_path, monkeypatch):
    """--num-devices 8 shards the fused frame-batch serving program over the
    virtual mesh (parallel/serve_dp wired through the demo CLI): 10-frame
    clip -> one full 8-frame sharded dispatch + one padded tail dispatch."""
    import cv2
    import numpy as np

    from faster_orefsdet_tpu.data.coco import save_support_index
    from faster_orefsdet_tpu.data.synthetic import make_synthetic_setup

    records, entries = make_synthetic_setup(str(tmp_path / "data"), num_images=3,
                                            seed=0, crop_size=96)
    idx = str(tmp_path / "support_index.json")
    save_support_index(idx, entries)
    clip = str(tmp_path / "clip.avi")
    writer = cv2.VideoWriter(clip, cv2.VideoWriter_fourcc(*"MJPG"), 10.0, (128, 96))
    base = cv2.resize(cv2.imread(records[0].file_name), (128, 96))
    for i in range(10):
        writer.write(np.roll(base, i * 3, axis=1))
    writer.release()

    out_vid = str(tmp_path / "out" / "clip_dp.mp4")
    argv = [
        "demo", "--video-input", clip, "--output", out_vid,
        "--num-devices", "8", "--frame-batch", "8",
        "--support-index", idx, "--confidence", "0.0",
        "centernet.pre_nms_topk_test=64", "centernet.post_nms_topk_test=16",
        "roi.detections_per_image=8",
        "input.min_size_test=96", "input.max_size_test=160",
        "fs.support_shot=2", "fs.support_crop_size=96",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    from faster_orefsdet_tpu.cli.demo import main

    main()
    cap = cv2.VideoCapture(out_vid)
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 10


def test_demo_cli_dp_indivisible_frame_batch_rejected(monkeypatch, tmp_path):
    from faster_orefsdet_tpu.data.coco import save_support_index
    from faster_orefsdet_tpu.data.synthetic import make_synthetic_setup

    _, entries = make_synthetic_setup(str(tmp_path / "d"), num_images=2,
                                      seed=0, crop_size=96)
    idx = str(tmp_path / "i.json")
    save_support_index(idx, entries)
    import cv2
    import numpy as np

    clip = str(tmp_path / "c.avi")
    w = cv2.VideoWriter(clip, cv2.VideoWriter_fourcc(*"MJPG"), 10.0, (128, 96))
    w.write(np.zeros((96, 128, 3), np.uint8))
    w.release()
    argv = [
        "demo", "--video-input", clip, "--output", str(tmp_path / "o"),
        "--num-devices", "8", "--frame-batch", "6",
        "--support-index", idx,
        "fs.support_shot=2", "fs.support_crop_size=96",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    from faster_orefsdet_tpu.cli.demo import main

    with pytest.raises(SystemExit, match="not divisible"):
        main()


def test_demo_cli_parallel_flag_conflicts_rejected(monkeypatch):
    """--parallel with --num-devices>1 or video --frame-batch>1 must fail
    loudly (the flags were silently ignored before round 5). The guards run
    before any model work, so no support index / weights are needed."""
    from faster_orefsdet_tpu.cli.demo import main

    argv = [
        "demo", "--input", "x/*.png", "--output", "o", "--support-index",
        "i.json", "--parallel", "--num-devices", "2",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    with pytest.raises(SystemExit, match="mutually exclusive"):
        main()

    argv = [
        "demo", "--video-input", "c.avi", "--output", "o", "--support-index",
        "i.json", "--parallel", "--frame-batch", "8",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    with pytest.raises(SystemExit, match="frame-batch 1"):
        main()


def test_demo_cli_parallel_glob(tmp_path, monkeypatch):
    """--parallel glob path (reference demo.py parallel=True -> AsyncPredictor,
    predictor.py:150-238): pipelined results match the sequential path's
    rendered outputs count and write every image."""
    from faster_orefsdet_tpu.data.coco import save_support_index
    from faster_orefsdet_tpu.data.synthetic import make_synthetic_setup

    records, entries = make_synthetic_setup(str(tmp_path / "data"), num_images=3,
                                            seed=0, crop_size=96)
    idx = str(tmp_path / "support_index.json")
    save_support_index(idx, entries)
    out = str(tmp_path / "out")
    img_glob = os.path.join(os.path.dirname(records[0].file_name), "*.jpg")

    argv = [
        "demo", "--input", img_glob, "--output", out,
        "--support-index", idx, "--confidence", "0.0", "--parallel",
        "centernet.pre_nms_topk_test=64", "centernet.post_nms_topk_test=16",
        "roi.detections_per_image=8",
        "input.min_size_test=96", "input.max_size_test=160",
        "fs.support_shot=2", "fs.support_crop_size=96",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    from faster_orefsdet_tpu.cli.demo import main

    main()
    rendered = glob.glob(os.path.join(out, "*.jpg"))
    assert len(rendered) == 3, rendered


def test_demo_cli_num_devices_requires_dp_video(monkeypatch):
    """--num-devices > 1 outside the DP video path (image glob, or video at
    --frame-batch 1) must fail loudly, not silently run single-device."""
    from faster_orefsdet_tpu.cli.demo import main

    argv = [
        "demo", "--input", "x/*.png", "--output", "o", "--support-index",
        "i.json", "--num-devices", "4",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    with pytest.raises(SystemExit, match="DP video serving"):
        main()

    argv = [
        "demo", "--video-input", "c.avi", "--output", "o", "--support-index",
        "i.json", "--num-devices", "4", "--frame-batch", "1",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    with pytest.raises(SystemExit, match="DP video serving"):
        main()


@pytest.mark.slow
def test_demo_cli_quantized_preset_autocalib(tmp_path, monkeypatch):
    """The int8_resident preset is demo-reachable (round 5): the CLI
    auto-calibrates activation scales from the input glob and threads them
    into the inference builder."""
    from faster_orefsdet_tpu.data.coco import save_support_index
    from faster_orefsdet_tpu.data.synthetic import make_synthetic_setup

    records, entries = make_synthetic_setup(str(tmp_path / "data"), num_images=3,
                                            seed=0, crop_size=96)
    idx = str(tmp_path / "support_index.json")
    save_support_index(idx, entries)
    out = str(tmp_path / "out")
    pattern = os.path.join(os.path.dirname(records[0].file_name), "*.jpg")

    argv = [
        "demo", "--input", pattern, "--output", out,
        "--support-index", idx, "--confidence", "0.0",
        "--config", "serving_vovnet_int8_resident",
        # tiny static shapes + CPU-friendly knobs
        "compute_dtype=float32",
        "centernet.pre_nms_topk_test=64", "centernet.post_nms_topk_test=16",
        "centernet.use_pallas_nms=false", "roi.use_pallas_nms=false",
        "use_pallas_cgm=false",
        "roi.detections_per_image=8",
        "input.min_size_test=96", "input.max_size_test=160",
        "fs.support_shot=2", "fs.support_crop_size=96",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    from faster_orefsdet_tpu.cli.demo import main

    main()
    rendered = [os.path.join(out, os.path.basename(r.file_name)) for r in records]
    assert all(os.path.exists(p) for p in rendered), rendered


def test_demo_cli_quantized_video_requires_calib_glob(tmp_path, monkeypatch):
    """Quantized video runs must demand --calib-glob instead of crashing in
    the builder with a missing-scales error."""
    from faster_orefsdet_tpu.data.coco import save_support_index
    from faster_orefsdet_tpu.data.synthetic import make_synthetic_setup

    _, entries = make_synthetic_setup(str(tmp_path / "d"), num_images=2,
                                      seed=0, crop_size=96)
    idx = str(tmp_path / "i.json")
    save_support_index(idx, entries)
    argv = [
        "demo", "--video-input", "c.avi", "--output", str(tmp_path / "o"),
        "--support-index", idx, "--config", "serving_vovnet_int8_static",
        "fs.support_shot=2", "fs.support_crop_size=96",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    from faster_orefsdet_tpu.cli.demo import main

    with pytest.raises(SystemExit, match="calib-glob"):
        main()
