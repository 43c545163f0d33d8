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
