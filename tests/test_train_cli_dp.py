"""CLI-level data-parallel e2e: drive cli/train.py main() with
--num-devices 8 on the virtual mesh (VERDICT r2 next #3).

Covers the mesh branch at cli/train.py (shard_batch per step, the
ims_per_batch divisibility assert, replicate-AFTER-resume ordering, the
--eval-period in-training hook, and --eval-only dispatch through
parallel.eval_dp.evaluate_sharded). The reference's equivalent surface is
its launch path (detectron2.7z!engine/launch.py:27-125), which IS its CLI.
"""

import json
import os
import sys

import pytest


TINY_OPTS = [
    # tiny static shapes so the 8-device CPU compile stays fast
    "centernet.pre_nms_topk_train=64", "centernet.post_nms_topk_train=32",
    "centernet.pre_nms_topk_test=64", "centernet.post_nms_topk_test=16",
    "roi.batch_size_per_image=16", "roi.detections_per_image=8",
    "static.max_gt_per_image=8",
    "input.min_size_train=(96,)", "input.max_size_train=160",
    "input.min_size_test=96", "input.max_size_test=160",
    "fs.support_shot=2", "fs.support_crop_size=96",
    "solver.ims_per_batch=8",  # must divide over the 8-device mesh
    "solver.checkpoint_period=2",
]


@pytest.fixture(scope="module")
def synth_cli(tmp_path_factory):
    from faster_orefsdet_tpu.data.coco import save_support_index
    from faster_orefsdet_tpu.data.synthetic import make_synthetic_setup

    data = tmp_path_factory.mktemp("cli_dp_data")
    records, entries = make_synthetic_setup(str(data), num_images=4, seed=0,
                                            crop_size=96)
    idx = str(data / "support_index.json")
    save_support_index(idx, entries)
    return {
        "json": os.path.join(str(data), "instances.json"),
        "images": os.path.join(str(data), "images"),
        "index": idx,
    }


@pytest.mark.slow
def test_train_cli_dp_train_resume_eval(synth_cli, tmp_path, monkeypatch):
    from faster_orefsdet_tpu.cli.train import main

    out = str(tmp_path / "out")
    base = [
        "train", "--config", "finetune_vovnet",
        "--train-json", synth_cli["json"], "--train-images", synth_cli["images"],
        "--test-json", synth_cli["json"], "--test-images", synth_cli["images"],
        "--support-index", synth_cli["index"],
        "--num-devices", "8",
        "--output-dir", out,
    ] + TINY_OPTS

    # ---- train 2 steps with an in-training eval at step 2
    monkeypatch.setattr(sys, "argv", base + ["--max-iter", "2", "--eval-period", "2"])
    main()
    assert os.path.exists(os.path.join(out, "model_final.npz"))
    # the EvalHook equivalent logged eval/AP into metrics.jsonl
    with open(os.path.join(out, "metrics.jsonl")) as f:
        rows = [json.loads(line) for line in f]
    assert any("eval/AP" in r for r in rows), rows

    # ---- resume: replicate-after-resume ordering on the mesh branch
    monkeypatch.setattr(sys, "argv", base + ["--max-iter", "4", "--resume"])
    main()
    from faster_orefsdet_tpu.utils.checkpoint import latest_step

    assert latest_step(os.path.join(out, "checkpoints")) == 4

    # ---- eval-only through evaluate_sharded on the 8-device mesh
    monkeypatch.setattr(sys, "argv", [
        "train", "--config", "finetune_vovnet", "--eval-only",
        "--test-json", synth_cli["json"], "--test-images", synth_cli["images"],
        "--support-index", synth_cli["index"],
        "--init-npz", os.path.join(out, "model_final.npz"),
        "--num-devices", "8",
        "--output-dir", out,
    ] + TINY_OPTS)
    results = main()
    assert "AP" in results and "AP50" in results


def test_train_cli_divisibility_assert(synth_cli, tmp_path, monkeypatch):
    """ims_per_batch that doesn't divide the mesh must fail loudly."""
    from faster_orefsdet_tpu.cli.train import main

    argv = [
        "train", "--config", "finetune_vovnet",
        "--train-json", synth_cli["json"], "--train-images", synth_cli["images"],
        "--support-index", synth_cli["index"],
        "--num-devices", "8", "--max-iter", "1",
        "--output-dir", str(tmp_path / "out2"),
    ] + [o for o in TINY_OPTS if not o.startswith("solver.ims_per_batch")] + [
        "solver.ims_per_batch=3",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    with pytest.raises(AssertionError, match="must divide"):
        main()
