"""YAML config layer: _BASE_ inheritance + round-trip onto named configs.

The shipped configs/fsod/*.yaml mirror the reference's yaml surface
(configs/fsod/*.yaml with yacs _BASE_ inheritance); each live yaml must
resolve to exactly the corresponding named Python config.
"""

import os

import pytest

from faster_orefsdet_tpu.config import get_config
from faster_orefsdet_tpu.config_yaml import (
    DeadReferenceConfigError,
    load_merged_yaml,
    load_yaml,
    load_yaml_config,
)

CFG_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs", "fsod"
)


@pytest.mark.parametrize(
    "yaml_name,config_name",
    [
        ("finetune_vovnet.yaml", "finetune_vovnet"),
        ("finetune_dla.yaml", "finetune_dla"),
        ("finetune_R_50_C4_1x.yaml", "finetune_R_50_C4_1x"),
    ],
)
def test_yaml_roundtrips_to_named_config(yaml_name, config_name):
    cfg = load_yaml_config(os.path.join(CFG_DIR, yaml_name))
    assert cfg == get_config(config_name)


def test_base_inheritance_child_wins():
    merged = load_merged_yaml(os.path.join(CFG_DIR, "finetune_vovnet.yaml"))
    # child overrides base (FsodRCNN -> CenterNet2Detector, way 2 -> 1)
    assert merged["MODEL"]["META_ARCHITECTURE"] == "CenterNet2Detector"
    assert merged["INPUT"]["FS"]["SUPPORT_WAY"] == 1
    # base keys the child doesn't touch survive
    assert merged["SOLVER"]["HEAD_LR_FACTOR"] == 2.0
    assert merged["VERSION"] == 2


def test_base_yaml_resolves_to_baseline_config():
    from faster_orefsdet_tpu.pipelines.attention_rpn import BaselineConfig

    cfg = load_yaml(os.path.join(CFG_DIR, "Base-FSOD-C4.yaml"))
    assert isinstance(cfg, BaselineConfig)
    assert cfg.roi_batch_size == 128
    assert cfg.support_shot == 10
    assert cfg.rpn_post_nms_topk_test == 100


@pytest.mark.parametrize("name", ["finetune_dla2.yaml", "finetune_R_50_F.yaml"])
def test_dead_reference_configs_refuse_to_load(name):
    with pytest.raises(DeadReferenceConfigError, match="dead in the reference"):
        load_yaml(os.path.join(CFG_DIR, name))


def test_unknown_key_is_an_error(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("MODEL:\n  META_ARCHITECTURE: CenterNet2Detector\n  TYPO_KEY: 1\n")
    with pytest.raises(KeyError, match="unmapped config key"):
        load_yaml(str(p))


def test_yacs_tuple_strings_parse():
    cfg = load_yaml_config(os.path.join(CFG_DIR, "finetune_vovnet.yaml"))
    assert cfg.solver.steps == (10000, 11000)
    assert cfg.input.min_size_train == (200, 240, 280, 320, 360, 400, 440)
    assert cfg.centernet.sizes_of_interest == ((0, 64), (48, 192), (128, 1000000))
    assert cfg.train_dataset == "coco_2017_train_stone"


def test_serving_preset():
    """serving_vovnet = finetune_vovnet + bf16 + Pallas NMS/CGM, nothing else."""
    from faster_orefsdet_tpu.config import get_config

    base = get_config("finetune_vovnet")
    srv = get_config("serving_vovnet")
    assert srv.compute_dtype == "bfloat16"
    assert srv.centernet.use_pallas_nms and srv.roi.use_pallas_nms
    assert srv.use_pallas_cgm
    # only the serving knobs differ
    norm = srv.replace(compute_dtype=base.compute_dtype, use_pallas_cgm=False)
    import dataclasses

    norm = norm.replace(
        centernet=dataclasses.replace(norm.centernet, use_pallas_nms=False),
        roi=dataclasses.replace(norm.roi, use_pallas_nms=False),
    )
    assert norm == base


def test_serving_fast_preset():
    """serving_vovnet_fast = serving_vovnet + post_nms_topk_test=64 (the
    round-3 AP-neutral budget ablation), nothing else."""
    import dataclasses

    from faster_orefsdet_tpu.config import get_config

    srv = get_config("serving_vovnet")
    fast = get_config("serving_vovnet_fast")
    assert fast.centernet.post_nms_topk_test == 64
    norm = fast.replace(
        centernet=dataclasses.replace(
            fast.centernet, post_nms_topk_test=srv.centernet.post_nms_topk_test
        )
    )
    assert norm == srv
