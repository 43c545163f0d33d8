"""Sharded evaluation test on the virtual 8-device mesh + VoVNet dw variant."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_vovnet_dw_variant():
    from faster_orefsdet_tpu.models.vovnet import VoVNet

    m = VoVNet(conv_body="V-19-slim-dw-eSE", out_features=("stage3", "stage4", "stage5"))
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    out = m.apply({"params": params}, x)
    assert out["stage3"].shape == (1, 8, 8, 256)
    assert out["stage5"].shape == (1, 2, 2, 512)


def test_evaluate_sharded_runs(tmp_path):
    from faster_orefsdet_tpu.config import get_config
    from faster_orefsdet_tpu.data.coco import load_coco_json
    from faster_orefsdet_tpu.data.synthetic import generate_ore_dataset
    from faster_orefsdet_tpu.parallel import make_mesh
    from faster_orefsdet_tpu.parallel.eval_dp import evaluate_sharded
    from faster_orefsdet_tpu.pipelines.inference import make_detector
    from faster_orefsdet_tpu.pipelines.support_cache import SupportCache
    from faster_orefsdet_tpu.utils.params import init_params

    jp, ir = generate_ore_dataset(str(tmp_path), num_images=10, seed=0,
                                  image_hw=(120, 160))
    records = load_coco_json(jp, ir)

    cfg = get_config("finetune_vovnet")
    cfg = cfg.replace(
        centernet=dataclasses.replace(
            cfg.centernet, pre_nms_topk_test=128, post_nms_topk_test=32
        ),
        roi=dataclasses.replace(cfg.roi, detections_per_image=10),
        input=dataclasses.replace(cfg.input, min_size_test=96, max_size_test=160),
    )
    model = make_detector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    c = cfg.fpn.out_channels
    cache = SupportCache(
        p3=jnp.ones((32, 32, c)), p4=jnp.ones((16, 16, c)), p5=jnp.ones((8, 8, c)),
        rcnn_8=jnp.ones((8, 8, c)), rcnn_4=jnp.ones((4, 4, c)),
    )
    mesh = make_mesh(8)
    results = evaluate_sharded(model, params, cache, records, cfg, mesh)
    assert "AP" in results
    # untrained net: AP may be 0/nan but must be well-formed
    assert isinstance(results["AP"], float)
