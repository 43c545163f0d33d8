"""Full-loop test on synthetic ore data: support crops → train steps →
support cache → eval → COCO AP. The closest thing to the reference's
operational acceptance protocol (SURVEY.md §4), runnable anywhere."""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from faster_orefsdet_tpu.config import get_config
from faster_orefsdet_tpu.data.coco import split_per_class
from faster_orefsdet_tpu.data.loader import collate, eval_canvas
from faster_orefsdet_tpu.data.mapper import EpisodicMapper, SupportSampler
from faster_orefsdet_tpu.data.synthetic import make_synthetic_setup
from faster_orefsdet_tpu.pipelines.evaluate import encode_support_set, evaluate
from faster_orefsdet_tpu.pipelines.inference import make_detector
from faster_orefsdet_tpu.pipelines.train_step import TrainState, build_train_step
from faster_orefsdet_tpu.solver import build_optimizer
from faster_orefsdet_tpu.utils.params import init_params


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("orev1_synth"))
    records, entries = make_synthetic_setup(out, num_images=8, seed=0, crop_size=96)
    return records, entries


def small_cfg():
    cfg = get_config("finetune_vovnet")
    return cfg.replace(
        centernet=dataclasses.replace(
            cfg.centernet,
            pre_nms_topk_train=256, post_nms_topk_train=128,
            pre_nms_topk_test=256, post_nms_topk_test=64,
        ),
        roi=dataclasses.replace(cfg.roi, batch_size_per_image=32,
                                detections_per_image=30),
        fs=dataclasses.replace(cfg.fs, support_shot=3, support_crop_size=96),
        static=dataclasses.replace(cfg.static, max_gt_per_image=10),
        input=dataclasses.replace(cfg.input,
                                  min_size_train=(128,), max_size_train=224,
                                  min_size_test=128, max_size_test=224),
    )


def test_full_loop(synth):
    records, entries = synth
    cfg = small_cfg()
    model = make_detector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))

    # ---- a few train steps on episodic batches
    train_records = split_per_class(records)
    sampler = SupportSampler(entries)
    mapper = EpisodicMapper(cfg, sampler, is_train=True, canvas_hw=(160, 192))
    rng = np.random.default_rng(0)
    tx = build_optimizer(cfg.solver, params)
    step_fn = build_train_step(cfg, model, tx)
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(3):
        batch = collate([mapper(train_records[i % len(train_records)], rng)])
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, batch, sub)
        losses.append(float(metrics["total_loss"]))
        assert np.isfinite(losses[-1])

    # ---- support cache + eval
    cache = encode_support_set(model, state.params, entries, cfg)
    results = evaluate(model, state.params, cache, records[:4], cfg,
                       canvas_hw=eval_canvas(records[:4], cfg))
    assert "AP" in results and "AP50" in results
    # AP may be near zero for an untrained model; just require a well-formed
    # number and the timing telemetry
    assert np.isfinite(results["AP"]) or np.isnan(results["AP"])
    assert results["latency_mean_s"] > 0


def test_episodic_mapper_determinism(synth):
    records, entries = synth
    cfg = small_cfg()
    sampler = SupportSampler(entries)
    train_records = split_per_class(records)
    rec = train_records[0]
    s1 = sampler.sample(rec.annotations[0].category_id, rec.image_id,
                        [a.id for a in rec.annotations], 1, 3,
                        seed=rec.annotations[0].id)
    s2 = sampler.sample(rec.annotations[0].category_id, rec.image_id,
                        [a.id for a in rec.annotations], 1, 3,
                        seed=rec.annotations[0].id)
    assert [e.id for e in s1] == [e.id for e in s2]
    # exclusion: never the query image's own annotations
    assert all(e.image_id != rec.image_id for e in s1)


def test_support_crop_geometry(synth):
    records, entries = synth
    import cv2

    e = entries[0]
    crop = cv2.imread(e.file_path)
    assert crop.shape[:2] == (96, 96)
    x1, y1, x2, y2 = e.support_box
    assert 0 <= x1 < x2 <= 96 + 1e-6
    assert 0 <= y1 < y2 <= 96 + 1e-6
