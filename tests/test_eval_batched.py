"""Batched evaluation == batch-1 evaluation (identical AP table).

evaluate(batch_size=N) groups eval images into vmapped dispatches to
amortize per-dispatch latency; the query path is per-image pure, so the AP
table must match batch-1 exactly — including the padded tail batch
(7 images with batch_size=4 exercises padding)."""

import numpy as np
import pytest

import jax

from faster_orefsdet_tpu.config import get_config
from faster_orefsdet_tpu.data.synthetic import make_synthetic_setup
from faster_orefsdet_tpu.pipelines.evaluate import encode_support_set, evaluate
from faster_orefsdet_tpu.pipelines.inference import make_detector
from faster_orefsdet_tpu.utils.params import init_variables


def test_batched_eval_matches_batch1(tmp_path):
    import dataclasses

    cfg = get_config("finetune_vovnet")
    cfg = cfg.replace(
        input=dataclasses.replace(
            cfg.input, min_size_test=128, max_size_test=192
        ),
        fs=dataclasses.replace(cfg.fs, support_shot=2),
    )
    records, entries = make_synthetic_setup(str(tmp_path), num_images=7, seed=0)
    model = make_detector(cfg)
    params, batch_stats = init_variables(model, cfg, jax.random.PRNGKey(0))
    cache = encode_support_set(model, params, entries, cfg, batch_stats=batch_stats)

    r1 = evaluate(model, params, cache, records, cfg, batch_stats=batch_stats)
    rb = evaluate(model, params, cache, records, cfg, batch_stats=batch_stats,
                  batch_size=4)
    for k in ("AP", "AP50", "AP75", "AR@100"):
        a, b = r1.get(k, float("nan")), rb.get(k, float("nan"))
        if np.isnan(a) and np.isnan(b):
            continue
        assert a == pytest.approx(b, abs=1e-6), (k, a, b)


def test_eval_autocalibrates_quantized_config(tmp_path):
    """evaluate() under a static-quantized config with act_scales omitted
    auto-calibrates from the eval canvases instead of raising in the
    builder — the `cli.train --eval-only` quantized-preset path."""
    import dataclasses

    cfg = get_config("finetune_vovnet")
    cfg = cfg.replace(
        quantize="int8_resident",
        input=dataclasses.replace(
            cfg.input, min_size_test=96, max_size_test=128
        ),
        fs=dataclasses.replace(cfg.fs, support_shot=2),
    )
    records, entries = make_synthetic_setup(str(tmp_path), num_images=3, seed=0)
    model = make_detector(cfg)
    params, batch_stats = init_variables(model, cfg, jax.random.PRNGKey(0))
    cache = encode_support_set(model, params, entries, cfg, batch_stats=batch_stats)

    res = evaluate(model, params, cache, records, cfg, batch_stats=batch_stats)
    assert np.isfinite(res["AP"]) or np.isnan(res["AP"])  # ran end-to-end
