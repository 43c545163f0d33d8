"""NMS working-set budget equivalence (VERDICT round-1 weak #6).

`decode_proposals` caps the NMS candidate set to `nms_budget_test=1024`
(models/centernet.py) whereas the reference NMS'es every above-threshold
candidate — up to pre_topk*L = 3000 (fsod_rpn.py:1184-1210). The divergence
claim is that with score-threshold 1e-5, NMS 0.6, and post-trim 256, the
survivor sets are identical. This test checks it on dense synthetic scenes
(hundreds of above-threshold peaks, heavy overlap) where the budget actually
binds (1500 candidates > 1024).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from faster_orefsdet_tpu.config import get_config
from faster_orefsdet_tpu.models.centernet import decode_proposals
from faster_orefsdet_tpu.ops.heatmap import level_grid_shapes


def _dense_scene(rng, canvas_hw, strides, n_peaks):
    """Per-level (hm logits [H,W,1], reg [H,W,4]) with n_peaks hot cells plus
    broad low-score background so every cell clears the 1e-5 threshold."""
    agn_hms, bbox_regs = [], []
    shapes = level_grid_shapes(canvas_hw, strides)
    for (hl, wl), s in zip(shapes, strides):
        # background: sigmoid(logit) in ~[0.01, 0.2] — above threshold, low rank
        logits = rng.uniform(-4.5, -1.5, size=(hl, wl, 1)).astype(np.float32)
        k = max(1, n_peaks * hl * wl // sum(h * w for h, w in shapes))
        ys = rng.integers(0, hl, size=k)
        xs = rng.integers(0, wl, size=k)
        logits[ys, xs, 0] = rng.uniform(0.5, 6.0, size=k).astype(np.float32)
        # ltrb in stride units: boxes of 2-6 cells extent, overlapping
        reg = rng.uniform(1.0, 3.0, size=(hl, wl, 4)).astype(np.float32)
        agn_hms.append(jnp.asarray(logits))
        bbox_regs.append(jnp.asarray(reg))
    return agn_hms, bbox_regs


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_budget_1024_matches_unbudgeted_decode(seed):
    cfg = get_config("finetune_vovnet").centernet
    canvas_hw = (320, 320)
    rng = np.random.default_rng(seed)
    agn_hms, bbox_regs = _dense_scene(rng, canvas_hw, cfg.fpn_strides, n_peaks=400)
    image_hw = jnp.asarray([320.0, 320.0])

    kw = dict(cfg=cfg, canvas_hw=canvas_hw, image_hw=image_hw, training=False)
    budgeted = decode_proposals(agn_hms, bbox_regs, nms_budget=1024, **kw)
    # 1_000_000 >= 1500 total candidates → cap never binds (reference behavior)
    unbudgeted = decode_proposals(agn_hms, bbox_regs, nms_budget=1_000_000, **kw)

    n_cand = sum(min(cfg.pre_nms_topk_test, h.size) for h in agn_hms)
    assert n_cand > 1024, "scene must make the budget bind"

    vb = np.asarray(budgeted.valid)
    vu = np.asarray(unbudgeted.valid)
    assert vb.sum() == vu.sum()
    # Survivors are emitted score-sorted by decode_proposals — compare directly.
    np.testing.assert_allclose(
        np.asarray(budgeted.scores)[vb], np.asarray(unbudgeted.scores)[vu], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(budgeted.boxes)[vb], np.asarray(unbudgeted.boxes)[vu], atol=1e-4
    )


def test_budget_knob_reaches_inference_path(monkeypatch):
    """config.StaticShapeConfig.nms_budget_test must actually reach
    decode_proposals through the inference builders (round 5: it was a
    silently-dead knob — decode hardcoded 1024)."""
    import dataclasses

    import jax

    from faster_orefsdet_tpu.pipelines import inference as inf
    from faster_orefsdet_tpu.pipelines.inference import (
        make_detector, query_path_single,
    )
    from faster_orefsdet_tpu.pipelines.support_cache import SupportCache
    from faster_orefsdet_tpu.utils.params import init_params

    cfg = get_config("finetune_vovnet")
    cfg = cfg.replace(static=dataclasses.replace(cfg.static, nms_budget_test=640))
    model = make_detector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    c = cfg.fpn.out_channels
    cache = SupportCache(
        p3=jnp.asarray(rng.standard_normal((32, 32, c), np.float32)),
        p4=jnp.asarray(rng.standard_normal((16, 16, c), np.float32)),
        p5=jnp.asarray(rng.standard_normal((8, 8, c), np.float32)),
        rcnn_8=jnp.asarray(rng.standard_normal((8, 8, c), np.float32)),
        rcnn_4=jnp.asarray(rng.standard_normal((4, 4, c), np.float32)),
    )
    seen = {}
    real = inf.decode_proposals

    def spy(*args, **kwargs):
        seen["nms_budget"] = kwargs.get("nms_budget")
        return real(*args, **kwargs)

    monkeypatch.setattr(inf, "decode_proposals", spy)
    image = jnp.asarray(rng.standard_normal((96, 128, 3), np.float32))
    query_path_single(model, params, cache, image, jnp.asarray([96.0, 120.0]), cfg)
    assert seen["nms_budget"] == 640


def test_turbo_preset_budgets():
    """serving_vovnet_turbo: halved decode budgets on top of the fast preset
    (AP-neutral on the round-5 CPU protocol, RESULTS.md)."""
    turbo = get_config("serving_vovnet_turbo")
    fast = get_config("serving_vovnet_fast")
    assert turbo.centernet.pre_nms_topk_test == 256
    assert turbo.static.nms_budget_test == 512
    assert turbo.centernet.post_nms_topk_test == fast.centernet.post_nms_topk_test == 64
    assert turbo.quantize == "none" and turbo.compute_dtype == "bfloat16"
