"""InputConfig.size_divisibility: wired (round 5 — previously dead) into
every QUERY-canvas computation and validated as a multiple of 32.

The knob mirrors d2's SIZE_DIVISIBILITY (detectron2.7z!config/defaults.py);
the hazard it guards against: eval canvases derived at one divisibility
while the serving program pads at another, so measured AP wouldn't
correspond to the deployed program's shapes.
"""

import dataclasses

import numpy as np
import pytest

import jax


def _cfg(div=64):
    from faster_orefsdet_tpu.config import get_config

    cfg = get_config("finetune_vovnet")
    return cfg.replace(input=dataclasses.replace(cfg.input, size_divisibility=div))


def test_invalid_divisibility_rejected():
    with pytest.raises(ValueError, match="multiple of 32"):
        _cfg(16)
    with pytest.raises(ValueError, match="multiple of 32"):
        _cfg(48)


def test_divisibility_reaches_eval_and_serving_canvases():
    from faster_orefsdet_tpu.data.coco import ImageRecord
    from faster_orefsdet_tpu.data.loader import eval_canvas

    cfg = _cfg(64)
    recs = [ImageRecord(image_id=1, file_name="x.png", height=333, width=500,
                        annotations=())]
    ch, cw = eval_canvas(recs, cfg)
    assert ch % 64 == 0 and cw % 64 == 0

    # serving: the fused program's canvas honors the knob too
    from faster_orefsdet_tpu.pipelines.inference import build_serving_fn, make_detector

    model = make_detector(cfg)
    fn, canvas_hw = build_serving_fn(cfg, (333, 500), model)
    assert canvas_hw[0] % 64 == 0 and canvas_hw[1] % 64 == 0

    # the default-32 canvas is the old hardcoded behavior: 32-divisible and
    # never larger than the 64-divisible one
    c32 = eval_canvas(recs, _cfg(32))
    assert c32[0] % 32 == 0 and c32[1] % 32 == 0
    assert c32[0] <= ch and c32[1] <= cw
