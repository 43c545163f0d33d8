"""finetune_R_50_C4_1x config: 4x4 main ROI pooler query path
(ROI_BOX_HEAD.POOLER_RESOLUTION: 4, finetune_R_50_C4_1x.yaml)."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from faster_orefsdet_tpu.config import get_config
from faster_orefsdet_tpu.pipelines.inference import make_detector, query_path_single
from faster_orefsdet_tpu.pipelines.support_cache import SupportCache
from faster_orefsdet_tpu.utils.params import init_params


def test_r50_query_path_with_4x4_pooler():
    cfg = get_config("finetune_R_50_C4_1x")
    assert cfg.roi.pooler_resolution == 4
    assert cfg.roi.pooler_resolution2 == 4
    cfg = cfg.replace(
        centernet=dataclasses.replace(
            cfg.centernet, pre_nms_topk_test=64, post_nms_topk_test=16
        ),
        roi=dataclasses.replace(cfg.roi, detections_per_image=8),
    )
    model = make_detector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    c = cfg.fpn.out_channels
    g = np.random.default_rng(0)
    cache = SupportCache(
        p3=jnp.asarray(g.standard_normal((32, 32, c), dtype=np.float32)),
        p4=jnp.asarray(g.standard_normal((16, 16, c), dtype=np.float32)),
        p5=jnp.asarray(g.standard_normal((8, 8, c), dtype=np.float32)),
        rcnn_8=jnp.asarray(g.standard_normal((4, 4, c), dtype=np.float32)),
        rcnn_4=jnp.asarray(g.standard_normal((4, 4, c), dtype=np.float32)),
    )
    img = jnp.asarray(g.standard_normal((96, 128, 3), dtype=np.float32))
    det = query_path_single(model, params, cache, img, jnp.asarray([96.0, 128.0]), cfg)
    assert det.boxes.shape == (8, 4)
    assert np.isfinite(np.asarray(det.boxes)).all()
    assert np.isfinite(np.asarray(det.scores)).all()
