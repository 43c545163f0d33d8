"""Per-phase pure-compute breakdown of the query path on the TPU.

Each phase is measured like bench.py's headline: N iterations chained with a
data dependency inside ONE jitted program -> one dispatch, one readback.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

from faster_orefsdet_tpu.config import get_config
from faster_orefsdet_tpu.pipelines.inference import make_detector, query_path_single
from faster_orefsdet_tpu.pipelines.support_cache import SupportCache
from faster_orefsdet_tpu.utils.params import init_params
from faster_orefsdet_tpu.models.detector import support_kernels
from faster_orefsdet_tpu.models.centernet import decode_proposals
from faster_orefsdet_tpu.models.cascade_roi import roi_inference
from faster_orefsdet_tpu.structures.boxes import apply_deltas, clip_boxes

cfg = get_config("finetune_vovnet").replace(compute_dtype="bfloat16")
model = make_detector(cfg)
params = init_params(model, cfg, jax.random.PRNGKey(0))
c = cfg.fpn.out_channels
rng = np.random.default_rng(0)
cache = SupportCache(
    p3=jnp.asarray(rng.standard_normal((32, 32, c), dtype=np.float32)),
    p4=jnp.asarray(rng.standard_normal((16, 16, c), dtype=np.float32)),
    p5=jnp.asarray(rng.standard_normal((8, 8, c), dtype=np.float32)),
    rcnn_8=jnp.asarray(rng.standard_normal((8, 8, c), dtype=np.float32)),
    rcnn_4=jnp.asarray(rng.standard_normal((4, 4, c), dtype=np.float32)),
)
canvas = (320, 448)
image = jnp.asarray(rng.standard_normal((*canvas, 3), dtype=np.float32))
hw = jnp.asarray([320.0, 427.0])
variables = {"params": params}

N = 100

# dispatch+readback RTT through the relay (~30-40 ms) would otherwise be
# attributed to the chain (CLAUDE.md gotcha); measure it and subtract
@jax.jit
def _trivial(x):
    return jnp.sum(x) * 1e-12


float(_trivial(image))
_rtts = []
for _ in range(10):
    _t0 = time.perf_counter()
    float(_trivial(image))
    _rtts.append(time.perf_counter() - _t0)
RTT = float(np.median(_rtts))
print(f"relay RTT subtracted: {RTT*1e3:.1f} ms")


def timeit(name, fn, *args):
    @jax.jit
    def chained(*a):
        def body(i, carry):
            out = fn(*a, carry)
            return out * 1e-12
        return jax.lax.fori_loop(0, N, body, jnp.asarray(0.0, jnp.float32))

    r = float(chained(*args))  # compile
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(*args))
        runs.append(time.perf_counter() - t0)
    ms = max(min(runs) - RTT, 0.0) / N * 1000
    print(f"{name:28s} {ms:8.3f} ms/iter")
    return ms


# phase functions: each takes a scalar carry folded into the input so XLA
# cannot hoist the loop body
def full(params, cache, image, hw, carry):
    det = query_path_single(model, params, cache, image + carry, hw, cfg)
    return jnp.sum(det.scores).astype(jnp.float32)


def feats_only(params, image, carry):
    f = model.apply({"params": params}, (image + carry)[None], method=model.features)
    return sum(jnp.sum(v).astype(jnp.float32) for v in f.values())


feats_const = model.apply(variables, image[None], method=model.features)
feats_const = {k: v for k, v in feats_const.items()}
kernels = {k: support_kernels(getattr(cache, k)) for k in ("p3", "p4", "p5")}


def corr_head(params, feats, carry):
    f = {k: v + carry for k, v in feats.items()}
    pos = model.apply({"params": params}, f, kernels, method=model.correlate)
    hms, regs = model.apply({"params": params}, pos, method=model.proposal_head)
    return sum(jnp.sum(h).astype(jnp.float32) for h in hms) + sum(
        jnp.sum(r).astype(jnp.float32) for r in regs
    )


pos_const = model.apply(variables, feats_const, kernels, method=model.correlate)
hms_const, regs_const = model.apply(variables, pos_const, method=model.proposal_head)


def decode_nms(hms, regs, carry):
    hms = [h[0] + carry for h in hms]
    regs = [r[0] for r in regs]
    props = decode_proposals(hms, regs, cfg.centernet, canvas, hw, training=False)
    return jnp.sum(props.scores).astype(jnp.float32)


props_const = decode_proposals(
    [h[0] for h in hms_const], [r[0] for r in regs_const], cfg.centernet, canvas, hw,
    training=False,
)


def roi_phase(params, feats, boxes, valid, scores, carry):
    feat_list = [feats[l][0] + carry for l in ("p3", "p4", "p5")]
    outs = []
    b = boxes
    for stage in range(len(cfg.roi.cascade_ious)):
        out = model.apply({"params": params}, feat_list, b, cache.rcnn_8,
                          cache.rcnn_4, stage, method=model.roi_stage)
        outs.append(out)
        b = apply_deltas(out.deltas, b, cfg.roi.cascade_bbox_reg_weights[stage])
        if stage + 1 < len(cfg.roi.cascade_ious):
            b = clip_boxes(b, hw)
    det = roi_inference(outs, b, valid, hw, cfg.roi, proposal_scores=scores)
    return jnp.sum(det.scores).astype(jnp.float32)


t_full = timeit("FULL query path", full, params, cache, image, hw)
t_b = timeit("backbone+FPN", feats_only, params, image)
t_c = timeit("CGM correlate + CN head", corr_head, params, feats_const)
t_d = timeit("decode+NMS", decode_nms, hms_const, regs_const)
t_r = timeit("cascade ROI (+final NMS)", roi_phase, params, feats_const,
             props_const.boxes, props_const.valid, props_const.scores)
print(f"{'sum of phases':28s} {t_b + t_c + t_d + t_r:8.3f} ms (full {t_full:.3f})")
