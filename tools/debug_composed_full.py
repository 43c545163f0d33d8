"""Diagnose the full-scale composed parity tail divergence: match detections
between the jax path and the torch transcription by IoU and report score
deltas vs set differences."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import torch
import jax.numpy as jnp

from faster_orefsdet_tpu.config import get_config
from faster_orefsdet_tpu.pipelines.inference import make_detector, query_path_single
from faster_orefsdet_tpu.pipelines.support_cache import build_support_cache
from faster_orefsdet_tpu.utils.torch_convert import convert_torch_checkpoint

from test_composed_parity import t_full_inference, t_support_cache, _pairwise_iou
from test_torch_parity import make_torch_state_dict

cfg = get_config("finetune_vovnet")
model = make_detector(cfg)
seed = 3
sd = make_torch_state_dict(seed=seed)
params = convert_torch_checkpoint(sd)
g = np.random.default_rng(100 + seed)
shot, crop = cfg.fs.support_shot, cfg.fs.support_crop_size
sup_canvas = int(np.ceil(crop / 32) * 32)
sup_imgs = g.standard_normal((shot, sup_canvas, sup_canvas, 3)).astype(np.float32)
x1y1 = g.uniform(0, 60, (shot, 2)).astype(np.float32)
wh = g.uniform(80, crop - 70, (shot, 2)).astype(np.float32)
sup_boxes = np.concatenate([x1y1, np.minimum(x1y1 + wh, crop - 1.0)], 1).astype(np.float32)
img = g.standard_normal((1, 320, 448, 3)).astype(np.float32)
image_hw = (320.0, 426.0)

cache = build_support_cache(model, params, jnp.asarray(sup_imgs), jnp.asarray(sup_boxes), cfg)
det = query_path_single(model, params, cache, jnp.asarray(img[0]), jnp.asarray(image_hw), cfg)
valid = np.asarray(det.valid)
gb, gs = np.asarray(det.boxes)[valid], np.asarray(det.scores)[valid]

with torch.no_grad():
    t_cache = t_support_cache(sup_imgs, sup_boxes, sd, cfg)
    rb, rs = t_full_inference(img, image_hw, t_cache, sd, cfg)

print(f"counts: jax {len(gs)} torch {len(rs)}")
iou = _pairwise_iou(gb, rb)
# greedy match by IoU
matched_j, matched_r, pairs = set(), set(), []
order = np.dstack(np.unravel_index(np.argsort(-iou, axis=None), iou.shape))[0]
for j, r in order:
    if iou[j, r] < 0.9:
        break
    if j in matched_j or r in matched_r:
        continue
    matched_j.add(j); matched_r.add(r); pairs.append((j, r))
ds = np.array([abs(gs[j] - rs[r]) for j, r in pairs])
di = np.array([iou[j, r] for j, r in pairs])
print(f"matched (IoU>=0.9): {len(pairs)}/100; score |d| max {ds.max():.2e} p90 {np.percentile(ds,90):.2e}")
print(f"matched IoU min {di.min():.4f}")
print(f"unmatched jax scores: {sorted(gs[i] for i in range(len(gs)) if i not in matched_j)[:8]}")
print(f"unmatched ref scores: {sorted(rs[i] for i in range(len(rs)) if i not in matched_r)[:8]}")
# among matched pairs, how many score-agree within 2e-3?
print(f"matched with |d|<=2e-3: {(ds <= 2e-3).sum()}/{len(pairs)}")
print(f"matched with |d|<=1e-4: {(ds <= 1e-4).sum()}/{len(pairs)}")
