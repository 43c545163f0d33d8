"""Feature-map / attention-map dump tool — the demo_visualizer.py equivalent.

The reference's `Have_a_Look` (demo_visualizer.py:36-77) saves
channel-averaged heatmap overlays of intermediate tensors. This CLI runs the
query path phase by phase and writes channel-mean heatmaps of the backbone
pyramid, the CGM-correlated ("attention") pyramid, and the agnostic-heatmap
logits — without the reference's import-time coupling into the model files
(fsod_cen.py:9 imports the visualizer at module scope; here it is a
standalone tool).

Usage:
  python -m faster_orefsdet_tpu.cli.visualize_features \
      --input image.png --support-index support_index.json \
      [--params model.npz] [--out feature_maps/]
"""

from __future__ import annotations

import argparse
import os


def _save_heatmap(arr, path, base_img=None):
    """arr: [H, W] -> colorized heatmap png (optionally overlaid)."""
    import cv2
    import numpy as np

    a = np.asarray(arr, np.float32)
    a = (a - a.min()) / max(a.max() - a.min(), 1e-8)
    hm = cv2.applyColorMap((a * 255).astype(np.uint8), cv2.COLORMAP_JET)
    if base_img is not None:
        hm = cv2.resize(hm, (base_img.shape[1], base_img.shape[0]))
        hm = (0.5 * hm + 0.5 * base_img).astype(np.uint8)
    cv2.imwrite(path, hm)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="finetune_vovnet")
    p.add_argument("--input", required=True)
    p.add_argument("--support-index", required=True)
    p.add_argument("--params")
    p.add_argument("--out", default="feature_maps")
    args = p.parse_args()

    import cv2
    import numpy as np

    import jax
    import jax.numpy as jnp

    from ..config import get_config
    from ..data.coco import load_support_index
    from ..models.detector import support_kernels
    from ..pipelines.evaluate import encode_support_set
    from ..pipelines.inference import make_detector
    from ..pipelines.preprocess import preprocess_host, resize_shortest_edge_size
    from ..utils.checkpoint import load_params_npz
    from ..utils.params import init_params

    cfg = get_config(args.config)
    model = make_detector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    if args.params:
        params = load_params_npz(args.params, params)
    cache = encode_support_set(model, params, load_support_index(args.support_index), cfg)

    img = cv2.imread(args.input)
    rh, rw = resize_shortest_edge_size(
        img.shape[0], img.shape[1], cfg.input.min_size_test, cfg.input.max_size_test
    )
    d = cfg.input.size_divisibility
    canvas_hw = (-(-rh // d) * d, -(-rw // d) * d)
    canvas, _, _ = preprocess_host(
        img, cfg.input.min_size_test, cfg.input.max_size_test, canvas_hw,
        cfg.input.pixel_mean, cfg.input.pixel_std,
    )

    variables = {"params": params}
    feats = model.apply(variables, jnp.asarray(canvas)[None], method=model.features)
    kernels = {
        "p3": support_kernels(cache.p3),
        "p4": support_kernels(cache.p4),
        "p5": support_kernels(cache.p5),
    }
    pos = model.apply(variables, feats, kernels, method=model.correlate)
    agn_hms, _ = model.apply(variables, pos, method=model.proposal_head)

    os.makedirs(args.out, exist_ok=True)
    base = cv2.resize(img, (rw, rh))
    for lvl in ("p3", "p4", "p5"):
        _save_heatmap(np.asarray(feats[lvl][0]).mean(-1),
                      os.path.join(args.out, f"backbone_{lvl}.png"), base)
        _save_heatmap(np.asarray(pos[lvl][0]).mean(-1),
                      os.path.join(args.out, f"attention_{lvl}.png"), base)
    for i, lvl in enumerate(("p3", "p4", "p5")):
        _save_heatmap(np.asarray(jax.nn.sigmoid(agn_hms[i][0, :, :, 0])),
                      os.path.join(args.out, f"heatmap_{lvl}.png"), base)
    print(f"wrote 9 feature maps to {args.out}/")


if __name__ == "__main__":
    main()
