"""Data-parallel serving: the fused raw-pixels→boxes program over a mesh.

Single-chip serving runs at the HBM roofline on this model (RESULTS.md
round-3 corrected analysis: ~815 GB/s of fusion-counted bytes at the
batch-128 knee), so the remaining throughput lever is scale-out. The reference has no
serving story beyond one-GPU demo.py (demo/demo.py:77-136); here the fused
serving program (pipelines.inference.build_serving_fn — resize + normalize +
query path in ONE XLA program) runs with the frame batch sharded over the
mesh's data axis and params/support-cache replicated. Serving is
embarrassingly data-parallel: XLA partitions the whole program per-device
with zero collectives, so throughput scales linearly in devices minus only
the host-side dispatch fan-out.

Validated on the virtual CPU mesh (tests/test_serve_dp.py asserts sharded ==
single-device detections exactly) and compiled+executed by the driver's
multi-chip dryrun (__graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..models.detector import CenterNet2Detector
from ..pipelines.inference import build_serving_fn
from ..pipelines.support_cache import SupportCache


def make_sharded_serving(
    cfg: Config,
    input_hw: Tuple[int, int],
    mesh: Mesh,
    params,
    cache: SupportCache,
    model: Optional[CenterNet2Detector] = None,
    batch_stats=None,
    act_scales=None,
):
    """Returns (serve_fn, canvas_hw).

    serve_fn(raw_images [B, H0, W0, 3] uint8/float, batch sharded over the
    mesh data axis; B must be divisible by the mesh size) → Detections in the
    raw input frame, replicated on the host view.

    Params / support cache / BN stats are device_put replicated ONCE here;
    each call only ships the raw frames (uint8 keeps host→device traffic 4x
    down, as on the single-chip path).

    act_scales: calibrated static scales (pipelines.quant_calib) — required
    for the int8_static / int8_resident presets, same as the single-chip
    builders (quantization is per-image pure, so DP sharding is unaffected).
    """
    fn, canvas_hw = build_serving_fn(cfg, input_hw, model, act_scales=act_scales)
    n_dev = mesh.devices.size
    batch_sharding = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    params = jax.device_put(params, rep)
    cache = jax.device_put(cache, rep)
    if batch_stats is not None:
        batch_stats = jax.device_put(batch_stats, rep)

    def serve_fn(raw_images):
        b = raw_images.shape[0]
        if b % n_dev:
            raise ValueError(
                f"serving batch {b} not divisible by mesh size {n_dev}; pad "
                "the final batch (parallel.eval_dp.evaluate_sharded shows the "
                "repeat-last-frame pattern)"
            )
        raw_images = jax.device_put(raw_images, batch_sharding)
        return fn(params, cache, raw_images, batch_stats)

    return serve_fn, canvas_hw
