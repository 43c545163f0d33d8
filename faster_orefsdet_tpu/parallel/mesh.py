"""Device mesh construction for data-parallel training/eval.

The reference's only parallelism is single-program multi-GPU DDP over NCCL
(detectron2.7z!engine/launch.py:27-125, create_ddp_model defaults.py:60-80;
SURVEY.md §2.5). On TPU that maps to a 1-D `jax.sharding.Mesh` over all
chips with XLA collectives on ICI — no process spawning, no backend
component. Multi-host extends the same mesh across DCN via
jax.distributed.initialize (call `init_distributed` once per host before
device queries)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(num_devices: int = 0, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices:
        if len(devices) < num_devices:
            raise ValueError(
                f"make_mesh: requested a {num_devices}-device mesh but only "
                f"{len(devices)} device(s) are visible "
                f"(platform={devices[0].platform}). Refusing to silently "
                "truncate — pin jax_num_cpu_devices (tests/conftest.py) or "
                "run on hardware with enough chips."
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up (replaces dist.init_process_group('NCCL'),
    launch.py:94-109). No-op for single-host runs."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
