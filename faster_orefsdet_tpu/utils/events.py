"""Metric logging: scalar events to terminal + metrics.jsonl.

Replaces d2 EventStorage/PeriodicWriter/CommonMetricPrinter
(detectron2.7z!utils/events.py; writers wired engine/defaults.py:466-493):
scalars accumulate per step and flush as one JSON line every `period` steps,
mirroring the reference's metrics.json format."""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Dict, Optional


def drain_device_metrics(window):
    """[(step, {k: device_scalar})] -> [(step, {k: float})] with ONE host
    readback for the whole window.

    Reading each metric back per step (float(v) in the loop) forces a full
    device sync every iteration, serializing host data prep against the
    jitted step; stacking the window into a single buffer keeps the device
    queue deep and costs one transfer per `period` steps."""
    if not window:
        return []
    import jax
    import jax.numpy as jnp
    import numpy as np

    keys = sorted(window[0][1])
    stacked = jnp.stack(
        [jnp.stack([jnp.asarray(m[k], jnp.float32) for k in keys]) for _, m in window]
    )
    vals = np.asarray(jax.device_get(stacked))
    return [
        (step, {k: float(vals[i, j]) for j, k in enumerate(keys)})
        for i, (step, _) in enumerate(window)
    ]


class EventLogger:
    def __init__(self, output_dir: str, period: int = 20, printer=print,
                 tensorboard: bool = False):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "metrics.jsonl")
        self.period = period
        self.printer = printer
        self._buffer: Dict[str, list] = defaultdict(list)
        self._nsteps = 0
        self._last_time = time.perf_counter()
        self._tb = None
        if tensorboard:
            # TensorboardXWriter analog (d2 engine/defaults.py:469-493)
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(output_dir, "tb"))
            except Exception as e:  # tensorboard optional
                self.printer(f"tensorboard unavailable ({e}); jsonl only")

    def log(self, step: int, scalars: Dict[str, float], count: int = 1) -> None:
        """count: how many optimizer steps this entry aggregates (scan-fused
        K-step chunks log once per chunk with count=K, so time_per_iter
        stays a true per-iteration figure; count=0 marks non-step scalars
        like in-training eval results, which join the next row without
        inflating its step count).

        Flushing is the CALLER's job (the train loop flushes once per
        drained window): an internal step%period flush here would fire
        mid-drain and split the window into rows with duplicated iteration
        labels and wall time misattributed to a partial buffer."""
        w = max(count, 1)  # count=0 entries still carry their own value
        for k, v in scalars.items():
            self._buffer[k].append((float(v), w))
        self._nsteps += count

    def exclude_wall(self, seconds: float) -> None:
        """Remove non-training wall time (e.g. an in-training eval pass)
        from the next flush's time_per_iter."""
        self._last_time += seconds

    def flush(self, step: int) -> None:
        if not self._buffer:
            return
        now = time.perf_counter()
        # per-step mean, not mean-of-chunk-means: a window of chunk sizes
        # [8, 8, 3] weights the 3-step chunk's losses by 3, not 1/3 of the
        # window
        means = {
            k: sum(v * w for v, w in pairs) / sum(w for _, w in pairs)
            for k, pairs in self._buffer.items()
        }
        n = self._nsteps or max(len(v) for v in self._buffer.values())
        means["iteration"] = step
        means["time_per_iter"] = (now - self._last_time) / max(n, 1)
        with open(self.path, "a") as f:
            f.write(json.dumps(means) + "\n")
        if self._tb is not None:
            for k, v in means.items():
                if k != "iteration":
                    self._tb.add_scalar(k, v, step)
        loss_str = "  ".join(
            f"{k}: {v:.4g}" for k, v in sorted(means.items()) if k.startswith("loss") or k == "total_loss"
        )
        self.printer(
            f"iter {step}  {loss_str}  ({means['time_per_iter']:.3f} s/it)"
        )
        self._buffer.clear()
        self._nsteps = 0
        self._last_time = now
