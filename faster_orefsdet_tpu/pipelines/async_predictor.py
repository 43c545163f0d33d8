"""Asynchronous predictor: overlap host preprocessing with device compute.

The reference's AsyncPredictor (predictor.py:150-238) hides dataloading
latency behind a pool of per-GPU worker processes. On TPU the same overlap
falls out of JAX's async dispatch: submit the next image's computation before
reading the previous result. This class adds bounded pipelining plus a
background preprocessing thread — one process, no IPC.

Two relay-specific levers (round-4):
  - the query path is dispatched through a PINNED program (params/cache are
    compile-time captures), so per-dispatch host cost is the two image
    tensors, not the ~170-leaf param pytree;
  - `readback_workers > 0` fetches results on a thread pool, overlapping the
    per-result relay round-trip (~30-40 ms each when fetched serially) the
    way the reference overlaps its per-GPU result queues.
"""

from __future__ import annotations

import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from queue import Queue
from typing import Iterable, Iterator, List, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from ..config import Config
from ..models.detector import CenterNet2Detector
from ..pipelines.inference import build_pinned_inference_fn
from ..pipelines.preprocess import preprocess_host, resize_shortest_edge_size
from ..pipelines.support_cache import SupportCache


class AsyncPredictor:
    def __init__(
        self,
        cfg: Config,
        params,
        cache: SupportCache,
        model: Optional[CenterNet2Detector] = None,
        depth: int = 3,
        canvas_hw: Optional[Tuple[int, int]] = None,
        readback_workers: int = 0,
        act_scales=None,
    ):
        self.cfg = cfg
        # Weights are PINNED into the program at construction (underscored:
        # mutating them would silently have no effect on inference — build a
        # new predictor, a full recompile, to serve updated weights).
        self._params = params
        self._cache = cache
        # packed=True: one [K,7] result array = ONE host readback per image
        # (a Detections pytree costs one relay round-trip per leaf).
        self._pinned = build_pinned_inference_fn(
            cfg, params, cache, model=model, packed=True, act_scales=act_scales
        )
        self.depth = depth
        self.canvas_hw = canvas_hw
        self.readback_workers = readback_workers

    def _prep(self, img: np.ndarray):
        cfg = self.cfg
        if self.canvas_hw is None:
            rh, rw = resize_shortest_edge_size(
                img.shape[0], img.shape[1], cfg.input.min_size_test,
                cfg.input.max_size_test,
            )
            d = cfg.input.size_divisibility
            canvas_hw = (-(-rh // d) * d, -(-rw // d) * d)
        else:
            canvas_hw = self.canvas_hw
        canvas, (nh, nw), scale = preprocess_host(
            img, cfg.input.min_size_test, cfg.input.max_size_test, canvas_hw,
            cfg.input.pixel_mean, cfg.input.pixel_std,
        )
        return jnp.asarray(canvas), jnp.asarray([float(nh), float(nw)]), scale

    def run(self, images: Iterable[np.ndarray]) -> Iterator[dict]:
        """Yields {'boxes','scores'} per image (original-frame coords),
        keeping up to `depth` device computations in flight while the host
        preprocesses ahead on a background thread. With `readback_workers`,
        result fetches run on a thread pool so `depth` relay round-trips
        overlap instead of serializing."""
        prep_q: Queue = Queue(maxsize=self.depth)
        _DONE = object()

        def producer():
            for img in images:
                prep_q.put(self._prep(img))
            prep_q.put(_DONE)

        threading.Thread(target=producer, daemon=True).start()

        pool = (
            ThreadPoolExecutor(max_workers=self.readback_workers)
            if self.readback_workers > 0
            else None
        )
        submit = pool.submit if pool else None

        in_flight: deque = deque()
        try:
            while True:
                item = prep_q.get()
                if item is _DONE:
                    break
                canvas, hw, scale = item
                det = self._pinned(canvas, hw)  # async dispatch
                in_flight.append(
                    submit(self._read, det, scale) if pool else (det, scale)
                )
                if len(in_flight) >= self.depth:
                    head = in_flight.popleft()
                    yield head.result() if pool else self._read(*head)
            while in_flight:
                head = in_flight.popleft()
                yield head.result() if pool else self._read(*head)
        finally:
            if pool:
                pool.shutdown(wait=False)

    @staticmethod
    def _read(packed, scale) -> dict:
        from .inference import unpack_detections_np

        d = unpack_detections_np(packed)  # one readback
        valid = d["valid"]
        sy, sx = scale
        return {
            "boxes": d["boxes"][valid] * np.asarray([sx, sy, sx, sy]),
            "scores": d["scores"][valid],
        }
