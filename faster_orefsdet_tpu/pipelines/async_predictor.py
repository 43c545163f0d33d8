"""Asynchronous predictor: overlap host preprocessing with device compute.

The reference's AsyncPredictor (predictor.py:150-238) hides dataloading
latency behind a pool of per-GPU worker processes. On TPU the same overlap
falls out of JAX's async dispatch: submit the next image's computation before
reading the previous result. This class adds bounded pipelining plus a
background preprocessing thread — one process, no IPC.
"""

from __future__ import annotations

import threading
from collections import deque
from queue import Queue
from typing import Iterable, Iterator, List, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from ..config import Config
from ..models.detector import CenterNet2Detector
from ..pipelines.inference import build_inference_fn
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
    ):
        self.cfg = cfg
        self.params = params
        self.cache = cache
        self.infer = build_inference_fn(cfg, model)
        self.depth = depth
        self.canvas_hw = canvas_hw

    def _prep(self, img: np.ndarray):
        cfg = self.cfg
        if self.canvas_hw is None:
            rh, rw = resize_shortest_edge_size(
                img.shape[0], img.shape[1], cfg.input.min_size_test,
                cfg.input.max_size_test,
            )
            canvas_hw = (-(-rh // 32) * 32, -(-rw // 32) * 32)
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
        preprocesses ahead on a background thread."""
        prep_q: Queue = Queue(maxsize=self.depth)
        _DONE = object()

        def producer():
            for img in images:
                prep_q.put(self._prep(img))
            prep_q.put(_DONE)

        threading.Thread(target=producer, daemon=True).start()

        in_flight: deque = deque()
        while True:
            item = prep_q.get()
            if item is _DONE:
                break
            canvas, hw, scale = item
            det = self.infer(self.params, self.cache, canvas, hw)  # async dispatch
            in_flight.append((det, scale))
            if len(in_flight) >= self.depth:
                yield self._read(*in_flight.popleft())
        while in_flight:
            yield self._read(*in_flight.popleft())

    @staticmethod
    def _read(det, scale) -> dict:
        boxes = np.asarray(det.boxes)
        scores = np.asarray(det.scores)
        valid = np.asarray(det.valid)
        sy, sx = scale
        return {
            "boxes": boxes[valid] * np.asarray([sx, sy, sx, sy]),
            "scores": scores[valid],
        }
