"""Pipelined video-stream detection (SURVEY.md §3.4, BASELINE config #4).

The reference's camera loop is fully synchronous: capture -> preprocess ->
forward -> decode -> draw, each frame paying the whole stack's latency.
Here the host stages frame N+1 (pad + async device_put) while the device
runs frame N, and fetches frame N-1's small (K,5) result — a two-deep
software pipeline whose steady-state cost is max(host, device) instead of
their sum. 720p frames land in one (768, 1408) padded bucket, so exactly one
executable serves the whole stream.
"""

from __future__ import annotations

import collections
import time
from typing import Iterable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpucenterface.preprocess import pad_to_bucket


class VideoPipeline:
    """Software-pipelined single-stream detector."""

    def __init__(self, detector, size: Optional[int] = None, depth: int = 2):
        self.detector = detector
        self.size = size or detector.config.default_size
        self.depth = depth
        self.last_fps: float = 0.0
        self.steady_latencies_ms: list = []

    def run(
        self, frames: Iterable[np.ndarray], score_thresh: Optional[float] = None
    ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Yield (frame, boxes, scores) per input frame, pipelined."""
        det = self.detector
        thresh = (
            det.config.decode.score_thresh if score_thresh is None else score_thresh
        )
        inflight: collections.deque = collections.deque()
        fn = None
        n = 0
        t0 = time.perf_counter()
        for frame in frames:
            h, w = frame.shape[:2]
            padded = pad_to_bucket(frame)
            if fn is None:
                fn = det._single_fn(padded.shape[:2], self.size)
            t_submit = time.perf_counter()
            dev_img = jax.device_put(jnp.asarray(padded))
            out = fn(dev_img, jnp.array([h, w], jnp.int32))
            boxes, scores = out[0], out[1]
            inflight.append((frame, boxes, scores, t_submit))
            if len(inflight) >= self.depth:
                yield self._drain_one(inflight, thresh)
                n += 1
        while inflight:
            yield self._drain_one(inflight, thresh)
            n += 1
        dt = time.perf_counter() - t0
        self.last_fps = n / dt if dt > 0 else 0.0

    def _drain_one(self, inflight, thresh):
        frame, boxes, scores, t_submit = inflight.popleft()
        boxes = np.asarray(boxes)
        scores = np.asarray(scores)
        self.steady_latencies_ms.append((time.perf_counter() - t_submit) * 1e3)
        keep = scores >= thresh
        return frame, boxes[keep], scores[keep]


def draw_detections(
    frame: np.ndarray, boxes: np.ndarray, scores: np.ndarray
) -> np.ndarray:
    """OpenCV box/score overlay (the reference demo's drawing surface)."""
    import cv2

    out = frame.copy()
    for (x1, y1, x2, y2), s in zip(boxes.astype(int), scores):
        cv2.rectangle(out, (x1, y1), (x2, y2), (0, 255, 0), 2)
        cv2.putText(
            out,
            f"{s:.2f}",
            (x1, max(0, y1 - 4)),
            cv2.FONT_HERSHEY_SIMPLEX,
            0.5,
            (0, 255, 0),
            1,
        )
    return out
