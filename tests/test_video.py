"""Pipelined video detection tests (SURVEY.md §3.4, config #4)."""

import jax
import numpy as np

from tpucenterface.config import DetectorConfig, ModelConfig
from tpucenterface.detector import Detector
from tpucenterface.runtime.video import VideoPipeline, draw_detections


def _frames(n, h=96, w=128):
    rng = np.random.RandomState(0)
    for _ in range(n):
        yield rng.randint(0, 255, (h, w, 3), np.uint8)


def test_video_pipeline_yields_all_frames():
    cfg = DetectorConfig(model=ModelConfig(compute_dtype="float32"), default_size=64)
    det = Detector(config=cfg, rng=jax.random.PRNGKey(0))
    pipe = VideoPipeline(det, size=64, depth=2)
    results = list(pipe.run(_frames(6), score_thresh=0.0))
    assert len(results) == 6
    for frame, boxes, scores in results:
        assert frame.shape == (96, 128, 3)
        assert boxes.shape[1] == 4 and len(boxes) == len(scores)
        # boxes within original frame bounds
        if len(boxes):
            assert boxes[:, 2].max() <= 128 + 1e-3
            assert boxes[:, 3].max() <= 96 + 1e-3
    assert pipe.last_fps > 0


def test_draw_detections_shapes():
    frame = np.zeros((96, 128, 3), np.uint8)
    out = draw_detections(
        frame, np.array([[10, 10, 50, 60]], np.float32), np.array([0.9])
    )
    assert out.shape == frame.shape
    assert out.sum() > 0  # something was drawn
