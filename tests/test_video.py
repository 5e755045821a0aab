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


def test_multi_stream_pipeline_matches_direct():
    """3 synthetic streams coalesce through one engine; per-stream order and
    per-frame results match direct detect()."""
    import jax
    import numpy as np

    from tpucenterface.config import DetectorConfig, ModelConfig
    from tpucenterface.detector import Detector
    from tpucenterface.runtime.video import MultiStreamPipeline

    cfg = DetectorConfig(
        model=ModelConfig(compute_dtype="float32"), default_size=64
    )
    det = Detector(config=cfg, rng=jax.random.PRNGKey(2))
    rng = np.random.RandomState(6)
    streams = [
        [rng.randint(0, 255, (50, 60, 3), np.uint8) for _ in range(4)]
        for _ in range(3)
    ]
    pipe = MultiStreamPipeline(det, n_streams=3, score_thresh=-1.0)
    per_stream = {0: [], 1: [], 2: []}
    for si, frame, dets in pipe.run(streams):
        per_stream[si].append((frame, dets))
    for si, items in per_stream.items():
        assert len(items) == 4
        for (frame, dets), orig in zip(items, streams[si]):
            np.testing.assert_array_equal(frame, orig)  # order preserved
            ref = det.detect(orig, score_thresh=-1.0)
            np.testing.assert_allclose(dets.scores, ref.scores, atol=1e-5)
            np.testing.assert_allclose(dets.boxes, ref.boxes, atol=1e-3)


def test_multi_stream_rejects_mixed_buckets():
    import jax
    import numpy as np
    import pytest

    from tpucenterface.config import DetectorConfig, ModelConfig
    from tpucenterface.detector import Detector
    from tpucenterface.runtime.video import MultiStreamPipeline

    cfg = DetectorConfig(
        model=ModelConfig(compute_dtype="float32"), default_size=64
    )
    det = Detector(config=cfg, rng=jax.random.PRNGKey(2))
    streams = [
        [np.zeros((50, 60, 3), np.uint8)],
        [np.zeros((200, 60, 3), np.uint8)],  # different pad bucket
    ]
    pipe = MultiStreamPipeline(det, n_streams=2, score_thresh=-1.0)
    with pytest.raises(ValueError):
        list(pipe.run(streams))


def test_video_pipeline_mid_stream_resolution_change():
    """A stream whose frames change resolution mid-flight must re-dispatch
    to the new bucket's program, not feed a stale jit (VERDICT r2 #9)."""
    cfg = DetectorConfig(
        model=ModelConfig(compute_dtype="float32"), default_size=64
    )
    det64 = Detector(config=cfg, rng=jax.random.PRNGKey(7))
    rng = np.random.RandomState(5)
    frames = [rng.randint(0, 255, (64, 64, 3), np.uint8) for _ in range(3)]
    frames += [rng.randint(0, 255, (96, 64, 3), np.uint8) for _ in range(3)]
    pipe = VideoPipeline(det64, size=64)
    out = list(pipe.run(iter(frames), score_thresh=-1.0))
    assert len(out) == 6
    for (frame, boxes, scores), src in zip(out, frames):
        assert frame is src
        ref = det64.detect(src, score_thresh=-1.0)
        np.testing.assert_allclose(scores, ref.scores, atol=1e-5)
