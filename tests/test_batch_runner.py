"""Bucketed batched inference == per-image detect (eval/batch_runner)."""

import jax
import numpy as np

from tpucenterface.config import DetectorConfig, ModelConfig
from tpucenterface.detector import Detector
from tpucenterface.eval.batch_runner import batched_detect


def test_batched_detect_matches_per_image():
    det = Detector(
        config=DetectorConfig(
            model=ModelConfig(compute_dtype="float32"), default_size=64
        ),
        rng=jax.random.PRNGKey(0),
    )
    rng = np.random.RandomState(0)
    shapes = [(60, 90), (100, 70), (60, 90), (128, 128), (60, 90)]
    images = [rng.randint(0, 255, s + (3,), np.uint8) for s in shapes]

    batched = batched_detect(det, images, score_thresh=0.1, batch_size=2)
    assert len(batched) == len(images)
    for img, (b_boxes, b_scores) in zip(images, batched):
        s_boxes, s_scores = det.detect(img, score_thresh=0.1, size=64)
        np.testing.assert_allclose(b_scores, s_scores, atol=1e-5)
        np.testing.assert_allclose(b_boxes, s_boxes, atol=1e-2)


def test_batched_detect_single_bucket_partial_chunk():
    det = Detector(
        config=DetectorConfig(
            model=ModelConfig(compute_dtype="float32"), default_size=64
        ),
        rng=jax.random.PRNGKey(1),
    )
    rng = np.random.RandomState(1)
    images = [rng.randint(0, 255, (50, 60, 3), np.uint8) for _ in range(3)]
    out = batched_detect(det, images, score_thresh=0.0, batch_size=8)
    assert len(out) == 3 and all(len(o) == 2 for o in out)
