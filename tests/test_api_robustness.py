"""Public-API robustness: Detector.detect on edge-case inputs (CPU).

The reference family's detect(img) is called on arbitrary user frames —
webcam crops, rotated phone photos, thumbnails. The contract here: never
crash on a valid HxWx3 uint8 image of ANY size, always return boxes
clipped to the original image bounds with score-sorted finite scores,
and reject non-image shapes loudly.
"""

import jax
import numpy as np
import pytest

from tpucenterface.config import DetectorConfig, ModelConfig
from tpucenterface.detector import Detector


@pytest.fixture(scope="module")
def det():
    cfg = DetectorConfig(
        model=ModelConfig(compute_dtype="float32"), default_size=64
    )
    return Detector(config=cfg, rng=jax.random.PRNGKey(0))


def _check(det, h, w):
    rng = np.random.RandomState(h * 1000 + w)
    img = rng.randint(0, 255, (h, w, 3), np.uint8)
    d = det.detect(img, score_thresh=-1.0)
    assert d.boxes.shape[1] == 4 and d.boxes.shape[0] == d.scores.shape[0]
    assert np.isfinite(d.scores).all() and np.isfinite(d.boxes).all()
    # score-descending
    assert (np.diff(d.scores) <= 1e-6).all()
    # boxes clipped to the ORIGINAL image bounds (not the padded bucket)
    assert (d.boxes[:, 0] >= 0).all() and (d.boxes[:, 1] >= 0).all()
    assert (d.boxes[:, 2] <= w).all() and (d.boxes[:, 3] <= h).all()
    return d


@pytest.mark.parametrize(
    "h,w",
    [
        (1, 1),          # degenerate thumbnail
        (2, 97),         # extreme wide aspect, odd width
        (97, 2),         # extreme tall aspect
        (64, 64),        # exactly model size (identity fast path)
        (63, 65),        # one off the bucket each way
        (123, 457),      # arbitrary odd landscape
        (300, 100),      # portrait
    ],
)
def test_detect_any_size(det, h, w):
    _check(det, h, w)


def test_detect_deterministic(det):
    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, (90, 120, 3), np.uint8)
    a = det.detect(img, score_thresh=-1.0)
    b = det.detect(img, score_thresh=-1.0)
    np.testing.assert_array_equal(a.boxes, b.boxes)
    np.testing.assert_array_equal(a.scores, b.scores)


def test_detect_rejects_non_color_shapes(det):
    for bad in (np.zeros((64, 64), np.uint8),
                np.zeros((64, 64, 1), np.uint8),
                np.zeros((64, 64, 4), np.uint8),
                np.zeros((2, 64, 64, 3), np.uint8)):
        with pytest.raises(ValueError, match="HxWx3"):
            det.detect(bad)


def test_threshold_filters_monotonically(det):
    rng = np.random.RandomState(11)
    img = rng.randint(0, 255, (80, 80, 3), np.uint8)
    n_low = len(det.detect(img, score_thresh=-1.0).scores)
    n_mid = len(det.detect(img, score_thresh=0.01).scores)
    n_high = len(det.detect(img, score_thresh=0.99).scores)
    assert n_low >= n_mid >= n_high


def test_black_and_white_frames(det):
    # constant frames must not produce NaNs or out-of-bounds boxes
    for fill in (0, 255):
        img = np.full((70, 50, 3), fill, np.uint8)
        d = det.detect(img, score_thresh=-1.0)
        assert np.isfinite(d.scores).all()
        assert (d.boxes[:, 2] <= 50).all() and (d.boxes[:, 3] <= 70).all()
