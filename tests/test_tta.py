"""detect_tta behavior: flip un-mirroring, scale buckets, NMS merge."""

import jax
import numpy as np

from tpucenterface.config import DetectorConfig, ModelConfig
from tpucenterface.detector import Detector
from tpucenterface.eval.tta import detect_tta, flip_detect


def _det():
    return Detector(
        config=DetectorConfig(
            model=ModelConfig(compute_dtype="float32"),
            buckets=(64, 96),
            default_size=64,
        ),
        rng=jax.random.PRNGKey(0),
    )


def test_flip_detect_unmirrors_boxes():
    det = _det()
    img = np.random.RandomState(0).randint(0, 255, (64, 96, 3), np.uint8)
    boxes, scores = flip_detect(det, img, score_thresh=0.0, size=64)
    assert (boxes[:, 0] <= boxes[:, 2]).all()
    assert boxes[:, 2].max() <= 96 + 1e-3


def test_detect_tta_merges_and_bounds():
    det = _det()
    img = np.random.RandomState(1).randint(0, 255, (48, 80, 3), np.uint8)
    boxes, scores = detect_tta(
        det, img, scales=(0.5, 1.0), flip=True, score_thresh=0.0, nms_thresh=0.4
    )
    assert len(boxes) == len(scores)
    assert np.all(np.diff(scores) <= 1e-6)          # score-descending
    assert boxes[:, 2].max() <= 80 + 1e-3 and boxes[:, 3].max() <= 48 + 1e-3
    # NMS merged: no two kept boxes overlap above the threshold
    from tpucenterface.eval.wider_eval import bbox_overlaps

    if len(boxes) > 1:
        iou = bbox_overlaps(boxes.astype(np.float64), boxes.astype(np.float64))
        np.fill_diagonal(iou, 0.0)
        assert iou.max() <= 0.4 + 1e-6


def test_detect_tta_respects_max_dets():
    det = _det()
    img = np.random.RandomState(2).randint(0, 255, (64, 64, 3), np.uint8)
    boxes, _ = detect_tta(
        det, img, scales=(1.0,), flip=True, score_thresh=0.0, max_dets=5
    )
    assert len(boxes) <= 5


def test_flip_unmirror_exact_mapping():
    """img[:, ::-1] maps pixel x -> w-1-x; the un-mirror must invert exactly."""

    class Fake:
        def detect(self, img, **kw):
            return np.array([[10.0, 5.0, 20.0, 15.0]]), np.array([0.9])

    w = 100
    img = np.zeros((50, w, 3), np.uint8)
    boxes, scores = flip_detect(Fake(), img)
    assert np.allclose(boxes[0], [w - 1 - 20.0, 5.0, w - 1 - 10.0, 15.0])
    assert scores[0] == 0.9
