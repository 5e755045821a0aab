"""Optional 5-point landmark head: decode + detector wiring (SURVEY.md §2 C3
'landmarks optional/stretch')."""

import jax
import jax.numpy as jnp
import numpy as np

from tpucenterface.config import DecodeConfig, DetectorConfig, ModelConfig
from tpucenterface.decode.reference import (
    decode_feats_with_idx,
    decode_landmarks,
)
from tpucenterface.detector import Detector


def test_decode_landmarks_geometry():
    h = w = 16
    hm = np.full((1, h, w, 1), -10.0, np.float32)
    hm[0, 5, 7, 0] = 4.0
    lm = np.zeros((1, h, w, 10), np.float32)
    lm[0, 5, 7] = np.tile([1.5, -0.5], 5)  # all 5 points offset (+1.5, -0.5)
    feats = {
        "hm": jnp.asarray(hm),
        "wh": jnp.ones((1, h, w, 2), jnp.float32),
        "off": jnp.zeros((1, h, w, 2), jnp.float32),
        "lm": jnp.asarray(lm),
    }
    cfg = DecodeConfig(max_dets=3)
    _, _, idx = decode_feats_with_idx(feats, cfg)
    pts = decode_landmarks(feats, idx, cfg)
    assert pts.shape == (1, 3, 5, 2)
    np.testing.assert_allclose(np.asarray(pts[0, 0, 0]), [(7 + 1.5) * 4, (5 - 0.5) * 4])


def test_detector_returns_landmarks():
    cfg = DetectorConfig(
        model=ModelConfig(compute_dtype="float32", with_landmarks=True),
        default_size=64,
    )
    det = Detector(config=cfg, rng=jax.random.PRNGKey(0))
    img = np.random.RandomState(0).randint(0, 255, (64, 80, 3), np.uint8)
    out = det.detect(img, score_thresh=0.0)
    assert len(out) == 3
    boxes, scores, lms = out
    assert lms.shape == (len(boxes), 5, 2)
    # landmarks clipped to original image bounds
    assert lms[..., 0].max() <= 80 + 1e-3 and lms[..., 1].max() <= 64 + 1e-3
