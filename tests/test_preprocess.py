"""Device-side letterbox tests vs. a host OpenCV oracle (SURVEY.md §2 C5)."""

import cv2
import jax.numpy as jnp
import numpy as np

from tpucenterface.config import PreprocessConfig
from tpucenterface.preprocess import (
    letterbox_normalize,
    letterbox_normalize_batch,
    pad_to_bucket,
)


def _host_letterbox(img_bgr, size, cfg):
    """Host oracle: cv2 linear resize + centered zero-pad + normalize."""
    h, w = img_bgr.shape[:2]
    s = min(size / h, size / w)
    nw, nh = round(w * s), round(h * s)
    resized = cv2.resize(img_bgr, (nw, nh), interpolation=cv2.INTER_LINEAR)
    canvas = np.zeros((size, size, 3), np.float32)
    px, py = int((size - nw) / 2), int((size - nh) / 2)
    canvas[py : py + nh, px : px + nw] = resized
    rgb = canvas[..., ::-1]
    return (rgb / 255.0 - np.array(cfg.mean)) / np.array(cfg.std)


def test_pad_to_bucket():
    img = np.ones((250, 333, 3), np.uint8)
    out = pad_to_bucket(img, 128)
    assert out.shape == (256, 384, 3)
    assert out[:250, :333].all() and not out[250:].any() and not out[:, 333:].any()


def test_letterbox_matches_cv2_oracle():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (240, 320, 3), np.uint8)
    cfg = PreprocessConfig()
    size = 160
    padded = pad_to_bucket(img, 128)  # (256, 384)
    x, s, pad = letterbox_normalize(
        jnp.asarray(padded), jnp.asarray([240, 320], jnp.int32), size, cfg
    )
    oracle = _host_letterbox(img, size, cfg)
    x = np.asarray(x)
    assert x.shape == (size, size, 3)
    # interiors match closely; borders can differ by half-pixel conventions
    diff = np.abs(x[4:-4, 4:-4] - oracle[4:-4, 4:-4])
    assert float(np.mean(diff)) < 0.05, float(np.mean(diff))
    assert float(s) == 0.5
    np.testing.assert_allclose(np.asarray(pad), [0.0, 20.0], atol=1.0)


def test_letterbox_batch_per_image_sizes():
    rng = np.random.RandomState(1)
    imgs = np.stack(
        [rng.randint(0, 255, (128, 128, 3), np.uint8) for _ in range(3)]
    )
    hws = np.array([[128, 128], [64, 128], [128, 96]], np.int32)
    cfg = PreprocessConfig()
    x, s, pads = letterbox_normalize_batch(
        jnp.asarray(imgs), jnp.asarray(hws), 96, cfg
    )
    assert x.shape == (3, 96, 96, 3)
    np.testing.assert_allclose(np.asarray(s), [0.75, 0.75, 0.75], atol=1e-6)
    # image 1 is 64 tall: half-height content, centered vertically
    assert abs(float(pads[1, 1]) - (96 - 64 * 0.75) / 2) < 1e-4
