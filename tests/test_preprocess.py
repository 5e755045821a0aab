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


def test_identity_fast_path_matches_letterbox():
    """normalize_images == letterbox_normalize_batch on pre-sized inputs
    (scale-1 letterbox is the identity up to resample-matmul rounding)."""
    from tpucenterface.preprocess import normalize_images

    rng = np.random.RandomState(2)
    size = 128
    imgs = rng.randint(0, 255, (4, size, size, 3), np.uint8)
    hws = np.full((4, 2), size, np.int32)
    cfg = PreprocessConfig()
    x_gen, s, pads = letterbox_normalize_batch(
        jnp.asarray(imgs), jnp.asarray(hws), size, cfg
    )
    x_id = normalize_images(jnp.asarray(imgs), cfg)
    np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pads), 0.0, atol=1e-5)
    diff = np.abs(np.asarray(x_gen, np.float32) - np.asarray(x_id, np.float32))
    # general path rounds through the bf16 resample matmuls; identity is exact
    assert float(diff.mean()) < 0.02, float(diff.mean())


def test_detector_identity_dispatch_matches_general():
    from tpucenterface.config import DetectorConfig, ModelConfig
    from tpucenterface.detector import Detector

    import dataclasses
    import jax

    size = 64
    rng = np.random.RandomState(5)
    imgs = rng.randint(0, 255, (2, size, size, 3), np.uint8)
    cfg_on = DetectorConfig(
        model=ModelConfig(compute_dtype="float32"), default_size=size
    )
    det = Detector(config=cfg_on, rng=jax.random.PRNGKey(1))
    out_id = det.detect_batch(imgs, score_thresh=-1.0)
    # cache keys carry weights_version as the last component
    assert (
        "batch", 2, (size, size), size, True, None, False,
        det.weights_version,
    ) in det._fn_cache

    # reuse det's (already folded) config so the folded variables load
    cfg_off = dataclasses.replace(
        det.config,
        preprocess=dataclasses.replace(
            det.config.preprocess, identity_fast_path=False
        ),
    )
    det2 = Detector(variables=det.variables, config=cfg_off)
    out_gen = det2.detect_batch(imgs, score_thresh=-1.0)
    assert (
        "batch", 2, (size, size), size, False, None, False,
        det2.weights_version,
    ) in det2._fn_cache
    for a, b in zip(out_id, out_gen):
        np.testing.assert_allclose(a.scores, b.scores, atol=2e-3)
        # box agreement where scores are well-separated (top detections)
        np.testing.assert_allclose(a.boxes[:5], b.boxes[:5], atol=0.5)
