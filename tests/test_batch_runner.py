"""Bucketed batched inference == per-image detect (eval/batch_runner)."""

import jax
import numpy as np

from tpucenterface.config import DetectorConfig, ModelConfig
from tpucenterface.detector import Detector
from tpucenterface.eval.batch_runner import batched_detect



import jax.numpy as jnp


def _det():
    return Detector(
        config=DetectorConfig(
            model=ModelConfig(compute_dtype="float32"),
            buckets=(32, 64),
            default_size=64,
        ),
        rng=jax.random.PRNGKey(0),
    )


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
    for img, (b_boxes, b_scores, _) in zip(images, batched):
        s_boxes, s_scores = det.detect(img, score_thresh=0.1, size=64)[:2]
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
    assert len(out) == 3
    for o in out:
        assert o.boxes.shape[1] == 4 and o.landmarks is None


def test_batch_flip_fn_matches_host_flip():
    """The device-side mirrored half of _batch_flip_fn must equal host-side
    flip_detect (mirror image -> detect -> un-mirror boxes)."""
    from tpucenterface.eval.tta import flip_detect

    det = _det()
    img = np.random.RandomState(3).randint(0, 255, (64, 64, 3), np.uint8)
    fn = det._batch_flip_fn(1, (64, 64), 64)
    out_b, out_s = fn(
        jnp.asarray(img[None]), jnp.asarray(np.array([[64, 64]], np.int32))
    )
    k = np.asarray(out_b).shape[1] // 2
    mir_boxes = np.asarray(out_b)[0, k:]
    mir_scores = np.asarray(out_s)[0, k:]
    hb, hs = flip_detect(det, img, score_thresh=-1.0, size=64)[:2]
    np.testing.assert_allclose(mir_scores, hs, atol=1e-4)
    np.testing.assert_allclose(mir_boxes, hb, atol=0.51)  # bf16-free cpu: tight
    # and the first half equals plain detect
    pb, ps = det.detect(img, score_thresh=-1.0, size=64)[:2]
    np.testing.assert_allclose(np.asarray(out_s)[0, :k], ps, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_b)[0, :k], pb, atol=1e-3)


def test_batched_detect_tta_matches_per_image():
    """Batched flip+multi-scale TTA must reproduce per-image detect_tta."""
    from tpucenterface.eval.batch_runner import batched_detect_tta
    from tpucenterface.eval.tta import detect_tta

    det = _det()
    rng = np.random.RandomState(4)
    imgs = [
        rng.randint(0, 255, (48, 64, 3), np.uint8),
        rng.randint(0, 255, (64, 48, 3), np.uint8),
        rng.randint(0, 255, (32, 32, 3), np.uint8),
    ]
    batched = batched_detect_tta(
        det, imgs, scales=(0.5, 1.0), flip=True, score_thresh=0.1,
        nms_thresh=0.4, batch_size=4,
    )
    for img, (bb, bs, _) in zip(imgs, batched):
        pb, ps = detect_tta(
            det, img, scales=(0.5, 1.0), flip=True, score_thresh=0.1,
            nms_thresh=0.4,
        )[:2]
        assert len(bs) == len(ps), (len(bs), len(ps))
        np.testing.assert_allclose(bs, ps, atol=1e-3)
        np.testing.assert_allclose(bb, pb, atol=0.6)


def test_evaluate_wider_batched_equals_per_image(tmp_path, monkeypatch):
    """evaluate_wider(batch_det_fn=...) must score identically to the
    per-image det_fn path (GT loading monkeypatched with a synthetic set)."""
    import cv2

    import tpucenterface.eval.wider_eval as we
    from tpucenterface.eval.batch_runner import batched_detect

    rng = np.random.RandomState(5)
    root = tmp_path / "images"
    (root / "0--ev").mkdir(parents=True)
    files, boxes, keeps = [], [], []
    for i in range(4):
        img = rng.randint(0, 255, (64, 80, 3), np.uint8)
        img[10:30, 20:50] = 255
        cv2.imwrite(str(root / "0--ev" / f"im{i}.jpg"), img)
        files.append(f"im{i}")
        boxes.append(np.array([[20.0, 10.0, 50.0, 30.0]]))
        keeps.append(np.array([True]))

    gt = {"easy": {"events": ["0--ev"], "files": [files],
                   "boxes": [boxes], "keep": [keeps]}}
    monkeypatch.setattr(we, "load_wider_gt", lambda d: gt)

    det = _det()
    aps_per = we.evaluate_wider(
        lambda img: det.detect(img, score_thresh=0.0, size=64)[:2],
        "unused", str(root), subsets=("easy",),
    )
    aps_bat = we.evaluate_wider(
        None, "unused", str(root), subsets=("easy",),
        batch_det_fn=lambda imgs: batched_detect(
            det, imgs, score_thresh=0.0, size=64, batch_size=2
        ),
        batch_chunk=3,
    )
    assert abs(aps_per["easy"] - aps_bat["easy"]) < 1e-6


def test_batched_tta_launch_log():
    """launch_log records one (batch, shape, size, flip) tuple per program
    launch, enabling the suite's device-side replay (config #3)."""
    import numpy as np

    from tpucenterface.eval.batch_runner import batched_detect_tta

    det = _det()
    rng = np.random.RandomState(4)
    imgs = [rng.randint(0, 255, (40, 60, 3), np.uint8) for _ in range(3)]
    log = []
    batched_detect_tta(
        det, imgs, scales=(1.0,), flip=True, batch_size=4,
        launch_log=log,
    )
    assert log, "no launches recorded"
    for b, shape, size, flip in log:
        assert b == 4 and isinstance(shape, tuple) and flip is True
        assert size in det.config.buckets
