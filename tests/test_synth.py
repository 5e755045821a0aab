"""Tests for the procedural multi-face dataset (data/synth.py) and the
synthetic flagship eval (eval/synth_eval.py).

The dataset is the in-container stand-in for WIDER FACE training data
(SURVEY.md §2 C7; the mount is empty), so its contracts — determinism,
valid WIDER-layout boxes, crowd/scale/occlusion coverage — are what the
flagship accuracy pins stand on.
"""

import json
import os

import numpy as np
import pytest

from tpucenterface.data.synth import generate_dataset, render_scene


def test_render_scene_deterministic():
    a = render_scene(np.random.RandomState(7), (240, 320))
    b = render_scene(np.random.RandomState(7), (240, 320))
    assert np.array_equal(a[0], b[0])
    assert np.array_equal(a[1], b[1])
    assert np.array_equal(a[2], b[2])


def test_render_scene_boxes_valid():
    for seed in range(8):
        img, boxes, invalid = render_scene(
            np.random.RandomState(seed), (200, 280)
        )
        assert img.shape == (200, 280, 3) and img.dtype == np.uint8
        assert boxes.ndim == 2 and boxes.shape[1] == 4
        assert invalid.shape == (len(boxes),)
        # WIDER layout x,y,w,h with positive sizes inside the frame
        assert (boxes[:, 2] > 0).all() and (boxes[:, 3] > 0).all()
        assert (boxes[:, 0] >= 0).all() and (boxes[:, 1] >= 0).all()
        assert (boxes[:, 0] + boxes[:, 2] <= 280).all()
        assert (boxes[:, 1] + boxes[:, 3] <= 200).all()


def test_dataset_coverage_and_determinism(tmp_path):
    recs = generate_dataset(str(tmp_path / "a"), 24, seed=3)
    assert len(recs) == 24
    counts = [len(r.boxes) for r in recs]
    sides = np.concatenate([r.boxes[:, 2:4].min(axis=1) for r in recs])
    # multi-face crowding and scale spread actually materialize
    assert max(counts) >= 4, counts
    assert sides.min() < 30 and sides.max() > 120, (sides.min(), sides.max())
    # some occlusion-invalid faces appear across 24 scenes
    assert any(r.invalid.any() for r in recs)
    # same seed elsewhere -> identical annotations and identical pixels
    recs2 = generate_dataset(str(tmp_path / "b"), 24, seed=3)
    for r, s in zip(recs, recs2):
        assert np.array_equal(r.boxes, s.boxes)
        assert np.array_equal(r.invalid, s.invalid)
    import cv2

    assert np.array_equal(cv2.imread(recs[0].path), cv2.imread(recs2[0].path))


def test_dataset_reuses_existing_files(tmp_path):
    recs = generate_dataset(str(tmp_path), 3, seed=1)
    mtimes = [os.path.getmtime(r.path) for r in recs]
    recs2 = generate_dataset(str(tmp_path), 3, seed=1)
    assert [os.path.getmtime(r.path) for r in recs2] == mtimes


def test_ap_on_records_oracle_and_blind(tmp_path):
    """An oracle that returns the GT scores AP ~1 on every split; a blind
    detector (no detections) scores 0 — pinning the split/ignore wiring
    without needing a trained model."""
    from tpucenterface.eval.synth_eval import ap_on_records

    recs = generate_dataset(str(tmp_path), 6, seed=11)

    class _Det:
        def __init__(self, oracle):
            self.oracle = oracle
            self.queue = []

        class config:
            default_size = 320

        def detect_batch(self, images, hws=None, score_thresh=0.0, size=None):
            out = []
            for j in range(images.shape[0]):
                rec = self.queue[j] if j < len(self.queue) else None
                if self.oracle and rec is not None:
                    b = rec.xyxy.astype(np.float32)
                    s = np.full(len(b), 0.9, np.float32)
                else:
                    b = np.zeros((0, 4), np.float32)
                    s = np.zeros((0,), np.float32)
                out.append(type("D", (), {"boxes": b, "scores": s})())
            return out

    det = _Det(oracle=True)
    det.queue = list(recs)  # batch==len(recs) so one call covers all
    aps = ap_on_records(det, recs, size=320, batch=len(recs))
    assert set(aps) == {"easy", "medium", "hard"}
    for k, v in aps.items():
        assert v > 0.95, (k, v, aps)

    blind = _Det(oracle=False)
    blind.queue = list(recs)
    aps0 = ap_on_records(blind, recs, size=320, batch=len(recs))
    assert all(v == 0.0 for v in aps0.values()), aps0


def test_score_detections_oracle(tmp_path):
    """GT boxes fed back as detections score AP ~1 on every split (pins the
    shared scoring tail ap_on_records and ap_on_records_tta both use)."""
    from tpucenterface.eval.synth_eval import score_detections

    recs = generate_dataset(str(tmp_path), 5, seed=4)
    dets = []
    for r in recs:
        b = r.xyxy.astype(np.float64)
        dets.append(np.concatenate([b, np.full((len(b), 1), 0.9)], axis=1))
    aps = score_detections(dets, recs)
    assert set(aps) == {"easy", "medium", "hard"}
    for k, v in aps.items():
        assert v > 0.95, (k, v)


def test_ap_on_records_tta_runs(tmp_path):
    """ap_on_records_tta drives the production TTA path end-to-end on a
    random-weight detector over tiny scenes: full split set, finite values
    (accuracy VALUE on the flagship model is measured in PERFORMANCE.md)."""
    import jax

    from tpucenterface.config import DetectorConfig, ModelConfig
    from tpucenterface.detector import Detector
    from tpucenterface.eval.synth_eval import ap_on_records_tta

    recs = generate_dataset(str(tmp_path), 3, seed=2, hw_range=(64, 96))
    det = Detector(
        config=DetectorConfig(
            model=ModelConfig(compute_dtype="float32"),
            buckets=(64, 96),
            default_size=64,
        ),
        rng=jax.random.PRNGKey(0),
    )
    aps = ap_on_records_tta(det, recs, scales=(1.0,), flip=True, batch=4)
    assert set(aps) == {"easy", "medium", "hard"}
    for v in aps.values():
        assert 0.0 <= v <= 1.0


@pytest.mark.slow
def test_train_flagship_cli_tiny(tmp_path, capsys):
    """End-to-end recipe smoke at toy scale: stage-split resume + live/EMA
    eval + report file. Real-scale numbers live in PERFORMANCE.md."""
    from tpucenterface.cli.train_flagship import main

    rc = main([
        "--workdir", str(tmp_path / "run"),
        "--train-images", "16", "--val-images", "4",
        "--input-size", "96", "--batch-size", "8", "--steps", "4",
        "--workers", "0", "--resume-split", "0.5",
    ])
    assert rc == 0
    report = json.load(open(tmp_path / "run" / "flagship_report.json"))
    assert set(report["ap"]) == {"model", "model_ema"}
    for aps in report["ap"].values():
        assert set(aps) == {"easy", "medium", "hard"}


def test_generate_dataset_meta_sidecar(tmp_path, monkeypatch):
    """Second call with the same (seed, n) skips rendering via the GT
    sidecar and returns identical records."""
    import tpucenterface.data.synth as synth_mod

    d = str(tmp_path / "ds")
    r1 = generate_dataset(d, 6, seed=11, hw_range=(96, 128))

    # structural cache check: the cached path must never call render_scene
    def _boom(*a, **kw):
        raise AssertionError("cached path re-rendered a scene")

    monkeypatch.setattr(synth_mod, "render_scene", _boom)
    r2 = generate_dataset(d, 6, seed=11, hw_range=(96, 128))
    assert len(r1) == len(r2) == 6
    for a, b in zip(r1, r2):
        assert a.rel_path == b.rel_path
        np.testing.assert_array_equal(a.boxes, b.boxes)
        np.testing.assert_array_equal(a.invalid, b.invalid)
        assert b.boxes.dtype == a.boxes.dtype


def test_generate_dataset_param_change_rerenders(tmp_path):
    """Changing scene parameters over a pre-existing data dir must NOT pair
    new-parameter boxes with old-parameter pixels (ADVICE r4 high): the
    parameter key is part of every filename, so a re-run with different
    hw_range/min_face renders fresh jpgs whose pixels match their boxes."""
    import cv2

    d = str(tmp_path / "ds")
    r1 = generate_dataset(d, 4, seed=5, hw_range=(96, 128), min_face=14.0)
    r2 = generate_dataset(d, 4, seed=5, hw_range=(160, 200), min_face=18.0)
    for a, b in zip(r1, r2):
        # distinct files: the old jpgs are untouched, the new ones are new
        assert a.rel_path != b.rel_path
        assert os.path.exists(a.path) and os.path.exists(b.path)
    # image dims actually reflect the new parameters (pixels are fresh)
    for b in r2:
        h, w = cv2.imread(b.path).shape[:2]
        assert 160 <= h <= 200 and 160 <= w <= 200, (h, w)
    # and the original parameterization still round-trips from its sidecar
    r1b = generate_dataset(d, 4, seed=5, hw_range=(96, 128), min_face=14.0)
    for a, c in zip(r1, r1b):
        assert a.rel_path == c.rel_path
        np.testing.assert_array_equal(a.boxes, c.boxes)
