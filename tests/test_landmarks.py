"""Landmark GT pipeline: synth generator -> augment -> targets -> decode
-> NME eval (the training half of C3's optional 5-point landmark head;
the inference half — decode/flip-TTA — is covered in test_decode/test_tta).

Reference parity note: the CenterFace branch of the reference family
trains a 10-channel landmark head on 5 annotated points (SURVEY.md §2 C3);
the synth generator stands in for the annotations with the renderer's
exact feature coordinates.
"""

import os

import numpy as np
import pytest

from tpucenterface.data.synth import generate_dataset, render_scene


def test_decode_landmarks_geometry():
    """Inference half (pre-dates the training pipeline): decode gathers the
    lm head at peaks and maps to input pixels."""
    import jax.numpy as jnp

    from tpucenterface.config import DecodeConfig
    from tpucenterface.decode.reference import (
        decode_feats_with_idx,
        decode_landmarks,
    )

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
    np.testing.assert_allclose(
        np.asarray(pts[0, 0, 0]), [(7 + 1.5) * 4, (5 - 0.5) * 4]
    )


def test_detector_returns_landmarks():
    import jax

    from tpucenterface.config import DetectorConfig, ModelConfig
    from tpucenterface.detector import Detector

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


def test_render_scene_landmarks_deterministic_and_rng_invariant():
    """Requesting landmarks must not perturb the scene stream, and the
    points must be the same on regeneration."""
    a_img, a_boxes, a_inv = render_scene(np.random.RandomState(11), (240, 320))
    b_img, b_boxes, b_inv, b_lms = render_scene(
        np.random.RandomState(11), (240, 320), return_landmarks=True
    )
    np.testing.assert_array_equal(a_img, b_img)
    np.testing.assert_array_equal(a_boxes, b_boxes)
    np.testing.assert_array_equal(a_inv, b_inv)
    assert b_lms.shape == (len(b_boxes), 10)
    c = render_scene(
        np.random.RandomState(11), (240, 320), return_landmarks=True
    )[3]
    np.testing.assert_array_equal(b_lms, c)


def test_render_scene_landmarks_inside_face_boxes():
    """Every landmark lies inside its face's head-ellipse bbox (faces whose
    box was clipped at the image border are skipped — the ellipse may
    extend past the canvas there) and the eyes sit above the mouth."""
    checked = 0
    for seed in range(6):
        img, boxes, inv, lms = render_scene(
            np.random.RandomState(seed), (320, 400), return_landmarks=True
        )
        h, w = img.shape[:2]
        for b, lm in zip(boxes, lms):
            x1, y1, bw, bh = b
            x2, y2 = x1 + bw, y1 + bh
            if x1 <= 0 or y1 <= 0 or x2 >= w - 1 or y2 >= h - 1:
                continue  # clipped box
            pts = lm.reshape(5, 2)
            assert (pts[:, 0] >= x1 - 0.5).all() and (pts[:, 0] <= x2 + 0.5).all()
            assert (pts[:, 1] >= y1 - 0.5).all() and (pts[:, 1] <= y2 + 0.5).all()
            # eye midpoint above mouth midpoint (rotation is capped ±28°)
            assert pts[:2, 1].mean() < pts[3:, 1].mean()
            checked += 1
    assert checked >= 10


def test_generate_dataset_landmarks_in_sidecar(tmp_path, monkeypatch):
    import tpucenterface.data.synth as synth_mod

    recs = generate_dataset(str(tmp_path), 4, seed=3, hw_range=(128, 160))
    assert all(r.landmarks is not None and r.landmarks.shape[1] == 10
               for r in recs)

    # cached path must return identical landmarks WITHOUT re-rendering
    def _boom(*a, **k):
        raise AssertionError("cache miss: render_scene called")

    monkeypatch.setattr(synth_mod, "render_scene", _boom)
    cached = generate_dataset(str(tmp_path), 4, seed=3, hw_range=(128, 160))
    for r0, r1 in zip(recs, cached):
        np.testing.assert_array_equal(r0.landmarks, r1.landmarks)
    monkeypatch.undo()

    # a pre-landmark sidecar (no "lms" key) is a cache miss: the scenes
    # re-render deterministically and the sidecar is upgraded in place
    ev_dir = os.path.join(str(tmp_path), "synth")
    meta = [f for f in os.listdir(ev_dir) if f.startswith(".meta")]
    assert len(meta) == 1
    mp = os.path.join(ev_dir, meta[0])
    old = dict(np.load(mp, allow_pickle=True))
    old.pop("lms")
    np.savez(mp, **old)
    again = generate_dataset(str(tmp_path), 4, seed=3, hw_range=(128, 160))
    for r0, r1 in zip(recs, again):
        np.testing.assert_array_equal(r0.landmarks, r1.landmarks)
        np.testing.assert_array_equal(r0.boxes, r1.boxes)


def test_random_affine_landmarks_follow_boxes():
    from tpucenterface.data.augment import random_affine

    img = np.zeros((200, 300, 3), np.uint8)
    boxes = np.array([[40.0, 50.0, 120.0, 150.0]], np.float32)
    # put two landmark points exactly on box corners: their transforms
    # must equal the transformed corners; others ride along
    lms = np.array(
        [[40.0, 50.0, 120.0, 150.0, 80.0, 100.0, 60.0, 120.0, 100.0, 120.0]],
        np.float32,
    )
    out, b, lm = random_affine(
        img, boxes, 128, np.random.RandomState(5), landmarks=lms
    )
    np.testing.assert_allclose(lm[0, 0:2], b[0, 0:2], atol=1e-4)
    np.testing.assert_allclose(lm[0, 2:4], b[0, 2:4], atol=1e-4)
    # interior point stays at the same relative position inside the box
    rel_x = (lm[0, 4] - b[0, 0]) / (b[0, 2] - b[0, 0])
    assert abs(rel_x - 0.5) < 1e-4


def test_hflip_mirrors_and_swaps_pairs():
    from tpucenterface.data.augment import hflip

    img = np.zeros((50, 100, 3), np.uint8)
    boxes = np.array([[10.0, 10.0, 40.0, 30.0]], np.float32)
    #            le        re        nose      lmouth    rmouth
    lms = np.array(
        [[15.0, 14.0, 35.0, 14.5, 25.0, 20.0, 18.0, 26.0, 32.0, 26.5]],
        np.float32,
    )
    _, _, lm = hflip(img, boxes, landmarks=lms)
    p = lm.reshape(5, 2)
    # the mirrored right eye (x=100-35=65) is now slot 0 (left eye)
    np.testing.assert_allclose(p[0], [65.0, 14.5], atol=1e-5)
    np.testing.assert_allclose(p[1], [85.0, 14.0], atol=1e-5)
    np.testing.assert_allclose(p[2], [75.0, 20.0], atol=1e-5)  # nose
    np.testing.assert_allclose(p[3], [68.0, 26.5], atol=1e-5)  # new lmouth
    np.testing.assert_allclose(p[4], [82.0, 26.0], atol=1e-5)
    # image-left ordering restored: slot 0 is left of slot 1
    assert p[0, 0] < p[1, 0] and p[3, 0] < p[4, 0]


def test_augment_train_landmark_path_rng_invariant():
    """Enabling landmarks must not change the image/box augment stream."""
    from tpucenterface.config import TrainConfig
    from tpucenterface.data.augment import augment_train

    rng_img = np.random.RandomState(0)
    img = rng_img.randint(0, 255, (160, 200, 3), np.uint8)
    boxes = np.array(
        [[20.0, 30.0, 90.0, 100.0], [120.0, 40.0, 180.0, 110.0]], np.float32
    )
    lms = np.tile(
        np.array([[30, 40, 70, 40, 50, 60, 40, 80, 65, 80]], np.float32),
        (2, 1),
    )
    cfg = TrainConfig(input_size=128, flip_prob=0.5, color_jitter=0.2)
    a_img, a_boxes = augment_train(img, boxes, cfg, np.random.RandomState(9))
    b_img, b_boxes, b_lms = augment_train(
        img, boxes, cfg, np.random.RandomState(9), landmarks=lms
    )
    np.testing.assert_array_equal(a_img, b_img)
    np.testing.assert_allclose(a_boxes, b_boxes, atol=1e-5)
    assert len(b_lms) == len(b_boxes)


def test_make_targets_landmark_encoding_and_nan_mask():
    from tpucenterface.data.targets import make_targets

    boxes = np.array([[32.0, 40.0, 80.0, 96.0]], np.float32)
    pts = np.array([[40, 50, 70, 50, 55, 66, 45, 84, 66, 84]], np.float32)
    t = make_targets(boxes, 128, stride=4, max_objs=4, landmarks=pts)
    assert t["lm_mask"][0] == 1.0 and t["lm_mask"][1] == 0.0
    cx, cy = (32 + 80) / 2 / 4, (40 + 96) / 2 / 4
    ci, cj = int(cx), int(cy)
    expect = (pts[0].reshape(5, 2) / 4 - np.array([ci, cj])).reshape(-1)
    np.testing.assert_allclose(t["lm"][0], expect, atol=1e-5)

    t2 = make_targets(
        boxes, 128, stride=4, max_objs=4,
        landmarks=np.full((1, 10), np.nan, np.float32),
    )
    assert t2["lm_mask"][0] == 0.0 and t2["mask"][0] == 1.0


def test_decode_recovers_target_encoded_landmarks():
    """Round trip: target-encoded landmark offsets, planted as a perfect lm
    head map at the GT peak cell, decode back to the original points."""
    import jax.numpy as jnp

    from tpucenterface.config import DecodeConfig
    from tpucenterface.data.targets import make_targets
    from tpucenterface.decode.reference import decode_landmarks

    boxes = np.array([[32.0, 40.0, 80.0, 96.0]], np.float32)
    pts = np.array([[40, 50, 70, 50, 55, 66, 45, 84, 66, 84]], np.float32)
    t = make_targets(boxes, 128, stride=4, max_objs=4, landmarks=pts)
    g = 128 // 4
    lm_map = np.zeros((1, g, g, 10), np.float32)
    ind = int(t["ind"][0])
    lm_map[0, ind // g, ind % g] = t["lm"][0]
    got = decode_landmarks(
        {"lm": jnp.asarray(lm_map)},
        jnp.asarray([[ind]], jnp.int32),
        DecodeConfig(),
    )
    np.testing.assert_allclose(
        np.asarray(got)[0, 0], pts[0].reshape(5, 2), atol=1e-4
    )


def test_build_sample_with_landmarks_keys(tmp_path):
    from tpucenterface.config import TrainConfig
    from tpucenterface.data.loader import build_sample

    recs = generate_dataset(str(tmp_path), 2, seed=5, hw_range=(128, 160))
    cfg = TrainConfig(input_size=96, max_objs=8, with_landmarks=True)
    s = build_sample(recs[0], cfg, np.random.RandomState(0))
    assert set(s) >= {"hm", "ind", "mask", "wh", "off", "lm", "lm_mask"}
    assert s["lm"].shape == (8, 10) and s["lm_mask"].shape == (8,)
    # at least the valid faces that survived augment carry landmark signal
    assert s["lm_mask"].sum() <= s["mask"].sum()

    # records WITHOUT landmark GT still train boxes (lm_mask all zero)
    rec_nolm = recs[1].__class__(
        recs[1].path, recs[1].rel_path, recs[1].boxes, recs[1].invalid
    )
    s2 = build_sample(rec_nolm, cfg, np.random.RandomState(0))
    assert s2["lm_mask"].sum() == 0.0 and s2["mask"].sum() >= 0.0


@pytest.mark.slow
def test_tiny_landmark_training_learns(tmp_path):
    """End-to-end: a tiny landmark-headed model on a few synth scenes —
    the lm loss must fall and decoded landmarks must land inside their
    matched GT boxes (geometry sanity, not accuracy: CPU budget)."""
    from tpucenterface.config import (
        DecodeConfig,
        DetectorConfig,
        ModelConfig,
        TrainConfig,
    )

    tiny = ModelConfig(
        inverted_residual_setting=(
            (1, 8, 1, 1),
            (4, 16, 1, 2),
            (4, 16, 1, 2),
            (4, 24, 1, 2),
            (4, 24, 1, 1),
            (4, 32, 1, 2),
            (4, 32, 1, 1),
        ),
        stem_channels=8,
        fpn_channels=16,
        head_conv=16,
        compute_dtype="float32",
        with_landmarks=True,
    )
    recs = generate_dataset(
        str(tmp_path / "data"), 24, seed=1, hw_range=(128, 160),
        max_faces=2, min_face=40.0,
    )
    tcfg = TrainConfig(
        input_size=96, batch_size=8, lr=2e-3, max_objs=4,
        scale_range=(0.9, 1.1), shift_ratio=0.05, color_jitter=0.1,
        with_landmarks=True,
    )
    from tpucenterface.train.loop import train

    lm_losses = []

    def log_fn(step, metrics):
        if "lm_loss" in metrics:
            lm_losses.append(float(metrics["lm_loss"]))

    train(
        recs, model_cfg=tiny, train_cfg=tcfg,
        workdir=str(tmp_path / "run"), max_steps=150, ckpt_every=0,
        log_every=25, log_fn=log_fn, seed=0,
    )
    assert lm_losses, "lm_loss never reported — landmark path not training"
    assert lm_losses[-1] < lm_losses[0], (
        f"lm loss did not fall: {lm_losses[0]:.4f} -> {lm_losses[-1]:.4f}"
    )

    from tpucenterface.detector import Detector
    from tpucenterface.eval.synth_eval import landmark_nme
    from tpucenterface.weights.io import load_safetensors

    det = Detector(
        variables=load_safetensors(str(tmp_path / "run/model.safetensors")),
        config=DetectorConfig(
            model=tiny, decode=DecodeConfig(max_dets=20), default_size=96
        ),
    )
    r = landmark_nme(det, recs, size=96, score_thresh=0.05, min_side=0.0)
    assert r["faces"] > 0
    if r["match_rate"] > 0:
        # 150 CPU steps: demand coherence (error below ~half the box
        # diagonal), not convergence
        assert r["nme"] < 0.6, r

    # same metric through the production TTA path (flip merge un-mirrors
    # and pair-swaps landmarks device-side) — eligible-face count must
    # match the single-scale pass; coherence bound as above
    r_tta = landmark_nme(
        det, recs, score_thresh=0.05, tta=True, scales=(0.75,), batch=8
    )
    assert r_tta["faces"] == r["faces"]
    if r_tta["match_rate"] > 0:
        assert r_tta["nme"] < 0.6, r_tta


def test_parse_retinaface_gt(tmp_path):
    """RetinaFace label.txt (the CenterFace family's landmark GT source):
    landmark triplets parsed with flags dropped, -1 rows -> NaN, box-only
    lines -> NaN, box-only images -> landmarks carried as NaN rows, and a
    landmark-free file -> landmarks None."""
    from tpucenterface.data.wider import parse_retinaface_gt

    label = tmp_path / "label.txt"
    label.write_text(
        "# 0--Parade/0_Parade_1.jpg\n"
        "449 330 122 149 488.9 373.6 0.0 542.0 376.4 0.0 515.0 412.8 0.0 "
        "485.3 423.0 0.0 538.3 431.4 0.0 0.82\n"
        "10 20 30 40 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1\n"
        "5 5 0 0 1 1 1 1 1 1 1 1 1 1 1 1 1 1 1 1\n"  # degenerate box dropped
        "# 1--Handshaking/1_Handshaking_2.jpg\n"
        "1 2 3 4\n"
    )
    recs = parse_retinaface_gt(str(label), str(tmp_path))
    assert [r.rel_path for r in recs] == [
        "0--Parade/0_Parade_1.jpg", "1--Handshaking/1_Handshaking_2.jpg",
    ]
    r0 = recs[0]
    assert r0.boxes.shape == (2, 4) and not r0.invalid.any()
    np.testing.assert_allclose(r0.boxes[0], [449, 330, 122, 149])
    np.testing.assert_allclose(
        r0.landmarks[0],
        [488.9, 373.6, 542.0, 376.4, 515.0, 412.8, 485.3, 423.0, 538.3, 431.4],
        rtol=1e-6,
    )
    assert np.isnan(r0.landmarks[1]).all()  # -1 marker row
    r1 = recs[1]
    assert r1.boxes.shape == (1, 4) and r1.landmarks is None

    # box-only file everywhere -> every record landmark-free
    label2 = tmp_path / "val_label.txt"
    label2.write_text("# a/b.jpg\n1 2 30 40\n")
    (r2,) = parse_retinaface_gt(str(label2), str(tmp_path))
    assert r2.landmarks is None and r2.boxes.shape == (1, 4)
