"""CLI surface tests: demo pipeline, torch .pth port, bench-suite pieces."""

import json
import sys

import numpy as np
import pytest
import torch

from tpucenterface.config import DetectorConfig, ModelConfig


def test_port_weights_cli_roundtrip(tmp_path):
    from tpucenterface.cli.port_weights import main as port_main
    from tpucenterface.detector import Detector
    from tpucenterface.weights.torch_twin import TorchCenterFace

    cfg = ModelConfig(compute_dtype="float32")
    torch.manual_seed(3)
    twin = TorchCenterFace(cfg).eval()
    pth = str(tmp_path / "twin.pth")
    torch.save({"state_dict": twin.state_dict()}, pth)

    out = str(tmp_path / "w.safetensors")
    port_main(["--pth", pth, "--out", out])

    det = Detector.from_safetensors(
        out, config=DetectorConfig(model=cfg, default_size=64)
    )
    img = np.random.RandomState(0).randint(0, 255, (64, 64, 3), np.uint8)
    boxes, scores = det.detect(img, score_thresh=0.0)[:2]
    assert len(boxes) and np.isfinite(scores).all()

    # ported detector must match the torch twin's heatmap on the same input
    from tpucenterface.preprocess import letterbox_normalize
    import jax.numpy as jnp

    x, _, _ = letterbox_normalize(
        jnp.asarray(img), jnp.asarray([64, 64], np.int32), 64,
        det.config.preprocess,
    )
    with torch.no_grad():
        t_hm = twin(torch.from_numpy(
            np.asarray(x, np.float32).transpose(2, 0, 1)[None]
        ))["hm"].numpy()[0, 0]
    feats = det.model.apply(det.variables, x[None].astype(np.float32), train=False)
    j_hm = np.asarray(feats["hm"])[0, ..., 0]
    np.testing.assert_allclose(j_hm, t_hm, atol=5e-3)


def test_demo_cli_synthetic(tmp_path, monkeypatch, capsys):
    from tpucenterface.cli import demo

    # tiny synthetic stream
    rng = np.random.RandomState(0)

    def frames(_source):
        for _ in range(4):
            yield rng.randint(0, 255, (96, 128, 3), np.uint8)

    monkeypatch.setattr(demo, "_frames", frames)
    demo.main(["--source", "synthetic", "--size", "64", "--max-frames", "4"])
    out = capsys.readouterr().out
    assert "4 frames" in out


def test_profiling_helpers():
    from tpucenterface.runtime.profiling import StepTimer, annotate

    t = StepTimer()
    t.tic()
    with annotate("unit"):
        pass
    assert t.toc() >= 0.0
    assert t.fps >= 0.0


def test_serve_cli_synthetic(tmp_path, capsys):
    import json as _json

    from tpucenterface.cli.serve import main

    out = tmp_path / "dets.jsonl"
    main([
        "--source", "synthetic", "--n-synthetic", "6",
        "--device-batch", "4", "--size", "64", "--thresh", "-1",
        "--out", str(out),
    ])
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    summary = _json.loads(lines[-1])
    assert summary["images"] == 6 and summary["faces"] > 0
    dets = [_json.loads(l) for l in out.read_text().splitlines()]
    assert len(dets) == 6 and all(len(d["boxes"]) == len(d["scores"]) for d in dets)


def test_serve_cli_scale_persistence_roundtrip(tmp_path, capsys):
    """serve --int8 --save-scales then --int8 --scales: identical output
    detections, no recalibration in the second run."""
    from tpucenterface.cli.serve import main as serve_main

    out1 = str(tmp_path / "a.jsonl")
    out2 = str(tmp_path / "b.jsonl")
    scales = str(tmp_path / "scales.json")
    common = [
        "--source", "synthetic", "--n-synthetic", "8", "--device-batch", "4",
        "--size", "64", "--thresh", "-1.0", "--int8", "--int8-dw",
    ]
    serve_main(common + ["--save-scales", scales, "--out", out1])
    serve_main(common + ["--scales", scales, "--out", out2])
    a = [json.loads(l) for l in open(out1)]
    b = [json.loads(l) for l in open(out2)]
    assert len(a) == len(b) == 8
    for ra, rb in zip(a, b):
        assert ra["scores"] == rb["scores"]
        assert ra["boxes"] == rb["boxes"]


def test_serve_cli_int8_input_bit_identical(tmp_path):
    """--int8-input (host LUT staging) detections == the plain --int8 run
    (synthetic frames are exactly model-size, so the identity/int8-in
    program serves every launch); and the flag demands --int8."""
    import pytest

    from tpucenterface.cli.serve import main as serve_main

    out1 = str(tmp_path / "u8.jsonl")
    out2 = str(tmp_path / "i8.jsonl")
    common = [
        "--source", "synthetic", "--n-synthetic", "6", "--device-batch", "4",
        "--size", "64", "--thresh", "-1.0", "--int8", "--int8-dw",
    ]
    serve_main(common + ["--out", out1])
    serve_main(common + ["--int8-input", "--out", out2])
    a = [json.loads(l) for l in open(out1)]
    b = [json.loads(l) for l in open(out2)]
    assert len(a) == len(b) == 6
    for ra, rb in zip(a, b):
        assert ra["scores"] == rb["scores"]
        assert ra["boxes"] == rb["boxes"]
    with pytest.raises(SystemExit):
        serve_main(["--source", "synthetic", "--int8-input"])


def test_serve_cli_qat_roundtrip(tmp_path, capsys):
    """serve --int8 --qat-steps persists scales + fine-tuned params; a
    second run installing --scales + --qat-params reproduces the QAT run's
    detections exactly (no recalibration, no re-fine-tune)."""
    import pytest

    from tpucenterface.cli.serve import main as serve_main

    out1 = str(tmp_path / "qat.jsonl")
    out2 = str(tmp_path / "restored.jsonl")
    scales = str(tmp_path / "scales.json")
    qparams = str(tmp_path / "qat.safetensors")
    common = [
        "--source", "synthetic", "--n-synthetic", "6", "--device-batch", "4",
        "--size", "64", "--thresh", "-1.0", "--int8", "--int8-dw",
    ]
    serve_main(common + ["--qat-steps", "5", "--save-scales", scales,
                         "--save-qat-params", qparams, "--out", out1])
    text = capsys.readouterr().out
    assert "QAT fine-tune" in text and "loss_first" in text
    serve_main(common + ["--scales", scales, "--qat-params", qparams,
                         "--out", out2])
    a = [json.loads(l) for l in open(out1)]
    b = [json.loads(l) for l in open(out2)]
    assert len(a) == len(b) == 6
    for ra, rb in zip(a, b):
        assert ra["scores"] == rb["scores"]
        assert ra["boxes"] == rb["boxes"]
    # guards: QAT needs calibration; --qat-params needs --scales
    with pytest.raises(SystemExit):
        serve_main(common + ["--scales", scales, "--qat-steps", "5"])
    with pytest.raises(SystemExit):
        serve_main(common + ["--qat-params", qparams])


def test_port_weights_cli_report(tmp_path, capsys):
    """--report prints the auto-map analysis without writing output."""
    from tpucenterface.cli.port_weights import main as port_main
    from tpucenterface.weights.torch_twin import TorchCenterFace

    cfg = ModelConfig()
    torch.manual_seed(0)
    twin = TorchCenterFace(cfg)
    pth = str(tmp_path / "w.pth")
    torch.save(twin.state_dict(), pth)
    out = str(tmp_path / "w.safetensors")
    port_main(["--pth", pth, "--out", out, "--report"])
    rep = json.loads(capsys.readouterr().out)
    assert rep["n_mapped"] > 0
    assert not rep["unmatched_twin"]
    # the default config repeats block shapes -> ambiguity must be REPORTED
    assert rep["ambiguous"] and not rep["complete"]
    import os

    assert not os.path.exists(out)  # report mode writes nothing


def test_eval_wider_cli_on_synthetic_mat(tmp_path, capsys):
    """End-to-end eval CLI over the synthetic .mat fixtures: both the
    batched (default) and --per-image --tta routes print 3 APs."""
    import os

    from tests.test_wider_eval import (
        _fake_image_dataset,
        _write_synthetic_mat_gt,
    )
    from tpucenterface.cli.eval_wider import main as eval_main

    gt_dir, img_root = str(tmp_path / "gt"), str(tmp_path / "imgs")
    os.makedirs(gt_dir)
    _write_synthetic_mat_gt(gt_dir)
    _fake_image_dataset(img_root)
    dets_dir = str(tmp_path / "dets")

    eval_main([
        "--gt-dir", gt_dir, "--images-root", img_root,
        "--out-dets", dets_dir, "--batch-size", "4",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out) == {"AP_easy", "AP_medium", "AP_hard"}
    assert all(0.0 <= v <= 1.0 for v in out.values())
    # WIDER-format detection txts were dumped per image
    assert os.path.isfile(os.path.join(dets_dir, "ev_a", "img1.txt"))

    eval_main([
        "--gt-dir", gt_dir, "--images-root", img_root,
        "--per-image", "--tta", "--scales", "1.0",
    ])
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out2) == {"AP_easy", "AP_medium", "AP_hard"}


def test_eval_wider_cli_int8(tmp_path, capsys):
    """--int8 evaluates the W8A8 serving forward's AP (calibrating on real
    eval images) — the real-data check behind the serving int8 AP pin."""
    import os

    from tests.test_wider_eval import (
        _fake_image_dataset,
        _write_synthetic_mat_gt,
    )
    from tpucenterface.cli.eval_wider import main as eval_main

    gt_dir, img_root = str(tmp_path / "gt"), str(tmp_path / "imgs")
    os.makedirs(gt_dir)
    _write_synthetic_mat_gt(gt_dir)
    _fake_image_dataset(img_root)

    eval_main([
        "--gt-dir", gt_dir, "--images-root", img_root,
        "--int8", "--int8-dw", "--batch-size", "4", "--size", "64",
    ])
    lines = capsys.readouterr().out.strip().splitlines()
    assert any("calibrated on" in l for l in lines)
    out = json.loads(lines[-1])
    assert set(out) == {"AP_easy", "AP_medium", "AP_hard"}
    assert all(0.0 <= v <= 1.0 for v in out.values())


def test_serve_cli_packed_roundtrip(tmp_path):
    """serve --int8 --save-packed then --packed: the artifact reinstalls
    the whole quantized serving state (bits/int8_dw/scales) with no other
    flags; detections match to float dust (bit-exactness for frozen-scale
    artifacts is pinned in tests/test_w4.py)."""
    import pytest

    from tpucenterface.cli.serve import main as serve_main

    out1 = str(tmp_path / "q.jsonl")
    out2 = str(tmp_path / "p.jsonl")
    packed = str(tmp_path / "m.npz")
    common = [
        "--source", "synthetic", "--n-synthetic", "6", "--device-batch", "4",
        "--size", "64", "--thresh", "-1.0",
    ]
    serve_main(common + ["--int8", "--int8-dw", "--save-packed", packed,
                         "--out", out1])
    serve_main(common + ["--packed", packed, "--out", out2])
    a = [json.loads(l) for l in open(out1)]
    b = [json.loads(l) for l in open(out2)]
    assert len(a) == len(b) == 6
    for ra, rb in zip(a, b):
        np.testing.assert_allclose(ra["scores"], rb["scores"], atol=1e-6)
        np.testing.assert_allclose(ra["boxes"], rb["boxes"], atol=1e-3)
    with pytest.raises(SystemExit):
        serve_main(common + ["--packed", packed, "--scales", "x.json"])


def test_serve_cli_save_packed_requires_int8():
    import pytest

    from tpucenterface.cli.serve import main as serve_main

    with pytest.raises(SystemExit):
        serve_main(["--source", "synthetic", "--n-synthetic", "2",
                    "--size", "64", "--save-packed", "/tmp/x.npz"])


def test_train_cli_retinaface_landmarks(tmp_path, monkeypatch):
    """--gt-format retinaface + --landmarks: records parsed from label.txt
    with landmark GT, and both configs carry the landmark switches."""
    import cv2

    images = tmp_path / "WIDER_train" / "images" / "0--Parade"
    images.mkdir(parents=True)
    cv2.imwrite(
        str(images / "a.jpg"), np.zeros((80, 120, 3), np.uint8)
    )
    (tmp_path / "WIDER_train" / "label.txt").write_text(
        "# 0--Parade/a.jpg\n"
        "10 10 40 50 20 25 0.0 40 25 0.0 30 35 0.0 22 45 0.0 38 45 0.0 0.9\n"
    )

    import tpucenterface.train.loop as loop_mod

    captured = {}

    def fake_train(records, **kw):
        captured["records"] = records
        captured.update(kw)

    monkeypatch.setattr(loop_mod, "train", fake_train)
    from tpucenterface.cli.train import main

    main([
        "--wider-root", str(tmp_path), "--gt-format", "retinaface",
        "--landmarks", "--freeze-bn", "7", "--workdir",
        str(tmp_path / "run"), "--max-steps", "1",
    ])
    recs = captured["records"]
    assert len(recs) == 1 and recs[0].landmarks.shape == (1, 10)
    assert captured["train_cfg"].with_landmarks
    assert captured["train_cfg"].freeze_bn_steps == 7
    assert captured["model_cfg"].with_landmarks
