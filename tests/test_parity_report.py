"""Tests for the one-command parity runbook (cli/parity_report.py).

Exercised with the torch twin standing in for the (absent) reference
checkpoint and the synthetic .mat fixtures standing in for WIDER GT —
the exact artifacts the command will receive on the day the mount appears.
"""

import json

import numpy as np
import pytest
import torch

from tpucenterface.config import ModelConfig
from tpucenterface.weights.torch_twin import TorchCenterFace

from tests.test_wider_eval import _fake_image_dataset, _write_synthetic_mat_gt

CFG = ModelConfig(compute_dtype="float32")


def _twin_pth(tmp_path, seed=0):
    torch.manual_seed(seed)
    twin = TorchCenterFace(CFG).eval()
    with torch.no_grad():
        for m in twin.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
        # give the (untrained) wh head real box sizes so the boxes-stage
        # IoU matching operates on non-degenerate boxes
        twin.heads.wh.out.bias.fill_(2.0)
    path = str(tmp_path / "ref.pth")
    torch.save(twin.state_dict(), path)
    return path


def test_parity_report_twin_contract_passes(tmp_path, capsys):
    from tpucenterface.cli.parity_report import main

    pth = _twin_pth(tmp_path)
    out = str(tmp_path / "report.json")
    rc = main(["--pth", pth, "--size", "128", "--out", out])
    assert rc == 0
    report = json.load(open(out))
    assert report["pass"]
    assert report["port"]["mode"] == "twin-contract"
    layers = report["layers"]
    assert layers["pass"] and layers["n_layers_compared"] >= 20
    assert layers["worst_abs_diff"] <= layers["atol"]
    # stem through heads all present, in network order
    names = [r["layer"] for r in layers["layers"]]
    assert names[0].startswith("backbone.stem")
    assert any(n.startswith("neck.") for n in names)
    assert any(n.startswith("heads.") for n in names)
    boxes = report["boxes"]
    assert boxes["pass"] and boxes["worst_match_frac"] >= 0.9
    assert "ap" not in report  # no WIDER paths given


def test_parity_report_foreign_auto_map(tmp_path):
    from tpucenterface.cli.parity_report import main

    pth = _twin_pth(tmp_path, seed=3)
    sd = torch.load(pth, weights_only=False)
    foreign = {}
    for i, (k, v) in enumerate(sd.items()):
        foreign[f"net.{i // 4}.{i % 4}.{k.rsplit('.', 1)[-1]}"] = v
    fpth = str(tmp_path / "foreign.pth")
    torch.save(foreign, fpth)

    # order-ambiguous (MobileNet repeats identical block signatures):
    # without --allow-ambiguous the command must refuse
    with pytest.raises(SystemExit, match="ambiguous"):
        main(["--pth", fpth, "--auto-map", "--size", "128"])

    out = str(tmp_path / "report.json")
    rc = main([
        "--pth", fpth, "--auto-map", "--allow-ambiguous",
        "--size", "128", "--out", out,
    ])
    assert rc == 0
    report = json.load(open(out))
    assert report["port"]["mode"] == "auto-map"
    assert report["port"]["ambiguous"]  # reported, deliberately accepted
    assert report["pass"]


def test_parity_report_with_wider_ap(tmp_path):
    """Full runbook incl. the AP stage via the synthetic .mat GT + fake
    image dataset (AP ~0 on an untrained model; the TABLE is the contract)."""
    from tpucenterface.cli.parity_report import main

    pth = _twin_pth(tmp_path, seed=7)
    gt_dir = tmp_path / "gt"
    img_root = tmp_path / "imgs"
    gt_dir.mkdir()
    img_root.mkdir()
    _write_synthetic_mat_gt(str(gt_dir))
    _fake_image_dataset(str(img_root))
    out = str(tmp_path / "report.json")
    rc = main([
        "--pth", pth, "--size", "128",
        "--gt-dir", str(gt_dir), "--images-root", str(img_root),
        "--out", out,
    ])
    report = json.load(open(out))
    assert set(report["ap"]) == {"easy", "medium", "hard"}
    assert rc == 0, report


def test_parity_report_detects_corrupted_weights(tmp_path):
    """A checkpoint whose weights DON'T match the twin (perturbed conv)
    must fail the layer gate — the report is a real detector, not a
    formality."""
    from tpucenterface.cli.parity_report import main

    pth = _twin_pth(tmp_path, seed=9)
    sd = torch.load(pth, weights_only=False)
    # corrupt one mid-network conv after porting will diverge layers
    k = "backbone.block_3.project.conv.weight"
    sd_bad = dict(sd)
    sd_bad[k] = sd[k] + 0.05
    bad = str(tmp_path / "bad.pth")
    torch.save(sd_bad, bad)
    # port the GOOD one but hand the layer stage the BAD twin by running
    # the command on the corrupted ckpt with a tightened gate relative to
    # its own port: both sides load the same (corrupted) weights, so this
    # still passes. The real corruption scenario: flax gets A, torch gets
    # B. Simulate by comparing the corrupted ckpt against a report from
    # the clean one and asserting the diff detector itself works via a
    # direct call.
    import numpy as np  # noqa: F811

    from tpucenterface.cli.parity_report import _layer_stage
    from tpucenterface.weights.port import flax_from_torch_state

    variables_good = flax_from_torch_state(sd, CFG)
    report, _ = _layer_stage(CFG, sd_bad, variables_good, 128, 2e-3)
    assert not report["pass"]
    assert report["worst_abs_diff"] > 2e-3
