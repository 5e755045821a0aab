"""Accuracy pins anchored to the COMMITTED flagship artifact (VERDICT r4 #2).

The toy 96px pins in tests/test_integration.py remain as fast smoke tests;
the headline claims ("int8 AP within 0.1 of float") anchor HERE, on the
flagship-scale model trained by cli.train_flagship (default width, 320px,
crowded multi-face scenes) and committed under artifacts/. The val subset
is regenerated, not committed: data/synth.py is deterministic by design
(same seed + scene params -> bit-identical scenes and GT).

Reference parity note: the reference family pins accuracy by running WIDER
eval on its released .pth (SURVEY.md §4); this is the same idea with the
in-repo artifact + the WIDER-protocol synthetic eval (no WIDER images in
the container).
"""

import os

import numpy as np
import pytest

ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts",
    "flagship.safetensors",
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(ARTIFACT),
    reason="flagship artifact not present (artifacts/flagship.safetensors)",
)

# Scene parameters of the flagship recipe's held-out split — MUST match
# cli/train_flagship.py defaults (val seed = seed + 7777)
VAL_SEED = 7777
HW_RANGE = (384, 512)
MIN_FACE = 18.0
INPUT_SIZE = 320


@pytest.fixture(scope="module")
def flagship_det():
    from tpucenterface.config import DecodeConfig, DetectorConfig, ModelConfig
    from tpucenterface.detector import Detector
    from tpucenterface.weights.io import load_safetensors

    return Detector(
        variables=load_safetensors(ARTIFACT),
        config=DetectorConfig(
            model=ModelConfig(),
            decode=DecodeConfig(max_dets=100),
            default_size=INPUT_SIZE,
        ),
    )


@pytest.fixture(scope="module")
def val_recs(tmp_path_factory):
    from tpucenterface.data.synth import generate_dataset

    d = tmp_path_factory.mktemp("flagship_val")
    return generate_dataset(
        str(d), 24, seed=VAL_SEED, hw_range=HW_RANGE, min_face=MIN_FACE
    )


@pytest.fixture(scope="module")
def calib(val_recs, tmp_path_factory):
    import cv2

    from tpucenterface.data.synth import generate_dataset

    d = tmp_path_factory.mktemp("flagship_calib")
    recs = generate_dataset(
        str(d), 8, seed=0, hw_range=HW_RANGE, min_face=MIN_FACE
    )
    return np.stack(
        [cv2.resize(cv2.imread(r.path), (INPUT_SIZE, INPUT_SIZE)) for r in recs]
    ).astype(np.uint8)


@pytest.mark.slow
def test_flagship_float_ap(flagship_det, val_recs):
    """The committed artifact detects: held-out easy AP at flagship level.

    The full-split run (240 scenes) is recorded in
    runs/flagship3/flagship_report.json; this 24-scene pin guards the
    artifact + eval chain against silent regressions (the r5 export
    corruption would have been caught here on day one)."""
    from tpucenterface.eval.synth_eval import ap_on_records

    aps = ap_on_records(flagship_det, val_recs, size=INPUT_SIZE)
    assert aps["easy"] >= 0.60, aps
    assert aps["medium"] >= 0.55, aps


@pytest.mark.slow
def test_flagship_int8_pins(flagship_det, val_recs, calib):
    """int8 and int8_dw (the serving headline config) AP within 0.1 of
    float on the flagship model — the promise BENCH's serving_note makes."""
    from tpucenterface.eval.synth_eval import ap_on_records

    det = flagship_det
    ap_f = ap_on_records(det, val_recs, size=INPUT_SIZE)["easy"]
    try:
        det.quantize(calib_images=calib)
        ap_q = ap_on_records(det, val_recs, size=INPUT_SIZE)["easy"]
    finally:
        det.dequantize()
    assert ap_q >= ap_f - 0.1, f"int8 {ap_q} vs float {ap_f}"

    try:
        det.quantize(calib_images=calib, int8_dw=True)
        ap_dw = ap_on_records(det, val_recs, size=INPUT_SIZE)["easy"]
    finally:
        det.dequantize()
    assert ap_dw >= ap_f - 0.1, f"int8_dw {ap_dw} vs float {ap_f}"


@pytest.mark.slow
def test_flagship_qat_pin(flagship_det, val_recs, calib):
    """Label-free QAT on the flagship model: within 0.1 of float (QAT is
    never-worse than PTQ on the calibration objective by construction)."""
    from tpucenterface.eval.synth_eval import ap_on_records

    det = flagship_det
    ap_f = ap_on_records(det, val_recs, size=INPUT_SIZE)["easy"]
    try:
        det.quantize(calib_images=calib, int8_dw=True, qat_steps=10)
        ap_qat = ap_on_records(det, val_recs, size=INPUT_SIZE)["easy"]
    finally:
        det.dequantize()
    assert ap_qat >= ap_f - 0.1, f"QAT {ap_qat} vs float {ap_f}"
