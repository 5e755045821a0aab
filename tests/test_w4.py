"""W4A8 weight-bits tests (quant engine weight_bits=4).

Contract under test: (1) sub-8-bit weight grids run the same A8 serving
forward (values on the coarser grid inside int8 arrays), (2) the persisted
scales dict is self-describing ("cfg:weight_bits") — reinstall reproduces
the width automatically and a mismatched engine refuses, (3) AdaRound at
W4 improves the end-to-end head-map loss decisively over nearest rounding
(the regime the paper targets — at W8 the wins sit at the noise floor).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpucenterface.config import DetectorConfig, ModelConfig
from tpucenterface.detector import Detector
from tpucenterface.model.centernet import init_model
from tpucenterface.quant import QuantEngine, adaround
from tpucenterface.weights.fold import fold_variables

CFG = ModelConfig(
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
)


def _engine(weight_bits, seed=6):
    _, variables = init_model(CFG, rng=jax.random.PRNGKey(seed), input_size=64)
    return QuantEngine(
        fold_variables(variables), CFG, weight_bits=weight_bits
    )


def _head_err(eng, x):
    f = eng._forward(x, "float")
    q = eng._forward(x, "quant")
    return max(
        float(jnp.max(jnp.abs(q[k].astype(jnp.float32) - f[k])))
        / max(float(jnp.max(jnp.abs(f[k]))), 1e-6)
        for k in ("hm", "whoff")
    )


def test_w4_forward_runs_and_w8_is_tighter():
    rng = np.random.RandomState(0)
    cal = [rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1]
    x = jnp.asarray(cal[0])
    errs = {}
    for bits in (8, 4):
        eng = _engine(bits)
        eng.calibrate(cal)
        assert eng.wqmax == 2 ** (bits - 1) - 1
        errs[bits] = _head_err(eng, x)
        assert np.isfinite(errs[bits])
    # the coarser grid must cost accuracy, and W4 must still be usable
    assert errs[4] > errs[8]
    assert errs[4] < 1.0  # within 100% of range: quantized, not garbage


def test_weight_bits_validation():
    with pytest.raises(ValueError, match="weight_bits"):
        _engine(1)
    with pytest.raises(ValueError, match="weight_bits"):
        _engine(9)


def test_set_scales_refuses_mismatched_bits():
    eng = _engine(8)
    with pytest.raises(ValueError, match="weight_bits"):
        eng.set_scales({"cfg:weight_bits": 4})


def test_w4_adaround_decisive_and_persistence_selfdescribing(tmp_path):
    """At W4 the learned rounding must beat nearest clearly (not the W8
    noise floor), and the persisted dict must reinstall at W4 without the
    caller re-passing weight_bits."""
    det = Detector(
        config=DetectorConfig(model=CFG, default_size=64),
        rng=jax.random.PRNGKey(0),
    )
    rng = np.random.RandomState(3)
    calib = rng.randint(0, 255, (4, 64, 64, 3), np.uint8)
    img = rng.randint(0, 255, (64, 64, 3), np.uint8)

    scales = det.quantize(calib_images=calib, weight_bits=4,
                          adaround_steps=30)
    rep = det.last_adaround_report
    assert rep["_accepted"] == 1.0
    # decisive: >=5% e2e head-map loss reduction over nearest at W4 (the
    # measured margin on random weights is far larger; 0.95 is a safe pin)
    assert rep["_e2e_last"] <= 0.95 * rep["_e2e_first"], rep
    # at least one layer's learned rounding won its reconstruction clearly
    layer_ratios = [v for k, v in rep.items() if not k.startswith("_")]
    assert min(layer_ratios) < 0.9
    assert int(scales["cfg:weight_bits"]) == 4

    got = det.detect(img, score_thresh=-1.0)
    qp = det.quant_variables

    # JSON round-trip + reinstall WITHOUT weight_bits: self-describing
    from tpucenterface.weights.io import load_quant_scales, save_quant_scales

    sp = str(tmp_path / "w4.json")
    save_quant_scales(scales, sp)
    det2 = Detector(
        config=DetectorConfig(model=CFG, default_size=64),
        rng=jax.random.PRNGKey(0),
    )
    re_exported = det2.quantize(scales=load_quant_scales(sp), quant_params=qp)
    assert det2._quant.weight_bits == 4
    assert int(re_exported["cfg:weight_bits"]) == 4
    got2 = det2.detect(img, score_thresh=-1.0)
    np.testing.assert_allclose(got2.scores, got.scores, atol=1e-6)
    np.testing.assert_allclose(got2.boxes, got.boxes, atol=1e-4)


def test_packed_weights_roundtrip_w4_and_w8(tmp_path):
    """save_packed_weights -> load_packed_weights -> quantize() must
    reproduce the packed detector's servings: bit-identically when the
    scales were frozen (adaround), and to float dust for plain PTQ (whose
    original trace recomputed scales in-program — io.py docstring); the
    W4 artifact must be materially smaller than f32."""
    from tpucenterface.weights.io import (
        load_packed_weights,
        save_packed_weights,
    )

    rng = np.random.RandomState(5)
    calib = rng.randint(0, 255, (4, 64, 64, 3), np.uint8)
    img = rng.randint(0, 255, (64, 64, 3), np.uint8)
    for bits, dw in ((4, False), (8, True)):
        det = Detector(
            config=DetectorConfig(model=CFG, default_size=64),
            rng=jax.random.PRNGKey(0),
        )
        det.quantize(calib_images=calib, weight_bits=bits, int8_dw=dw,
                     adaround_steps=8 if bits == 4 else 0)
        ref = det.detect(img, score_thresh=-1.0)
        p = str(tmp_path / f"packed_{bits}.npz")
        sizes = save_packed_weights(det, p)
        if bits == 4:
            # nibble-packed kernels: well under half the f32 footprint
            assert sizes["packed_bytes"] < 0.5 * sizes["f32_bytes"], sizes

        scales, qp = load_packed_weights(p)
        det2 = Detector(
            config=DetectorConfig(model=CFG, default_size=64),
            rng=jax.random.PRNGKey(1),  # different random floats on purpose
        )
        det2.quantize(scales=scales, quant_params=qp)
        assert det2._quant.weight_bits == bits
        assert det2._quant.int8_dw == dw
        got = det2.detect(img, score_thresh=-1.0)
        if bits == 4:  # adaround froze every scale -> bit-exact
            np.testing.assert_array_equal(got.scores, ref.scores)
            np.testing.assert_array_equal(got.boxes, ref.boxes)
        else:  # plain PTQ: in-program vs frozen scale, 1-ulp float dust
            np.testing.assert_allclose(got.scores, ref.scores, atol=1e-6)
            np.testing.assert_allclose(got.boxes, ref.boxes, atol=1e-3)


def test_packed_weights_requires_quantized():
    from tpucenterface.weights.io import save_packed_weights

    det = Detector(
        config=DetectorConfig(model=CFG, default_size=64),
        rng=jax.random.PRNGKey(0),
    )
    with pytest.raises(ValueError, match="quantize"):
        save_packed_weights(det, "/tmp/nope.npz")


def test_cfg_keys_always_present_and_guard_bidirectional(tmp_path):
    """Default (W8, no dw) calibrations must ALSO be self-describing, so a
    default dict refuses a non-default engine — not only the reverse
    (review finding: one-directional guard let W8 frozen scales saturate
    a W4 engine silently)."""
    det = Detector(
        config=DetectorConfig(model=CFG, default_size=64),
        rng=jax.random.PRNGKey(0),
    )
    rng = np.random.RandomState(3)
    calib = rng.randint(0, 255, (4, 64, 64, 3), np.uint8)
    scales = det.quantize(calib_images=calib)  # all defaults
    assert int(scales["cfg:weight_bits"]) == 8
    assert int(scales["cfg:int8_dw"]) == 0
    # direct engine install at the wrong width refuses
    eng = _engine(4)
    with pytest.raises(ValueError, match="weight_bits"):
        eng.set_scales(scales)
    eng8 = _engine(8)
    with pytest.raises(ValueError, match="int8_dw"):
        eng8.set_scales({**scales, "cfg:int8_dw": 1})
    # Detector-level reinstall ADOPTS the recorded settings (the dict wins
    # over mismatched kwargs — documented self-description semantics)
    det2 = Detector(
        config=DetectorConfig(model=CFG, default_size=64),
        rng=jax.random.PRNGKey(0),
    )
    det2.quantize(scales=scales, weight_bits=4, int8_dw=True)
    assert det2._quant.weight_bits == 8
    assert det2._quant.int8_dw is False
