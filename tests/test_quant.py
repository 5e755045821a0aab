"""int8 W8A8 PTQ engine tests (quant.engine)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpucenterface.config import ModelConfig
from tpucenterface.model.centernet import init_model
from tpucenterface.quant import QuantEngine
from tpucenterface.weights.fold import fold_variables

CFG = ModelConfig(compute_dtype="float32")


def _engine():
    _, variables = init_model(CFG, rng=jax.random.PRNGKey(6), input_size=64)
    return QuantEngine(fold_variables(variables), CFG)


def test_calibrate_then_quant_close_to_float():
    eng = _engine()
    rng = np.random.RandomState(0)
    cal = [rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1 for _ in range(3)]
    scales = eng.calibrate(cal)
    assert scales and all(v > 0 for v in scales.values())
    x = rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    f = eng.float_forward(jnp.asarray(x))
    q = eng(jnp.asarray(x))
    for k in ("hm", "wh", "off"):
        a = np.asarray(f[k], np.float32)
        b = np.asarray(q[k], np.float32)
        # int8 PTQ tolerance: head maps within a small fraction of their range
        rng_k = max(float(a.max() - a.min()), 1e-3)
        rel = float(np.abs(a - b).mean()) / rng_k
        assert rel < 0.05, (k, rel)


def test_quant_forward_is_jittable():
    eng = _engine()
    rng = np.random.RandomState(1)
    eng.calibrate([rng.rand(1, 64, 64, 3).astype(np.float32)])
    out = jax.jit(eng)(jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert out["hm"].shape == (1, 16, 16, 1)
    assert np.isfinite(np.asarray(out["hm"])).all()


def test_uncalibrated_engine_runs_float():
    eng = _engine()
    out = eng(jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert out["hm"].dtype == jnp.float32


def test_quantize_with_persisted_scales(tmp_path):
    """Deployment contract: calibrate once, persist scales, install them in
    a fresh process — detections identical to the calibrated engine."""
    import jax
    import numpy as np

    from tpucenterface.config import DetectorConfig, ModelConfig
    from tpucenterface.detector import Detector
    from tpucenterface.weights.io import load_quant_scales, save_quant_scales

    cfg = DetectorConfig(
        model=ModelConfig(compute_dtype="float32"), default_size=64
    )
    rng = np.random.RandomState(17)
    calib = rng.randint(0, 255, (4, 64, 64, 3), np.uint8)
    img = rng.randint(0, 255, (64, 64, 3), np.uint8)

    det = Detector(config=cfg, rng=jax.random.PRNGKey(0))
    scales = det.quantize(calib_images=calib, int8_dw=True)
    ref = det.detect(img, score_thresh=-1.0)
    det.dequantize()

    p = str(tmp_path / "scales.json")
    save_quant_scales(scales, p)
    loaded = load_quant_scales(p)
    # per-channel dw entries survive the round trip as arrays
    assert any(isinstance(v, np.ndarray) for v in loaded.values())

    det2 = Detector(config=cfg, rng=jax.random.PRNGKey(0))
    det2.quantize(scales=loaded, int8_dw=True)
    got = det2.detect(img, score_thresh=-1.0)
    det2.dequantize()
    np.testing.assert_allclose(got.scores, ref.scores, atol=1e-6)
    np.testing.assert_allclose(got.boxes, ref.boxes, atol=1e-4)


def test_quantize_requires_input():
    import jax
    import pytest

    from tpucenterface.config import DetectorConfig, ModelConfig
    from tpucenterface.detector import Detector

    det = Detector(
        config=DetectorConfig(
            model=ModelConfig(compute_dtype="float32"), default_size=64
        ),
        rng=jax.random.PRNGKey(0),
    )
    with pytest.raises(ValueError, match="calib_images"):
        det.quantize()


def test_quantize_quant_params_requires_scales():
    """quant_params without scales must refuse: the calibration path would
    clear the frozen 'w:<tag>' scales the fine-tuned params depend on and
    distill against the wrong (already fine-tuned) 'float' teacher."""
    import jax
    import pytest

    from tpucenterface.config import DetectorConfig, ModelConfig
    from tpucenterface.detector import Detector

    det = Detector(
        config=DetectorConfig(
            model=ModelConfig(compute_dtype="float32"), default_size=64
        ),
        rng=jax.random.PRNGKey(0),
    )
    with pytest.raises(ValueError, match="scales"):
        det.quantize(quant_params={"params": {}})


def test_stem_fixed_scale_covers_pixel_range():
    """The stem_preprocess input scale must cover the full raw range
    (max(255*mean, 255*(1-mean))) — and refuse to guess without pp_cfg."""
    import jax
    import numpy as np
    import pytest

    from tpucenterface.config import DetectorConfig, ModelConfig
    from tpucenterface.detector import Detector
    from tpucenterface.quant.engine import QuantEngine

    cfg = DetectorConfig(
        model=ModelConfig(compute_dtype="float32"), default_size=64
    )
    det = Detector(config=cfg, rng=jax.random.PRNGKey(0))
    assert det.config.model.stem_preprocess
    eng = QuantEngine(
        det.variables, det.config.model, pp_cfg=det.config.preprocess
    )
    sx = eng._stem_fixed_scale()
    mean = np.asarray(cfg.preprocess.mean) * 255.0
    amax = float(np.max(np.maximum(mean, 255.0 - mean)))
    assert abs(sx * 127.0 - amax) < 1e-9
    # the darkest/brightest raw values quantize within int8 without clipping
    assert amax / sx <= 127.0 + 1e-9

    eng2 = QuantEngine(det.variables, det.config.model)  # no pp_cfg
    with pytest.raises(ValueError, match="pp_cfg"):
        eng2._stem_fixed_scale()


# --------------------------------------------------------------------- #
# int8-input staging path (stem_input_lut / apply_stem_lut / int8_in)
# --------------------------------------------------------------------- #


def _stem_det():
    from tpucenterface.config import DetectorConfig
    from tpucenterface.detector import Detector

    cfg = DetectorConfig(
        model=ModelConfig(compute_dtype="float32"), default_size=64
    )
    det_ = Detector(config=cfg, rng=jax.random.PRNGKey(2))
    assert det_.config.model.stem_preprocess
    return det_


def test_stem_input_lut_matches_program_chain():
    """The host LUT must reproduce the in-program input quantization
    BIT-exactly — it is built by running the exact device chain over the
    256-value ramp, so host float arithmetic never enters."""
    from tpucenterface.preprocess import normalize_images
    from tpucenterface.quant.engine import apply_stem_lut, stem_input_lut

    det = _stem_det()
    pp = det.config.preprocess
    lut = stem_input_lut(pp)
    assert lut.shape == (256, 3) and lut.dtype == np.int8

    mean = np.asarray(pp.mean, np.float64) * 255.0
    sx = np.float32(float(np.max(np.maximum(mean, 255.0 - mean))) / 127.0)
    rng = np.random.RandomState(7)
    imgs = rng.randint(0, 256, (2, 16, 16, 3), np.uint8)

    @jax.jit
    def program_quant(u):
        x = normalize_images(u, pp, raw=True)
        return jnp.clip(
            jnp.round(x.astype(jnp.float32) / jnp.float32(sx)), -127, 127
        ).astype(jnp.int8)

    np.testing.assert_array_equal(
        apply_stem_lut(imgs, lut), np.asarray(program_quant(imgs))
    )


def test_int8_in_program_bit_identical_to_uint8():
    """The int8_in serving program fed host-LUT-quantized pixels returns
    EXACTLY the uint8 program's detections (same backend, same chain)."""
    from tpucenterface.quant.engine import apply_stem_lut

    det = _stem_det()
    rng = np.random.RandomState(8)
    det.quantize(
        calib_images=rng.randint(0, 255, (4, 64, 64, 3), np.uint8),
        int8_dw=True,
    )
    imgs = rng.randint(0, 256, (3, 64, 64, 3), np.uint8)
    hws = np.full((3, 2), 64, np.int32)
    ref = det._batch_fn(3, (64, 64), 64, identity=True, max_dets=32)(imgs, hws)
    i8 = apply_stem_lut(imgs, det.stem_input_lut())
    got = det._batch_fn(
        3, (64, 64), 64, identity=True, max_dets=32, int8_in=True
    )(i8, hws)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_int8_in_preconditions():
    import pytest

    det = _stem_det()
    # unquantized: both the LUT accessor and the program refuse
    with pytest.raises(ValueError, match="quantize"):
        det.stem_input_lut()
    with pytest.raises(ValueError, match="quantize"):
        det._batch_fn(2, (64, 64), 64, identity=True, int8_in=True)
    rng = np.random.RandomState(9)
    det.quantize(calib_images=rng.randint(0, 255, (2, 64, 64, 3), np.uint8))
    # the letterbox resize is a float op: int8_in demands the identity path
    with pytest.raises(ValueError, match="identity"):
        det._batch_fn(2, (64, 64), 64, identity=False, int8_in=True)


def test_skip_tags_mixed_precision_knob():
    """skip_tags (the mixed-precision probe knob — ledger #25: loses on
    perf, kept for probing) leaves the tagged convs bf16 inside an
    otherwise-int8 forward and still tracks the float path."""
    eng = _engine()
    rng = np.random.RandomState(11)
    cal = [rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1 for _ in range(2)]
    eng.calibrate(cal)
    eng_skip = QuantEngine(
        {"params": eng.p}, CFG, skip_tags=("stem", "b0.dw")
    )
    eng_skip.act_scales = dict(eng.act_scales)
    x = rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    f = eng.float_forward(jnp.asarray(x))
    q = eng_skip(jnp.asarray(x))
    for k in ("hm", "wh", "off"):
        a = np.asarray(f[k], np.float32)
        b2 = np.asarray(q[k], np.float32)
        rng_k = max(float(a.max() - a.min()), 1e-3)
        assert float(np.abs(a - b2).mean()) / rng_k < 0.05, k


def test_percentile_calibration_clips_outliers():
    """calibrate(percentile=) must shrink scales stretched by rare outliers
    and IMPROVE accuracy on clean data (the grid stops covering the spike);
    per-channel depthwise entries stay per-channel; bad percentiles raise."""
    import pytest

    rng = np.random.RandomState(12)
    cal = rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    cal[0, 0, 0, 0] = 500.0  # one absurd spike in the calibration set
    x = rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1  # clean eval data

    _, variables = init_model(CFG, rng=jax.random.PRNGKey(6), input_size=64)
    folded = fold_variables(variables)

    eng_amax = QuantEngine(folded, CFG, int8_dw=True)
    s_amax = eng_amax.calibrate([cal])
    eng_pct = QuantEngine(folded, CFG, int8_dw=True)
    s_pct = eng_pct.calibrate([cal], percentile=99.5)

    # the spike stretched the amax stem scale; the percentile one ignores it
    assert s_pct["stem"] < 0.1 * s_amax["stem"], (s_pct["stem"], s_amax["stem"])
    # per-channel dw entries survive the percentile path
    assert any(np.asarray(v).ndim == 1 for v in s_pct.values())

    f = eng_amax.float_forward(jnp.asarray(x))
    qa = eng_amax(jnp.asarray(x))
    qp = eng_pct(jnp.asarray(x))
    err = {}
    for which, q in (("amax", qa), ("pct", qp)):
        a = np.asarray(f["hm"], np.float32)
        b = np.asarray(q["hm"], np.float32)
        err[which] = float(np.abs(a - b).mean()) / max(
            float(a.max() - a.min()), 1e-3
        )
    assert err["pct"] < err["amax"], err

    with pytest.raises(ValueError, match="percentile"):
        eng_pct.calibrate([cal], percentile=10.0)


def test_detector_quantize_percentile_kwarg():
    """calib_percentile threads from Detector.quantize to the engine."""
    det = _stem_det()
    rng = np.random.RandomState(13)
    calib = rng.randint(0, 255, (2, 64, 64, 3), np.uint8)
    s_pct = det.quantize(calib_images=calib, calib_percentile=99.0)
    det.dequantize()
    s_max = det.quantize(calib_images=calib)
    det.dequantize()
    # clip calibration can only shrink scales
    assert all(
        np.all(np.asarray(s_pct[k]) <= np.asarray(s_max[k]) + 1e-9)
        for k in s_max
    )
    assert any(float(np.max(s_pct[k])) < float(np.max(s_max[k])) for k in s_max)


def test_quantize_landmark_model_and_adaround():
    """The int8 engine must carry the 10-channel landmark head through the
    fused-head form, and adaround's e2e metric must include the lm map
    (keys gains 'lm' for with_landmarks models)."""
    import jax

    from tpucenterface.config import DetectorConfig, ModelConfig
    from tpucenterface.detector import Detector

    cfg = DetectorConfig(
        model=ModelConfig(compute_dtype="float32", with_landmarks=True),
        default_size=64,
    )
    det = Detector(config=cfg, rng=jax.random.PRNGKey(5))
    rng = np.random.RandomState(9)
    calib = rng.randint(0, 255, (4, 64, 64, 3), np.uint8)
    img = rng.randint(0, 255, (64, 64, 3), np.uint8)
    ref = det.detect(img, score_thresh=-1.0)
    assert ref.landmarks is not None

    det.quantize(calib_images=calib, adaround_steps=6)
    got = det.detect(img, score_thresh=-1.0)
    assert got.landmarks is not None and got.landmarks.shape[1:] == (5, 2)
    assert np.isfinite(got.landmarks).all()
    # int8 landmarks track the float path loosely (random weights)
    np.testing.assert_allclose(
        np.sort(got.scores), np.sort(ref.scores), atol=0.05
    )
    rep = det.last_adaround_report
    assert rep is not None and "_e2e_first" in rep
    det.dequantize()
    back = det.detect(img, score_thresh=-1.0)
    np.testing.assert_allclose(back.landmarks, ref.landmarks, atol=1e-5)
