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
