"""Quantization-aware fine-tuning tests (quant.qat + the fakequant mode).

The contract under test: (1) the STE fake-quant primitives have the
documented gradients, (2) the differentiable "fakequant" forward tracks the
TRUE int8 forward it simulates, (3) qat_finetune measurably shrinks the
int8-vs-float head-map error that PTQ leaves, on the REAL quant path, and
(4) the Detector wiring (qat_steps / quant_params persistence) works
end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpucenterface.config import DetectorConfig, ModelConfig
from tpucenterface.model.centernet import init_model
from tpucenterface.quant import QuantEngine, qat_finetune
from tpucenterface.quant.engine import fake_quant, fake_quant_weight
from tpucenterface.weights.fold import fold_variables

CFG = ModelConfig(compute_dtype="float32")


def _engine(int8_dw=False, seed=6):
    _, variables = init_model(CFG, rng=jax.random.PRNGKey(seed), input_size=64)
    return QuantEngine(fold_variables(variables), CFG, int8_dw=int8_dw)


def _real_errs(eng, batches, refs):
    """Normalized per-head MSE of the REAL int8 forward vs captured float
    reference maps (the product metric QAT optimizes and selects on).

    refs must be captured BEFORE qat_finetune: QAT installs fine-tuned
    params into engine.p, which moves the engine's own float_forward."""
    errs = {}
    for x, ref in zip(batches, refs):
        q = eng(jnp.asarray(x))
        for k in ("hm", "whoff"):
            a = np.asarray(ref[k], np.float32)
            b = np.asarray(q[k], np.float32)
            errs[k] = errs.get(k, 0.0) + float(
                ((a - b) ** 2).mean() / ((a**2).mean() + 1e-6)
            )
    return {k: v / len(batches) for k, v in errs.items()}


# --------------------------------------------------------------------- #
# STE primitives
# --------------------------------------------------------------------- #


def test_fake_quant_forward_matches_int8_reconstruction():
    x = jnp.asarray(np.linspace(-3.0, 3.0, 101, dtype=np.float32))
    s = 2.0 / 127.0
    y = np.asarray(fake_quant(x, s))
    expect = np.clip(np.round(np.asarray(x) / s), -127, 127) * s
    np.testing.assert_allclose(y, expect, atol=1e-6)


def test_fake_quant_ste_gradients():
    """Grad is 1 inside the representable range, 0 where the clip saturates."""
    s = 1.0 / 127.0  # representable range [-1, 1]
    g = jax.grad(lambda v: fake_quant(v, s).sum())(
        jnp.asarray([0.0, 0.5, -0.99, 1.5, -2.0], jnp.float32)
    )
    np.testing.assert_allclose(np.asarray(g), [1.0, 1.0, 1.0, 0.0, 0.0])


def test_fake_quant_weight_matches_serving_rule():
    """fake_quant_weight must reconstruct exactly what _quantize_weight's
    (int8 kernel, scale) pair dequantizes to — QAT optimizes the served
    quantization, not an approximation of it."""
    from tpucenterface.quant.engine import _quantize_weight

    k = jnp.asarray(np.random.RandomState(0).randn(3, 3, 8, 16), jnp.float32)
    kq, sw = _quantize_weight(k)
    np.testing.assert_allclose(
        np.asarray(fake_quant_weight(k)),
        np.asarray(kq, np.float32) * np.asarray(sw),
        atol=1e-6,
    )
    # gradient flows (STE): non-zero, finite
    g = jax.grad(lambda w: (fake_quant_weight(w) ** 2).sum())(k)
    assert np.isfinite(np.asarray(g)).all()
    assert float(np.abs(np.asarray(g)).max()) > 0


# --------------------------------------------------------------------- #
# fakequant forward vs the true int8 forward
# --------------------------------------------------------------------- #


@pytest.mark.parametrize("int8_dw", [False, True])
def test_fakequant_tracks_quant_forward(int8_dw):
    eng = _engine(int8_dw=int8_dw)
    rng = np.random.RandomState(0)
    cal = [rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1 for _ in range(2)]
    eng.calibrate(cal)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    q = eng(x)
    fq = eng._forward(x, "fakequant")
    for k in ("hm", "wh", "off"):
        a = np.asarray(q[k], np.float32)
        b = np.asarray(fq[k], np.float32)
        # same quantized values; differences are float-vs-int32 accumulation
        # order plus the bf16 intermediate writes of the int8 path
        rng_k = max(float(a.max() - a.min()), 1e-3)
        assert float(np.abs(a - b).mean()) / rng_k < 0.01, (k, int8_dw)


def test_fakequant_requires_calibration():
    eng = _engine()
    with pytest.raises(TypeError):
        # act_scales is None -> _act_scale raises on the None subscript
        eng._forward(jnp.zeros((1, 64, 64, 3), jnp.float32), "fakequant")


# --------------------------------------------------------------------- #
# qat_finetune shrinks the PTQ error on the REAL int8 path
# --------------------------------------------------------------------- #


@pytest.mark.parametrize("int8_dw", [False, True])
def test_qat_reduces_int8_error(int8_dw):
    eng = _engine(int8_dw=int8_dw)
    rng = np.random.RandomState(1)
    cal = [rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1 for _ in range(2)]
    eng.calibrate(cal)

    # float references captured BEFORE QAT (engine.p moves on install)
    refs = [eng.float_forward(jnp.asarray(x)) for x in cal]
    refs = [{k: np.asarray(r[k], np.float32) for k in ("hm", "whoff")}
            for r in refs]
    err_ptq = _real_errs(eng, cal, refs)
    metrics = qat_finetune(eng, cal, steps=30, lr=3e-4)
    assert metrics["loss_last"] < metrics["loss_first"], metrics
    # bias correction alone must already have improved the real path
    assert metrics["loss_bc"] < metrics["loss_first"], metrics
    err_qat = _real_errs(eng, cal, refs)
    # independent recomputation: aggregate error on the true int8 path down
    assert sum(err_qat.values()) < sum(err_ptq.values()), (err_ptq, err_qat)


def test_qat_requires_calibrated_engine_and_batches():
    eng = _engine()
    with pytest.raises(ValueError, match="calibrate"):
        qat_finetune(eng, [np.zeros((1, 64, 64, 3), np.float32)], steps=1)
    rng = np.random.RandomState(2)
    eng.calibrate([rng.rand(1, 64, 64, 3).astype(np.float32)])
    with pytest.raises(ValueError, match="batch"):
        qat_finetune(eng, [], steps=1)


# --------------------------------------------------------------------- #
# Detector wiring: qat_steps, persistence via quant_params
# --------------------------------------------------------------------- #


def test_detector_quantize_qat_steps(tmp_path):
    det = Detector_small(seed=0)
    rng = np.random.RandomState(3)
    calib = rng.randint(0, 255, (4, 64, 64, 3), np.uint8)
    img = rng.randint(0, 255, (64, 64, 3), np.uint8)

    float_ref = det.detect(img, score_thresh=-1.0)

    scales = det.quantize(calib_images=calib, int8_dw=True, qat_steps=25)
    m = det.last_qat_metrics
    assert m is not None and m["loss_last"] < m["loss_first"], m
    got = det.detect(img, score_thresh=-1.0)
    assert np.isfinite(got.scores).all()

    # persistence round trip: scales + fine-tuned serving params reinstall
    # in a fresh detector to the same detections
    from tpucenterface.weights.io import (
        load_quant_scales,
        load_safetensors,
        save_quant_scales,
        save_safetensors,
    )

    sp, pp = str(tmp_path / "s.json"), str(tmp_path / "qat.safetensors")
    save_quant_scales(scales, sp)
    save_safetensors(det.quant_variables, pp)
    det.dequantize()
    # the float/parity path is untouched by QAT
    back = det.detect(img, score_thresh=-1.0)
    np.testing.assert_allclose(back.scores, float_ref.scores, atol=1e-6)

    det2 = Detector_small(seed=0)
    det2.quantize(
        scales=load_quant_scales(sp),
        quant_params=load_safetensors(pp)["params"],
        int8_dw=True,
    )
    got2 = det2.detect(img, score_thresh=-1.0)
    np.testing.assert_allclose(got2.scores, got.scores, atol=1e-6)
    np.testing.assert_allclose(got2.boxes, got.boxes, atol=1e-4)


def test_detector_qat_with_persisted_scales_raises():
    det = Detector_small(seed=1)
    with pytest.raises(ValueError, match="qat_steps"):
        det.quantize(scales={"stem": 1.0}, qat_steps=5)


def Detector_small(seed=0):
    from tpucenterface.detector import Detector

    return Detector(
        config=DetectorConfig(
            model=ModelConfig(compute_dtype="float32"), default_size=64
        ),
        rng=jax.random.PRNGKey(seed),
    )
