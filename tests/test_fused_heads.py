"""Fused-heads weight transform parity (weights.fold.fuse_head_params)."""

from dataclasses import replace

import jax
import numpy as np

from tpucenterface.config import DetectorConfig, ModelConfig
from tpucenterface.detector import Detector
from tpucenterface.model.centernet import CenterFaceNet, init_model
from tpucenterface.weights.fold import fold_variables

CFG = ModelConfig(compute_dtype="float32")


def test_fused_heads_match_separate():
    _, variables = init_model(CFG, rng=jax.random.PRNGKey(4), input_size=64)
    sep = fold_variables(variables, fuse_heads=False)
    fus = fold_variables(variables, fuse_heads=True)
    m_sep = CenterFaceNet(replace(CFG, folded=True))
    m_fus = CenterFaceNet(replace(CFG, folded=True, fused_heads=True))
    x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    a = jax.jit(lambda v, xx: m_sep.apply(v, xx, train=False))(sep, x)
    b = jax.jit(lambda v, xx: m_fus.apply(v, xx, train=False))(fus, x)
    for k in ("hm", "wh", "off"):
        np.testing.assert_allclose(
            np.asarray(b[k]), np.asarray(a[k]), atol=1e-5, err_msg=k
        )


def test_fused_heads_with_landmarks():
    cfg = replace(CFG, with_landmarks=True)
    _, variables = init_model(cfg, rng=jax.random.PRNGKey(5), input_size=64)
    fus = fold_variables(variables, fuse_heads=True)
    m = CenterFaceNet(replace(cfg, folded=True, fused_heads=True))
    out = jax.jit(lambda v, xx: m.apply(v, xx, train=False))(
        fus, np.zeros((1, 64, 64, 3), np.float32)
    )
    assert out["lm"].shape == (1, 16, 16, 10)


def test_detector_uses_fused_heads():
    det = Detector(
        config=DetectorConfig(model=CFG, default_size=64),
        rng=jax.random.PRNGKey(0),
    )
    assert det.config.model.fused_heads
    assert "fused" in det.variables["params"]["heads"]
    img = np.zeros((64, 64, 3), np.uint8)
    boxes, scores = det.detect(img, score_thresh=0.0)[:2]
    assert np.isfinite(scores).all()


def test_fused_head_scratch_init_carries_hm_prior_bias():
    """A fused_heads model initialized from scratch must still have the
    heatmap prior bias (-4.595) on the hm slice of the fused out-conv
    (ADVICE r1: previously silently dropped to 0)."""
    cfg = replace(CFG, folded=True, fused_heads=True)
    _, variables = init_model(cfg, rng=jax.random.PRNGKey(1), input_size=64)
    bias = np.asarray(variables["params"]["heads"]["fused"]["out"]["bias"])
    assert np.allclose(bias[: cfg.num_classes], cfg.hm_bias_init)
    assert np.allclose(bias[cfg.num_classes :], 0.0)
