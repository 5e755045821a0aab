"""PlanarEngine parity vs the flax model (folded weights), CPU interpret mode."""

from dataclasses import replace

import jax
import numpy as np
import torch

from tpucenterface.config import ModelConfig
from tpucenterface.model.centernet import CenterFaceNet
from tpucenterface.model.planar_engine import PlanarEngine
from tpucenterface.weights.fold import fold_variables
from tpucenterface.weights.port import flax_from_torch_module
from tpucenterface.weights.torch_twin import TorchCenterFace

CFG = ModelConfig(compute_dtype="float32")


def _folded(fuse_heads):
    torch.manual_seed(3)
    twin = TorchCenterFace(CFG).eval()
    with torch.no_grad():
        for m in twin.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.3, 0.3)
    variables = flax_from_torch_module(twin, CFG)
    return fold_variables(variables, bn_eps=CFG.bn_eps, fuse_heads=fuse_heads)


def _run_pair(fuse_heads):
    folded = _folded(fuse_heads)
    fmodel = CenterFaceNet(replace(CFG, folded=True, fused_heads=fuse_heads))
    eng = PlanarEngine(folded, CFG, interpret=True)
    x = np.random.RandomState(0).rand(2, 128, 128, 3).astype(np.float32)
    a = jax.jit(lambda v, xx: fmodel.apply(v, xx, train=False))(folded, x)
    b = jax.jit(eng)(x)
    return a, b


def test_planar_engine_matches_flax_separate_heads():
    a, b = _run_pair(fuse_heads=False)
    for k in ("hm", "wh", "off"):
        # engine honors cfg.compute_dtype (f32 here), so this is f32-vs-f32
        # of the same lax ops — tight tolerance
        np.testing.assert_allclose(
            np.asarray(b[k]), np.asarray(a[k]), atol=1e-5, rtol=1e-5,
            err_msg=k,
        )


def test_planar_engine_matches_flax_fused_heads():
    a, b = _run_pair(fuse_heads=True)
    for k in ("hm", "wh", "off"):
        np.testing.assert_allclose(
            np.asarray(b[k]), np.asarray(a[k]), atol=1e-5, rtol=1e-5,
            err_msg=k,
        )


def test_planar_engine_uses_chains():
    """The engine must actually route the late blocks through the chain
    kernel (guard against silently falling back to XLA everywhere)."""
    import tpucenterface.model.planar_engine as pe

    folded = _folded(False)
    for fusion, expected in (
        # with the b0->b1 algebraic fold, b0 runs depthwise-only outside
        # the chains; without it (the measured-faster default) b0 is its
        # own 1-block chain
        (True, [1, 2, 6, 3]),
        (False, [1, 1, 2, 6, 3]),
    ):
        eng = PlanarEngine(
            folded, CFG, max_chain_res=96, algebraic_fusion=fusion,
            interpret=True,
        )
        calls = []
        orig = pe.planar_mbconv_chain

        def spy(x, run, **kw):
            calls.append(len(run))
            return orig(x, run, **kw)

        pe.planar_mbconv_chain = spy
        try:
            x = np.zeros((1, 128, 128, 3), np.float32)
            jax.jit(eng)(x)
        finally:
            pe.planar_mbconv_chain = orig
        # 128px input: every stride-1 run is <= 96 rows; chains over
        # b2@32, b4-5@16, b7-12@8, b14-16@4 (+ b0@64 when not folded away)
        assert calls == expected, (fusion, calls)


def test_detector_engine_flag_matches_flax():
    """ModelConfig.inference_engine='planar' must produce the same detections
    as the default flax forward through the FULL detect program."""
    from tpucenterface.config import DetectorConfig
    from tpucenterface.detector import Detector

    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, (96, 128, 3), np.uint8)
    outs = {}
    for engine in ("flax", "planar"):
        cfg = DetectorConfig(
            model=ModelConfig(compute_dtype="float32", inference_engine=engine),
            default_size=64,
        )
        det = Detector(config=cfg, rng=jax.random.PRNGKey(5))
        if engine == "planar":
            assert det._engine is not None
        outs[engine] = det.detect(img, score_thresh=-1.0)
    np.testing.assert_allclose(
        outs["planar"].scores, outs["flax"].scores, atol=1e-5
    )
    np.testing.assert_allclose(
        outs["planar"].boxes, outs["flax"].boxes, atol=1e-3
    )
