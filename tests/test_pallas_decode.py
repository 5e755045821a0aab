"""Pallas fused decode vs. golden jnp decode (SURVEY.md §4 item 2).

Runs the kernel in interpreter mode on the CPU backend; the same kernel
compiles on TPU (exercised by bench.py / detector on hardware).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpucenterface.config import DecodeConfig
from tpucenterface.decode.pallas_decode import decode_feats_pallas
from tpucenterface.decode.reference import decode_feats


def _rand_feats(rng, b, h, w, peaky=True):
    hm = rng.randn(b, h, w, 1).astype(np.float32) * (3.0 if peaky else 0.3)
    wh = (rng.rand(b, h, w, 2).astype(np.float32) * 6).astype(np.float32)
    off = rng.rand(b, h, w, 2).astype(np.float32) - 0.5
    return {
        "hm": jnp.asarray(hm),
        "wh": jnp.asarray(wh),
        "off": jnp.asarray(off),
    }


@pytest.mark.parametrize("seed,b,h,w,k", [(0, 1, 16, 16, 10), (1, 2, 24, 32, 50)])
def test_pallas_matches_golden_random(seed, b, h, w, k):
    rng = np.random.RandomState(seed)
    feats = _rand_feats(rng, b, h, w)
    cfg = DecodeConfig(max_dets=k)
    gb, gs = decode_feats(feats, cfg)
    pb, ps = decode_feats_pallas(feats, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(gs), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pb), np.asarray(gb), atol=1e-4)


def test_pallas_matches_golden_sparse_peaks():
    """Few real peaks + zero ties: exercises tie-break and exhaustion path."""
    b, h, w, k = 1, 20, 20, 30
    hm = np.full((b, h, w, 1), -8.0, np.float32)
    for (y, x, v) in [(3, 4, 4.0), (10, 15, 3.0), (17, 2, 2.0)]:
        hm[0, y, x, 0] = v
    rng = np.random.RandomState(2)
    feats = {
        "hm": jnp.asarray(hm),
        "wh": jnp.asarray(rng.rand(b, h, w, 2).astype(np.float32) * 4),
        "off": jnp.asarray(rng.rand(b, h, w, 2).astype(np.float32) - 0.5),
    }
    cfg = DecodeConfig(max_dets=k)
    gb, gs = decode_feats(feats, cfg)
    pb, ps = decode_feats_pallas(feats, cfg, interpret=True)
    # the three real peaks must come first, identically ordered
    np.testing.assert_allclose(np.asarray(ps[:, :3]), np.asarray(gs[:, :3]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pb[:, :3]), np.asarray(gb[:, :3]), atol=1e-4)


def test_pallas_wh_log_mode():
    rng = np.random.RandomState(3)
    feats = _rand_feats(rng, 1, 16, 16)
    cfg = DecodeConfig(max_dets=8, wh_log=True)
    gb, gs = decode_feats(feats, cfg)
    pb, ps = decode_feats_pallas(feats, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(pb), np.asarray(gb), rtol=1e-4, atol=1e-4)
