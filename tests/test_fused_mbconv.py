"""Fused MBConv Pallas kernel vs XLA reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpucenterface.ops.fused_mbconv import fused_mbconv, mbconv_reference


def _params(rng, cin, ce, cout, expand=True):
    w1 = rng.randn(cin, ce).astype(np.float32) * 0.3 if expand else None
    b1 = rng.randn(ce).astype(np.float32) * 0.1 if expand else None
    wd = rng.randn(3, 3, ce).astype(np.float32) * 0.3
    bd = rng.randn(ce).astype(np.float32) * 0.1
    w2 = rng.randn(ce, cout).astype(np.float32) * 0.3
    b2 = rng.randn(cout).astype(np.float32) * 0.1
    return w1, b1, wd, bd, w2, b2


@pytest.mark.parametrize(
    "cin,ce,cout,expand,skip,h,w",
    [
        (16, 96, 24, True, False, 16, 24),   # expand, no skip
        (24, 144, 24, True, True, 8, 16),    # expand + skip
        (32, 32, 16, False, False, 8, 8),    # t=1 (no expand)
    ],
)
def test_fused_mbconv_matches_reference(cin, ce, cout, expand, skip, h, w):
    rng = np.random.RandomState(0)
    x = (rng.randn(2, h, w, cin) * 0.5).astype(np.float32)
    w1, b1, wd, bd, w2, b2 = _params(rng, cin, ce, cout, expand)
    args = [None if a is None else jnp.asarray(a) for a in (w1, b1, wd, bd, w2, b2)]
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    ref = mbconv_reference(xb, *args, skip=skip)
    got = fused_mbconv(xb, *args, skip=skip, band=h // 2, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(ref, np.float32),
        atol=0.15,  # bf16 path vs f32 reference
        rtol=0.05,
    )


def test_fused_mbconv_band_choice_covers_odd_heights():
    from tpucenterface.ops.fused_mbconv import _pick_band

    for h, w, ce in [(320, 320, 96), (160, 160, 144), (80, 80, 192), (20, 20, 960)]:
        th = _pick_band(h, w, ce)
        assert h % th == 0
        assert (th + 2) * (w + 2) * max(ce, 128) * 2 * 3 < 16 * 1024 * 1024
