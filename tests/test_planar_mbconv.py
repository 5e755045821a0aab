"""Property tests for the planar fused MBConv kernel (interpret mode on CPU)
against the plain-XLA reference math (ops.fused_mbconv.mbconv_reference).

The planar layout is row-padded: (B, C, H*Wp) with Wp >= W+2 zero columns per
row; the kernel's contract is that pad columns of the INPUT may hold garbage
(it re-zeroes them) and pad columns of the OUTPUT are unspecified — all
comparisons happen after nhwc_from_planar, which drops them."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpucenterface.ops.planar_mbconv import (
    mbconv_reference_planar,
    nhwc_from_planar,
    padded_width,
    planar_from_nhwc,
    planar_mbconv,
)


def _rand_block(rng, b, c, e, cout, h, w, garbage_pads=True):
    wp = padded_width(h, w)
    x = planar_from_nhwc(jnp.asarray(rng.randn(b, h, w, c) * 0.5, jnp.float32))
    if garbage_pads:
        # the kernel must ignore/reconstruct pad columns
        noise = jnp.asarray(rng.randn(b, c, h * wp), jnp.float32)
        colmask = (jnp.arange(h * wp) % wp < w).astype(jnp.float32)
        x = x + noise * (1.0 - colmask)
    w1 = jnp.asarray(rng.randn(1, 1, c, e) * 0.2, jnp.float32) if e != c else None
    b1 = jnp.asarray(rng.randn(e) * 0.1, jnp.float32) if w1 is not None else None
    wd = jnp.asarray(rng.randn(3, 3, 1, e) * 0.3, jnp.float32)
    bd = jnp.asarray(rng.randn(e) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(1, 1, e, cout) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)
    return x, w1, b1, wd, bd, w2, b2


@pytest.mark.parametrize(
    "b,c,e,cout,h,w,skip",
    [
        (2, 24, 144, 24, 16, 16, True),   # b2-like (expand + skip)
        (1, 32, 32, 16, 8, 16, False),    # b0-like (no expand, C-chunked)
        (2, 16, 96, 24, 8, 16, False),    # expand, no skip
        (1, 8, 48, 8, 10, 6, True),       # Wp padding exercise (w=6 -> wp>=8)
    ],
)
def test_planar_mbconv_matches_reference(b, c, e, cout, h, w, skip):
    rng = np.random.RandomState(hash((b, c, e, cout, h, w)) % 2**31)
    x, w1, b1, wd, bd, w2, b2 = _rand_block(rng, b, c, e, cout, h, w)
    out = planar_mbconv(
        x, w1, b1, wd, bd, w2, b2, H=h, W=w, skip=skip, interpret=True
    )
    ref = mbconv_reference_planar(
        x * jnp.asarray(
            (jnp.arange(h * padded_width(h, w)) % padded_width(h, w) < w),
            jnp.float32,
        ),
        w1, b1, wd, bd, w2, b2, H=h, W=w, skip=skip,
    )
    o = nhwc_from_planar(out, h, w)
    r = nhwc_from_planar(ref, h, w)
    assert o.shape == (b, h, w, cout)
    np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=3e-2, rtol=3e-2)


def test_planar_mbconv_edge_pixels_use_zero_padding():
    """Corner outputs must match a zero-padded conv (halo/pad-column logic)."""
    rng = np.random.RandomState(0)
    b, c, e, cout, h, w = 1, 8, 48, 8, 8, 16
    x, w1, b1, wd, bd, w2, b2 = _rand_block(rng, b, c, e, cout, h, w)
    out = planar_mbconv(
        x, w1, b1, wd, bd, w2, b2, H=h, W=w, skip=True, interpret=True
    )
    ref = mbconv_reference_planar(x, w1, b1, wd, bd, w2, b2, H=h, W=w, skip=True)
    o = nhwc_from_planar(out, h, w)
    r = nhwc_from_planar(ref, h, w)
    for yy, xx in [(0, 0), (0, w - 1), (h - 1, 0), (h - 1, w - 1)]:
        np.testing.assert_allclose(
            np.asarray(o[0, yy, xx]), np.asarray(r[0, yy, xx]), atol=3e-2,
            rtol=3e-2,
        )


def test_planar_layout_roundtrip():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 5, 6, 3), jnp.float32)
    p = planar_from_nhwc(x)
    wp = padded_width(5, 6)
    assert p.shape == (2, 3, 5 * wp)
    np.testing.assert_array_equal(np.asarray(nhwc_from_planar(p, 5, 6)), np.asarray(x))
    # pad columns are zero after planar_from_nhwc
    cols = np.asarray(p).reshape(2, 3, 5, wp)[..., 6:]
    np.testing.assert_array_equal(cols, 0.0)
