"""Interpret-mode correctness of the int8 conv+epilogue probe kernel
(bench/probe_int8_conv.py) — the measurement itself runs on the TPU; the
kernel math (int32 MXU accumulate + f32 scale/bias + round/clip requant)
is pinned here."""

import jax
import jax.numpy as jnp
import numpy as np

from tpucenterface.bench.probe_int8_conv import make_pallas_conv1x1_int8


def test_probe_kernel_matches_reference_interpret():
    b, cin, cout, npix, pblk = 2, 32, 32, 512, 256
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(-127, 128, (b, cin, npix), np.int8))
    w = jnp.asarray(rng.randint(-127, 128, (cout, cin), np.int8))
    scale = jnp.asarray(rng.rand(cout, 1).astype(np.float32) * 1e-2)
    bias = jnp.asarray(rng.rand(cout, 1).astype(np.float32))

    fn = make_pallas_conv1x1_int8(b, cin, cout, npix, pblk, interpret=True)
    got = np.asarray(fn(w, scale, bias, x))

    acc = np.einsum(
        "oc,bcp->bop", np.asarray(w, np.int32), np.asarray(x, np.int32)
    ).astype(np.float32)
    ref = np.clip(
        np.round(acc * np.asarray(scale)[None] + np.asarray(bias)[None]),
        -127, 127,
    ).astype(np.int8)
    np.testing.assert_array_equal(got, ref)
