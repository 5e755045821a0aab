"""Tests for weights/io.py fetch_exact — the layout-proof device->host
fetch guarding weight exports (r5: the axon relay returned transposed
1x1-conv kernels from a bare device_get, silently corrupting every
exported flagship artifact while training was healthy)."""

import numpy as np
import pytest



def test_fetch_exact_roundtrip_and_corruption_guard():
    """fetch_exact returns bit-identical values to the device tree, and the
    order-sensitive checksum catches a transposed-fetch corruption (the r5
    relay bug: 1x1 kernels fetched as their transpose)."""
    import jax
    import jax.numpy as jnp

    from tpucenterface.weights import io as wio

    tree = {
        "a": jnp.asarray(np.random.RandomState(0).randn(1, 1, 32, 16), jnp.float32),
        "b": jnp.asarray(np.random.RandomState(1).randn(3, 3, 8), jnp.bfloat16),
        "step": jnp.asarray(7, jnp.int32),
    }
    got = wio.fetch_exact(tree)
    for k in tree:
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(tree[k]), err_msg=k
        )
        assert got[k].dtype == np.asarray(tree[k]).dtype

    # inject the measured corruption: the data fetch returns each rank-1
    # buffer in transposed-matrix order while the checksum rides through
    orig = wio._device_get
    calls = {"n": 0}

    def corrupt(x):
        calls["n"] += 1
        vals = orig(x)
        if calls["n"] == 1:  # the flats fetch (checks fetched second)
            return [
                np.asarray(v).reshape(16, 32).T.ravel()
                if np.asarray(v).size == 512
                else np.asarray(v)
                for v in vals
            ]
        return vals

    wio._device_get = corrupt
    try:
        with pytest.raises(RuntimeError, match="transfer corruption"):
            wio.fetch_exact(tree)
    finally:
        wio._device_get = orig


def test_fetch_exact_nonfinite_tree_does_not_raise():
    """A diverged run must still be checkpointable: non-finite leaves skip
    verification but keep the layout-proof 1-D fetch."""
    import jax.numpy as jnp

    from tpucenterface.weights.io import fetch_exact

    t = {"w": jnp.asarray([[1.0, np.nan], [np.inf, 4.0]], jnp.float32)}
    out = fetch_exact(t)
    np.testing.assert_array_equal(
        np.asarray(out["w"])[np.isfinite(np.asarray(out["w"]))],
        np.array([1.0, 4.0], np.float32),
    )


def _with_corrupt_flats(fn):
    """Run fetch_exact with the FLATS fetch (first _device_get call)
    rewritten by fn(list_of_rank1_arrays) -> list; the checksum fetch
    rides through untouched."""
    from tpucenterface.weights import io as wio

    orig = wio._device_get
    calls = {"n": 0}

    def corrupt(x):
        calls["n"] += 1
        vals = orig(x)
        if calls["n"] == 1:
            return fn([np.asarray(v) for v in vals])
        return vals

    wio._device_get = corrupt
    return orig, corrupt


def test_fetch_exact_nan_injection_raises():
    """Corruption that injects non-finite bytes into the fetched buffer
    must NOT disable its own detection: host recompute goes NaN while the
    device checksum stays finite — finiteness disagreement is corruption."""
    import jax.numpy as jnp
    import pytest

    from tpucenterface.weights import io as wio

    tree = {"k": jnp.asarray(np.random.RandomState(2).randn(64), jnp.float32)}

    def inject_nan(vals):
        vals = [v.copy() for v in vals]
        vals[0][3] = np.nan
        return vals

    orig, _ = _with_corrupt_flats(inject_nan)
    try:
        with pytest.raises(RuntimeError, match="transfer corruption"):
            wio.fetch_exact(tree)
    finally:
        wio._device_get = orig


def test_fetch_exact_catches_lane_aligned_block_reorder():
    """Raw-tile-order fetch corruption permutes elements while preserving
    index mod the 128-lane tile width; a power-of-two-periodic checksum
    weighting would pass it. The period-61 weights must catch a 64-aligned
    block swap."""
    import jax.numpy as jnp
    import pytest

    from tpucenterface.weights import io as wio

    tree = {"k": jnp.asarray(np.random.RandomState(3).randn(256), jnp.float32)}

    def swap_blocks(vals):
        v = vals[0].copy()
        v[0:64], v[64:128] = vals[0][64:128].copy(), vals[0][0:64].copy()
        return [v]

    orig, _ = _with_corrupt_flats(swap_blocks)
    try:
        with pytest.raises(RuntimeError, match="transfer corruption"):
            wio.fetch_exact(tree)
    finally:
        wio._device_get = orig
