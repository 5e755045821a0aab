"""Smoke test for the width-preset zoo sweep (bench/preset_sweep.py) —
tiny shapes on CPU; the real numbers live in PERFORMANCE.md."""

import numpy as np


def test_sweep_preset_smoke():
    from tpucenterface.bench.preset_sweep import sweep_preset

    out = sweep_preset("small", side=64, dev_b=4, iters=2, passes=1)
    assert out["preset"] == "small"
    assert out["params"] > 0
    assert np.isfinite(out["serving_bf16_img_s"])
    # int8 may be None only if quantize() failed; on the small preset the
    # fused-head form exists, so it must succeed here
    assert out["serving_int8_img_s"] is not None
