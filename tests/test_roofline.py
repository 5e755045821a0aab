"""Tests for the whole-program MFU/HBM-roofline reduction (bench/roofline.py)."""

import numpy as np

from tpucenterface.bench.roofline import (
    MEASURED_BF16_TFLOPS,
    MEASURED_HBM_TBPS,
    MEASURED_INT8_TOPS,
    summarize_rows,
)


def test_summarize_rows_arithmetic():
    # 2 ms, 100 GFLOP, 1.3 GB -> 50 TFLOP/s, 0.65 TB/s
    rows = [
        {"ms_per_iter": 1.5, "gflops_per_iter": 90.0, "gbytes_per_iter": 1.0},
        {"ms_per_iter": 0.5, "gflops_per_iter": 10.0, "gbytes_per_iter": 0.3},
    ]
    s = summarize_rows(rows)
    assert s["total_ms"] == 2.0
    assert s["tflops"] == 50.0
    assert s["mfu"] == round(50.0 / MEASURED_BF16_TFLOPS, 4)
    assert s["hbm_tbps"] == 0.65
    assert s["hbm_frac"] == round(0.65 / MEASURED_HBM_TBPS, 4)
    assert s["peak_tflops"] == MEASURED_BF16_TFLOPS


def test_summarize_rows_int8_peak_and_override():
    rows = [{"ms_per_iter": 1.0, "gflops_per_iter": 35.0, "gbytes_per_iter": 0.0}]
    s = summarize_rows(rows, int8=True)
    assert s["peak_tflops"] == MEASURED_INT8_TOPS
    assert s["mfu"] == round(35.0 / MEASURED_INT8_TOPS, 4)
    s2 = summarize_rows(rows, peak_tflops=70.0)
    assert s2["mfu"] == 0.5


def test_summarize_rows_empty_and_missing_fields():
    assert summarize_rows([])["tflops"] is None
    # rows without flops/bytes metrics (some backends omit them) still reduce
    s = summarize_rows([{"ms_per_iter": 2.0}])
    assert s["total_ms"] == 2.0 and s["tflops"] == 0.0 and s["mfu"] == 0.0


def test_roofline_of_fn_smoke():
    """Capture a real (CPU) trace of a jitted matmul and reduce it; the
    converter may not attribute flops on CPU, but the reduction must
    return the full field set without raising."""
    import jax
    import jax.numpy as jnp
    import pytest

    a = jnp.asarray(np.random.RandomState(0).rand(256, 256), jnp.float32)
    fn = jax.jit(lambda x: x @ x)
    try:
        from tpucenterface.bench.roofline import roofline_of_fn

        s = roofline_of_fn(fn, (a,), iters=2)
    except (ImportError, IndexError, KeyError) as e:
        pytest.skip(f"profiler converter unavailable on this backend: {e}")
    for k in ("total_ms", "tflops", "mfu", "hbm_tbps", "hbm_frac"):
        assert k in s
