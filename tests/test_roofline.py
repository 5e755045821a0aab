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


def test_per_op_floor_ms_axes():
    from tpucenterface.bench.roofline import (
        MEASURED_VPU_TELEMOPS,
        per_op_floor_ms,
    )

    # conv row: MXU-rate compute floor dominates
    conv = {"category": "convolution fusion",
            "ms_per_iter": 1.0, "gflops_per_iter": 190.0,
            "gbytes_per_iter": 0.065}
    assert abs(per_op_floor_ms(conv) - 1.0) < 1e-9          # 190/190 = 1 ms
    assert abs(per_op_floor_ms(conv, int8=True) - 190.0 / 350.0) < 1e-9
    # elementwise row: costed at the VPU rate, not the MXU's
    elem = {"category": "loop fusion",
            "ms_per_iter": 1.0, "gflops_per_iter": 0.5, "gbytes_per_iter": 0.0}
    assert abs(per_op_floor_ms(elem) - 0.5 / MEASURED_VPU_TELEMOPS) < 1e-9
    # HBM-bound row: bytes axis wins
    stream = {"category": "data formatting",
              "ms_per_iter": 1.0, "gflops_per_iter": 0.0,
              "gbytes_per_iter": 0.65}
    assert abs(per_op_floor_ms(stream) - 1.0) < 1e-9        # 0.65/0.65 TB/s


def test_section_table_mapping_and_ratios():
    from tpucenterface.bench.roofline import section_table

    rows = [
        {"category": "convolution fusion", "ms_per_iter": 20.0,
         "gflops_per_iter": 1750.0, "gbytes_per_iter": 3.25},  # floor 5 (int8)
        {"category": "data formatting", "ms_per_iter": 0.8,
         "gflops_per_iter": 0.0, "gbytes_per_iter": 0.26},     # floor 0.4
        {"category": "sort", "ms_per_iter": 0.2,
         "gflops_per_iter": 0.0, "gbytes_per_iter": 0.0},
        {"category": "broadcast", "ms_per_iter": 0.4,
         "gflops_per_iter": 0.0, "gbytes_per_iter": 0.13},     # floor 0.2
        {"category": "weird-new-category", "ms_per_iter": 0.1,
         "gflops_per_iter": 0.0, "gbytes_per_iter": 0.0},
    ]
    t = section_table(rows, int8=True, recorded_floors=True)
    assert set(t) == {"conv", "input", "decode", "neck", "other"}
    assert t["conv"]["ms"] == 20.0
    assert abs(t["conv"]["floor_ms"] - 5.0) < 1e-6
    assert t["conv"]["ratio"] == 4.0
    # recorded demonstrated floors present for the int8 serving sections
    assert t["conv"]["recorded_floor_ms"] == 22.5
    assert abs(t["conv"]["vs_recorded"] - 20.0 / 22.5) < 1e-3
    assert t["input"]["ms"] == 0.8 and abs(t["input"]["ratio"] - 2.0) < 1e-6
    # zero-floor section: ratio is None, not a division crash
    assert t["decode"]["ms"] == 0.2 and t["decode"]["ratio"] is None
    # bf16 rows recorded r5 (PERFORMANCE.md floor table): keyed per-mode,
    # so the same section reads a different demonstrated floor in bf16
    t2 = section_table(rows, int8=False, recorded_floors=True)
    assert t2["neck"]["recorded_floor_ms"] == 0.35
    assert abs(t2["neck"]["vs_recorded"] - 0.4 / 0.35) < 1e-3
    # a mode/section pair with no recorded row stays absent, no crash
    assert "recorded_floor_ms" not in t2["other"]
    # the recorded constants are bs128@640-specific: a non-canonical
    # profile (default recorded_floors=False) must NOT carry them —
    # a bs32@320 conv section compared against the 22.5 ms canonical
    # floor would read as "far below the demonstrated floor"
    t3 = section_table(rows, int8=True)
    assert "recorded_floor_ms" not in t3["conv"]
    assert "vs_recorded" not in t3["conv"]
    assert t3["conv"]["ratio"] == 4.0  # self-computed floors still present
