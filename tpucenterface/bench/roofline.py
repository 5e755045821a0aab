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
# VPU elementwise rate (ledger #26: the int8 requant epilogue sustained
# ~1 T elem-op/s — the axis the whole-program MFU/HBM pair can't see, and
# why an epilogue-heavy program reads "MFU 0.09 at hbm_frac 0.44" while
# still sitting at its floor). Non-matmul categories' flops are costed
# against this peak, not the MXU's.
MEASURED_VPU_TELEMOPS = 1.0

# xplane category -> program section (VERDICT r4 #5: per-section ms +
# floor-ratio fields so a regression names the section that broke instead
# of only moving total img/s). Mirrors the hand-built r3 25.3 ms table:
# conv = the forward's convolution fusions; input = staging relayouts and
# the quantize pass; decode = sort/top-k/gathers; neck = the upsample
# broadcast (ledger #23's best-of-3 form).
SECTION_OF_CATEGORY = {
    "convolution fusion": "conv",
    "data formatting": "input",
    "copy": "input",
    "copy-start": "input",
    "copy-done": "input",
    "loop fusion": "input",     # the uint8->int8 quantize pass (int8 mode)
    "sort": "decode",
    "slice": "decode",
    "reduce": "decode",
    "iota": "decode",
    "custom fusion": "decode",  # top-k gathers
    "custom-call": "decode",
    "broadcast": "neck",        # upsample2x broadcast-reshape
}
# MXU-rate categories; everything else is costed at the VPU elem-op rate
_MXU_CATEGORIES = ("convolution fusion", "convolution", "dot", "matmul")


def per_op_floor_ms(row: dict, int8: bool = False) -> float:
    """Per-op speed-of-light time: max(compute-axis, HBM-axis).

    Compute axis uses the MEASURED MXU peak for matmul/conv categories and
    the MEASURED VPU elem-op rate otherwise (rawFlops for elementwise
    fusions count vector ops, not MACs). This is the NAIVE per-op roofline
    — real emitters can sit legitimately above it (e.g. K=16/24 MXU
    underfill on the early convs, ledger #27); the demonstrated floors for
    that live in RECORDED_SECTION_FLOORS.
    """
    cat = row.get("category", "")
    if any(cat.startswith(m) for m in _MXU_CATEGORIES):
        peak_tflops = MEASURED_INT8_TOPS if int8 else MEASURED_BF16_TFLOPS
    else:
        peak_tflops = MEASURED_VPU_TELEMOPS  # T elem-op/s
    # GFLOP / (TFLOP/s) == ms; GB / (TB/s) == ms
    compute_ms = row.get("gflops_per_iter", 0.0) / peak_tflops
    hbm_ms = row.get("gbytes_per_iter", 0.0) / MEASURED_HBM_TBPS
    return max(compute_ms, hbm_ms)


# Demonstrated per-section floors (ms) from the optimization ledger — the
# measured "no lever exists" numbers, NOT naive rooflines. Keyed by
# (mode, section) for the canonical serving program shape
# (bs128 @640, identity staging, decode K=100).
#
# METHOD NOTE (r5): rows are xplane-attributed section times (the same
# SECTION_OF_CATEGORY mapping section_table uses), so vs_recorded reads
# ~1.0 when nothing has regressed. The r3 hand-built 25.3 ms table
# attributed some copy/quantize time differently (int8 input read 1.29
# there vs 1.79 under xplane; totals identical), so int8 rows were
# re-based r5 under the xplane method; the CLOSURE evidence is unchanged:
# conv — ledger #26 (single-op Pallas ~floor, no net win) + #27 (fused
#   whole-block kernels lose in BOTH dtypes: int8 s2 0.66x, bf16 s1
#   0.39x); XLA's emitters are the demonstrated machine floor here.
# input — ledger #22 (retiling copy, no lever) + quantize at 2.1x HBM
#   floor (closed); bf16 has no quantize pass.
# decode — K=100 two-stage top-k; Pallas decode/NMS measured slower (r1/r2).
# neck — broadcast-reshape upsample, best-of-3 forms (#23).
RECORDED_SECTION_FLOORS = {
    ("int8", "conv"): 22.5,
    ("int8", "input"): 1.79,
    ("int8", "decode"): 0.56,
    ("int8", "neck"): 0.47,
    ("bf16", "conv"): 26.2,
    ("bf16", "input"): 0.23,
    ("bf16", "decode"): 0.48,
    ("bf16", "neck"): 0.35,
}


def section_table(
    rows: Sequence[dict], int8: bool = False, recorded_floors: bool = False
) -> Dict[str, dict]:
    """Per-section {ms, floor_ms, ratio[, recorded_floor_ms, vs_recorded]}.

    floor_ms is the self-computed per-op roofline floor (per_op_floor_ms
    summed over the section) — shape-correct for ANY profiled program.
    recorded_floors=True additionally compares against the ledger's
    demonstrated floors; those constants are SPECIFIC to the canonical
    serving shape (bs128 @640, identity staging, decode K=100), so callers
    must only set it when profiling that program — attaching them to a
    bs32@320 profile would publish nonsense vs_recorded ratios. A section
    whose `ratio` jumps round-over-round is the section that broke.
    """
    mode = "int8" if int8 else "bf16"
    secs: Dict[str, dict] = {}
    for r in rows:
        sec = SECTION_OF_CATEGORY.get(r.get("category", ""), "other")
        d = secs.setdefault(sec, {"ms": 0.0, "floor_ms": 0.0})
        d["ms"] += r.get("ms_per_iter", 0.0)
        d["floor_ms"] += per_op_floor_ms(r, int8=int8)
    for sec, d in secs.items():
        d["ms"] = round(d["ms"], 3)
        d["floor_ms"] = round(d["floor_ms"], 3)
        d["ratio"] = round(d["ms"] / d["floor_ms"], 2) if d["floor_ms"] > 0 else None
        rec = RECORDED_SECTION_FLOORS.get((mode, sec))
        if recorded_floors and rec is not None:
            d["recorded_floor_ms"] = rec
            d["vs_recorded"] = round(d["ms"] / rec, 3)
    return dict(sorted(secs.items(), key=lambda kv: -kv[1]["ms"]))


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
    logdir: Optional[str] = None, recorded_floors: bool = False,
) -> Dict[str, object]:
    """Capture a jax.profiler trace of `fn(*args)` and reduce it to the
    whole-program roofline summary (see summarize_rows). Pass
    recorded_floors=True ONLY for the canonical serving program (see
    section_table)."""
    import tempfile

    from tpucenterface.bench.op_profile import capture_trace, op_profile_table

    logdir = logdir or tempfile.mkdtemp(prefix="tpucf_roofline_")
    paths = capture_trace(fn, args, logdir, iters=iters)
    rows = op_profile_table(paths, iters=iters)
    out = summarize_rows(rows, int8=int8)
    out["sections"] = section_table(
        rows, int8=int8, recorded_floors=recorded_floors
    )
    return out
