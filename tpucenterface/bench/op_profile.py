"""Per-op device-time profiling of a fused detect program.

Productizes the round-3 analysis flow: capture a jax.profiler trace of N
launches, convert the xplane proto through tensorboard-plugin-profile's
native converter, and reduce it to a per-category / per-fusion table — the
artifact behind PERFORMANCE.md's "remaining ms are at measured floors"
claims.

CLI:  python -m tpucenterface.bench.op_profile --batch 128 --int8 --k 100
"""

from __future__ import annotations

import glob
import json
import os
import tempfile
from typing import Dict, List, Optional


def capture_trace(fn, args, logdir: str, iters: int = 3) -> List[str]:
    """Run fn(*args) `iters` times under jax.profiler; return xplane paths."""
    import jax
    import numpy as np

    out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[-1]).ravel()[0])  # compile + warm
    jax.profiler.start_trace(logdir)
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[-1]).ravel()[0])
    jax.profiler.stop_trace()
    return glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)


def op_profile_table(xplane_paths: List[str], iters: int = 3) -> List[dict]:
    """Convert xplane protos -> [{category, name, ms_per_iter, gbytes_per_iter,
    gflops_per_iter, occurrences}], sorted by time.

    Uses tensorflow's bundled profiler-plugin converter (no tensorboard UI
    needed). Raises ImportError if the converter is unavailable.
    """
    from tensorflow.python.profiler.internal import (  # noqa: PLC0415
        _pywrap_profiler_plugin as plugin,
    )

    data, _ = plugin.xspace_to_tools_data(xplane_paths, "op_profile")
    prof = json.loads(data if isinstance(data, str) else data.decode())
    root = prof["byProgramExcludeIdle"]["children"][0]
    rows: List[dict] = []
    for cat in root.get("children", []):
        for node in cat.get("children", []):
            m = node.get("metrics", {})
            t = m.get("rawTime", 0) / iters / 1e9  # ps -> ms
            if t <= 0:
                continue
            rows.append(
                {
                    "category": cat["name"],
                    "name": node["name"],
                    "ms_per_iter": round(t, 4),
                    "gbytes_per_iter": round(
                        m.get("rawBytesAccessedArray", [0])[0] / iters / 1e9, 3
                    ),
                    "gflops_per_iter": round(
                        m.get("rawFlops", 0) / iters / 1e9, 2
                    ),
                    "occurrences": m.get("occurrences", 0),
                }
            )
    rows.sort(key=lambda r: -r["ms_per_iter"])
    return rows


def profile_detect_program(
    batch: int = 128,
    size: int = 640,
    int8: bool = False,
    int8_dw: bool = False,
    max_dets: Optional[int] = 100,
    identity: bool = True,
    iters: int = 3,
    logdir: Optional[str] = None,
) -> Dict[str, object]:
    """Capture + summarize the serving detect program's per-op profile."""
    import numpy as np

    from tpucenterface.config import DetectorConfig
    from tpucenterface.detector import Detector, stage_inputs

    det = Detector(config=DetectorConfig())
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (batch, size, size, 3), np.uint8)
    hws = np.tile(np.array([[size, size]], np.int32), (batch, 1))
    if int8 or int8_dw:
        det.quantize(calib_images=imgs[:8], int8_dw=int8_dw)
    try:
        fn, fmts = det._batch_fn_auto(
            batch, (size, size), size, identity=identity, max_dets=max_dets
        )
        im, hw = stage_inputs(fmts, imgs, hws)
        logdir = logdir or tempfile.mkdtemp(prefix="tpucf_prof_")
        paths = capture_trace(fn, (im, hw), logdir, iters=iters)
        rows = op_profile_table(paths, iters=iters)
    finally:
        det.dequantize()
    total = sum(r["ms_per_iter"] for r in rows)
    by_cat: Dict[str, float] = {}
    for r in rows:
        by_cat[r["category"]] = by_cat.get(r["category"], 0.0) + r["ms_per_iter"]
    from tpucenterface.bench.roofline import section_table, summarize_rows

    return {
        "total_ms": round(total, 3),
        "img_per_s": round(batch / total * 1e3, 1) if total else None,
        # whole-program MFU / HBM-roofline vs the chip's measured peaks
        "roofline": summarize_rows(rows, int8=int8 or int8_dw),
        # per-section ms + floor ratios (conv/input/decode/neck —
        # VERDICT r4 #5; bench.py publishes the same fields). The ledger's
        # recorded floors only attach when this profile IS the canonical
        # serving shape they were measured on.
        "sections": section_table(
            rows,
            int8=int8 or int8_dw,
            recorded_floors=(
                batch == 128 and size == 640 and identity
                and max_dets == 100
            ),
        ),
        "by_category_ms": {
            k: round(v, 3)
            for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1])
        },
        "top_ops": rows[:20],
    }


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="Per-op device profile of the fused detect program"
    )
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--size", type=int, default=640)
    p.add_argument("--int8", action="store_true")
    p.add_argument("--int8-dw", action="store_true")
    p.add_argument("--k", type=int, default=100, help="decode top-K")
    p.add_argument("--letterbox", action="store_true",
                   help="profile the resize path instead of identity")
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args(argv)
    out = profile_detect_program(
        batch=args.batch,
        size=args.size,
        int8=args.int8,
        int8_dw=args.int8_dw,
        max_dets=args.k,
        identity=not args.letterbox,
        iters=args.iters,
    )
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
