"""Serving latency-SLO curve: p50/p95/p99 request latency vs offered load.

Why (VERDICT r3 #8): the serving ladder shipped on throughput evidence; a
serving runtime's deployment contract is stated in latency percentiles.
This measures, for one ServingEngine configuration, the submit->result
latency distribution at a sweep of offered loads:

- "lone"  — closed-loop, one request in flight (the floor: small-rung
  program + fetch).
- fractions of saturation — open-loop Poisson arrivals at r x the
  engine's measured max throughput, the regime where the batch ladder
  and coalescing policy set the latency shape.

Prints a JSON table, to be recorded in PERFORMANCE.md ("Serving SLO
curve") alongside the recommended ladder for latency-sensitive
deployments.

Environment decomposition (r5 finding): live submit() pays the
host->device transfer per launch, unlike the staged-once bench replay.
On this dev host that transfer rides the axon relay at a measured
~26-33 MB/s — a blocking put of one 39 MB bs32 launch buffer costs
~1.2-1.5 s in EITHER staging mode (formatted 1.23-1.34 s, plain
1.16-1.59 s, 3 trials each; the link, not the host-side layout pack,
is the wall) — so the absolute latencies below are dominated by an
environment constant a production PCIe host shrinks ~500x (39 MB over
>=16 GB/s is ~2-4 ms). To keep the published curve honest the sweep
MEASURES that constant itself (blocking `stage_inputs` of a launch-sized
buffer, median of 5) and records it as `env_h2d_ms_per_launch` /
`env_h2d_mb_s` in the JSON: subtract it from a percentile to read the
engine's own queueing+compute latency, which is the part that transfers
to production. The load-dependent SHAPE of the curve (coalescing, ladder
choice, queue growth toward saturation) is the engine's and is
environment-independent.

CLI: python -m tpucenterface.bench.slo_sweep [--int8] [--size 640]
     [--request-bs 32] [--device-batch 128] [--seconds 8]
     [--staging formatted|plain]
"""

from __future__ import annotations

import json
import time
from typing import Dict, List, Optional, Sequence


def _percentiles(lat_ms: List[float]) -> Dict[str, float]:
    lat = sorted(lat_ms)

    def pct(p):
        return round(lat[min(len(lat) - 1, int(p * len(lat)))], 2)

    return {
        "n": len(lat),
        "p50_ms": pct(0.50),
        "p95_ms": pct(0.95),
        "p99_ms": pct(0.99),
        "max_ms": round(lat[-1], 2),
    }


def measure_saturation(engine, frames, n_requests: int = 40) -> float:
    """Closed-loop max throughput (img/s) with the pipeline kept full."""
    futs = [engine.submit(frames) for _ in range(n_requests)]
    t0 = time.perf_counter()
    futs2 = [engine.submit(frames) for _ in range(n_requests)]
    for f in futs + futs2:
        f.result(timeout=600)
    dt = time.perf_counter() - t0
    return n_requests * frames.shape[0] / dt


def lone_request_latency(engine, frames, n: int = 30) -> Dict[str, float]:
    """Closed-loop, one request in flight: the latency floor."""
    lat = []
    for _ in range(n):
        t0 = time.perf_counter()
        engine.submit(frames).result(timeout=600)
        lat.append((time.perf_counter() - t0) * 1e3)
    return _percentiles(lat)


def loaded_latency(
    engine,
    frames,
    offered_img_s: float,
    seconds: float = 8.0,
    seed: int = 0,
) -> Dict[str, float]:
    """Open-loop Poisson arrivals at `offered_img_s`; per-request latency.

    Submission happens on this thread (submit is non-blocking); results are
    collected afterward so collection never throttles the arrival process.
    """
    import numpy as np

    rng = np.random.RandomState(seed)
    bs = frames.shape[0]
    mean_gap = bs / offered_img_s
    t_end = time.perf_counter() + seconds
    futs = []
    nxt = time.perf_counter()
    while True:
        now = time.perf_counter()
        if now >= t_end:
            break
        if now < nxt:
            time.sleep(min(nxt - now, 0.002))
            continue
        futs.append(engine.submit(frames))
        nxt += rng.exponential(mean_gap)
    for f in futs:
        f.result(timeout=600)
    # the engine records submit->result latency per request internally
    # (ServingEngine stats window); a fresh engine per load point means the
    # snapshot covers exactly this run
    s = engine.stats()
    return {
        "offered_img_s": round(offered_img_s, 1),
        "achieved_requests": len(futs),
        "p50_ms": s["latency_ms_p50"],
        "p95_ms": s["latency_ms_p95"],
        "p99_ms": s["latency_ms_p99"],
        "max_ms": s["latency_ms_max"],
    }


def measure_env_h2d(hw, batch: int, trials: int = 5) -> Dict[str, float]:
    """The environment constant: blocking host->device put of one fresh
    launch-sized uint8 buffer (default layout — measured r5 within noise
    of the formatted put on this host; module docstring). Median of
    `trials`, so the JSON curves are self-decomposing."""
    import numpy as np
    import jax

    from tpucenterface.detector import stage_inputs

    rng = np.random.RandomState(1)
    times = []
    for _ in range(trials):
        imgs = rng.randint(0, 255, (batch, *hw, 3), np.uint8)
        hws = np.full((batch, 2), hw[0], np.int32)
        t0 = time.perf_counter()
        jax.block_until_ready(stage_inputs(None, imgs, hws))
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    nbytes = batch * hw[0] * hw[1] * 3
    return {
        "env_h2d_ms_per_launch": round(med * 1e3, 1),
        "env_h2d_mb_s": round(nbytes / 1e6 / med, 1),
    }


def slo_sweep(
    det,
    hw,
    request_bs: int = 32,
    device_batch: int = 128,
    fractions: Sequence[float] = (0.25, 0.5, 0.75, 0.95),
    seconds: float = 8.0,
    max_dets: Optional[int] = 100,
    int8_input: bool = False,
    staging: str = "formatted",
) -> Dict[str, object]:
    """Run the full sweep on a fresh engine per load point (the latency
    window must not mix load regimes)."""
    import numpy as np

    from tpucenterface.runtime.serving import ServingEngine

    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, (request_bs, *hw, 3), np.uint8)

    def fresh_engine():
        return ServingEngine(
            det, hw, device_batch=device_batch, score_thresh=0.3,
            max_dets=max_dets, int8_input=int8_input, staging=staging,
        )

    # warm every ladder rung once (compiles cache on the Detector, so
    # later fresh engines start warm and each stats window is pure)
    with fresh_engine() as eng:
        eng.submit(frames).result(timeout=600)
        [f.result(timeout=600) for f in [eng.submit(frames) for _ in range(8)]]

    with fresh_engine() as eng:
        sat = measure_saturation(eng, frames)
    with fresh_engine() as eng:
        lone = lone_request_latency(eng, frames)
    points = []
    for frac in fractions:
        with fresh_engine() as eng:
            pt = loaded_latency(eng, frames, sat * frac, seconds=seconds)
            pt["load_frac"] = frac
            points.append(pt)
    out: Dict[str, object] = {
        "hw": list(hw),
        "request_bs": request_bs,
        "device_batch": device_batch,
        "staging": staging,
        "saturation_img_s": round(sat, 1),
        "lone_request": lone,
        "loaded": points,
    }
    # the environment constant at the lone-request LAUNCH size — the
    # smallest ladder rung that fits request_bs (the engine pads every
    # launch to a rung; default ladder {device_batch//4, device_batch}),
    # NOT request_bs itself: a request below the smallest rung still
    # transfers the full padded rung buffer. Subtract from any percentile
    # to read engine-only latency.
    rungs = sorted({max(1, device_batch // 4), device_batch})
    launch_bs = next((b for b in rungs if b >= request_bs), device_batch)
    out["env_h2d_launch_bs"] = launch_bs
    out.update(measure_env_h2d(hw, launch_bs))
    return out


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="Serving latency-SLO sweep")
    p.add_argument("--size", type=int, default=640)
    p.add_argument("--request-bs", type=int, default=32)
    p.add_argument("--device-batch", type=int, default=128)
    p.add_argument("--seconds", type=float, default=8.0)
    p.add_argument("--int8", action="store_true",
                   help="sweep the int8_dw serving forward")
    p.add_argument("--int8-input", action="store_true")
    p.add_argument("--staging", choices=("formatted", "plain"),
                   default="formatted",
                   help="launch staging mode (see module docstring; "
                        "measured latency-neutral on this host — the relay "
                        "link dominates both — recorded in the JSON)")
    args = p.parse_args(argv)

    import numpy as np

    from tpucenterface.config import DetectorConfig
    from tpucenterface.detector import Detector

    det = Detector(config=DetectorConfig(default_size=args.size))
    if args.int8 or args.int8_input:
        rng = np.random.RandomState(0)
        det.quantize(
            calib_images=rng.randint(
                0, 255, (8, args.size, args.size, 3), np.uint8
            ),
            int8_dw=True,
        )
    out = slo_sweep(
        det,
        (args.size, args.size),
        request_bs=args.request_bs,
        device_batch=args.device_batch,
        seconds=args.seconds,
        int8_input=args.int8_input,
        staging=args.staging,
    )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
