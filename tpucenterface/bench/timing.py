"""Tunnel-safe TPU timing.

The axon relay breaks every naive timing method (measured, in order):
- `block_until_ready` can return before execution completes (a bs32 matmul
  "ran" in 0.03ms = 38 PFLOP/s);
- host-fetch-per-iteration serializes on the ~30ms round trip, hiding any
  op cheaper than the RTT;
- output->input chaining ships the full array through the tunnel each step.

The sound method: run the op K times INSIDE one jitted program with a scalar
carry dependency (defeats CSE/hoisting), fetch one scalar at the end, and fit
time-vs-K over two K values. The slope is pure device compute, independent of
RTT and transfer costs.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def op_time_ms(
    op: Callable,
    *args,
    k_pair: Sequence[int] = (4, 20),
    reps: int = 3,
) -> float:
    """Per-call device time (ms) of `op(*args) -> pytree`, slope method."""

    def make(k):
        @jax.jit
        def run(*a):
            def body(i, c):
                # perturb every leaf of the first arg by a negligible
                # carry-dependent amount so each iteration is a fresh
                # computation (works for array or pytree first args)
                a0 = jax.tree.map(
                    lambda l: l + (c * 1e-30).astype(l.dtype)
                    if jnp.issubdtype(l.dtype, jnp.floating)
                    else l,
                    a[0],
                )
                out = op(a0, *a[1:])
                leaves = jax.tree.leaves(out)
                s = sum(jnp.sum(l, dtype=jnp.float32) for l in leaves)
                return s * 1e-30
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        return run

    lo, hi = k_pair
    run_lo, run_hi = make(lo), make(hi)
    float(run_lo(*args))  # compile
    float(run_hi(*args))
    t_lo = min(_timed(run_lo, args) for _ in range(reps))
    t_hi = min(_timed(run_hi, args) for _ in range(reps))
    return max((t_hi - t_lo) / (hi - lo) * 1e3, 0.0)


def chain_op_time_ms(
    op: Callable,
    x,
    k_pair: Sequence[int] = (4, 16),
    reps: int = 3,
) -> float:
    """Per-call device time (ms) of a SAME-shape/dtype `op(x) -> y`, by
    chaining the output into the next iteration's input inside one jitted
    fori_loop and fitting time-vs-K.

    Why a second slope method exists: `op_time_ms` keeps the loop body live
    via a scalar-sum carry, so XLA fuses the reduction into the op and the
    full output is never WRITTEN to HBM — correct for compute-bound ops,
    but it under-counts streaming ops by their entire write traffic (and a
    sliced sum lets XLA dead-code the op wholesale). Carrying the full
    array forces the real read+write each iteration. Measured calibration
    on v5e (2026-08-19): elementwise int8/f32 adds land at 636-713 GB/s
    with this method — consistent with the 819 GB/s HBM nameplate — where
    the FIFO method reports 100-450 GB/s (its ~0.8-1.1 ms per-launch
    dispatch overhead dominates ms-scale ops) and the scalar-sum slope
    reports impossible TB/s (DCE). Use FIFO for >10 ms serving programs,
    this for micro-op probes.
    """
    import numpy as np

    def make(k):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, k, lambda i, c: op(c), x)
        return run

    lo, hi = k_pair
    run_lo, run_hi = make(lo), make(hi)

    def fetch1(r):
        np.asarray(r.reshape(-1)[:1])  # bound completion, 1-elem transfer

    fetch1(run_lo(x))  # compile
    fetch1(run_hi(x))

    def timed(fn):
        t0 = time.perf_counter()
        fetch1(fn(x))
        return time.perf_counter() - t0

    t_lo = min(timed(run_lo) for _ in range(reps))
    t_hi = min(timed(run_hi) for _ in range(reps))
    return max((t_hi - t_lo) / (hi - lo) * 1e3, 0.0)


def dep_op_time_ms(
    op: Callable,
    x,
    k_pair: Sequence[int] = (3, 9),
    reps: int = 3,
) -> float:
    """Slope timing for ops whose output shape differs from the input's.

    chain_op_time_ms needs out==in shapes; here each iteration's FULL
    output is forced by an optimization_barrier + sum, and a provably-cheap
    data dependency (a one-element dynamic_update_slice on the carried
    input) serializes iterations without re-streaming the input.

    Why the barrier (ADVICE r4 medium): without it, XLA can fuse the scalar
    reduction into a plain-HLO op's final fusion and never write the output
    array to HBM, while a pallas_call always materializes its output — so
    "the sum is identical for every variant" was false, biasing
    pallas-vs-XLA comparisons in XLA's favor by ~one output write. The
    barrier forces the output to materialize for BOTH variants before the
    sum reads it back, so comparisons are symmetric; absolute values are
    upper bounds by that one write+read pass over the output.
    """
    import jax.numpy as jnp
    import numpy as np

    def make(k):
        @jax.jit
        def run(x):
            def body(i, c):
                # barrier: the output must be a materialized buffer (the
                # sum cannot fuse into the producer), matching pallas_call
                # semantics for plain-HLO variants
                out = jax.lax.optimization_barrier(op(c))
                s = jnp.sum(out.astype(jnp.float32))  # forces full out
                idx = (0,) * c.ndim
                patch = c[(slice(0, 1),) * c.ndim] + (s * 1e-30).astype(
                    c.dtype
                )
                return jax.lax.dynamic_update_slice(c, patch, idx)
            return jax.lax.fori_loop(0, k, body, x)
        return run

    lo, hi = k_pair
    run_lo, run_hi = make(lo), make(hi)

    def fetch1(r):
        np.asarray(r.reshape(-1)[:1].astype(jnp.float32))

    fetch1(run_lo(x))
    fetch1(run_hi(x))

    def timed(fn):
        t0 = time.perf_counter()
        fetch1(fn(x))
        return time.perf_counter() - t0

    t_lo = min(timed(run_lo) for _ in range(reps))
    t_hi = min(timed(run_hi) for _ in range(reps))
    return max((t_hi - t_lo) / (hi - lo) * 1e3, 0.0)


def _timed(fn, args) -> float:
    t0 = time.perf_counter()
    float(fn(*args))
    return time.perf_counter() - t0


def throughput_images_per_sec(
    fn: Callable, args, batch: int, iters: int = 30
) -> float:
    """Pipeline throughput: enqueue `iters` calls, barrier on the last result.

    Device execution is FIFO, so fetching the last result's bytes bounds all
    prior work; with enough iters the RTT amortizes away. This measures the
    rate a saturated serving pipeline would see.
    """
    import numpy as np

    out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[-1]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[-1]).ravel()[0])
    dt = time.perf_counter() - t0
    return batch * iters / dt


def fifo_ips(fn, im, hw, batch: int, iters: int, warm: bool = True) -> float:
    """FIFO-bounded throughput of a `(images, hws) -> (boxes, scores, ...)`
    program: optionally warm/compile, enqueue `iters` launches, then fetch
    one scalar of the LAST result — device execution is FIFO so that
    bounds all prior work (`block_until_ready` is unreliable over the axon
    relay; see module docstring). THE canonical serving-rate measurement:
    bench.py, cli/bench_suite.py, and bench/preset_sweep.py all time
    through here so the method cannot drift between benchmarks.
    """
    import numpy as np

    if warm:
        out = fn(im, hw)
        float(np.asarray(out[1]).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(im, hw)
    float(np.asarray(out[1]).sum())
    return batch * iters / (time.perf_counter() - t0)


def fifo_ips_passes(fn, im, hw, batch: int, iters: int, passes: int):
    """Warm once, then `passes` independent fifo_ips measurements (for
    median + [min, max] spread reporting — run-to-run serving spread is
    ~±2%, so single-pass deltas below that are unattributable)."""
    import numpy as np

    out = fn(im, hw)
    float(np.asarray(out[1]).sum())
    return [
        fifo_ips(fn, im, hw, batch, iters, warm=False) for _ in range(passes)
    ]


def median_spread(vals, ndigits: int = 1):
    """(median, [min, max]) of a fifo_ips_passes result, rounded — the
    reporting form every benchmark prints."""
    import statistics

    return (
        round(statistics.median(vals), ndigits),
        [round(min(vals), ndigits), round(max(vals), ndigits)],
    )
