"""Probe: Pallas int8 1x1-conv-with-int8-epilogue vs XLA, block_0 scale.

The ONE open perf lever named by the r2/r3 ledgers (PERFORMANCE.md "Where
the 25.3 ms lives": "Further headroom = Pallas conv-with-int8-epilogue,
still open but high-effort/high-risk"). The target op is block_0's 1x1
PROJECT at high resolution (32->16ch @320^2), the single most
floor-distant fusion in the program: HBM-bound, so int8 activations halve
its traffic, IF a kernel can stream near the chip's measured elementwise
rate (~620-710 GB/s read+write with the chained-slope method; the r3
"1.3 TB/s" figure was a FIFO-timing artifact — see timing.py
chain_op_time_ms).

Measured result (v5e, 2026-08-19): pallas 2.73 ms vs XLA-same-layout
3.18 ms vs 1.40 ms stream floor — the kernel wins 14% like-for-like and
sits at 1.95x floor; the residual is the VPU-bound requant epilogue
(~6 f32 ops x 436M elements ~ 2.7 ms at the VPU's ~1 T elem-op/s).

Probe discipline (same as ledger #1-#25): measure the KERNEL'S BEST CASE —
inputs already in the kernel's preferred planar (B, C, P) int8 layout with
pixels dense in lanes — against (a) the analytic HBM floor and (b) XLA
running the IDENTICAL planar matmul + epilogue from the same buffers. If
the best case already loses (or only matches XLA), the lever is closed:
integration would additionally pay the NHWC->planar relayout that killed
ledger #9/#6. A best-case WIN would justify productizing (epilogue into
the serving engine + layout negotiation with the producer dw conv).

CLI: python -m tpucenterface.bench.probe_int8_conv [--batch 128] [--hw 320]
     [--cin 32] [--cout 16] [--pblk 8192]
"""

from __future__ import annotations

import json


def make_pallas_conv1x1_int8(
    b: int, cin: int, cout_pad: int, npix: int, pblk: int,
    interpret: bool = False,
):
    """(B, Cin, P) int8 @ (Cout, Cin) int8 -> (B, Cout, P) int8.

    int32 MXU accumulate; f32 epilogue scale_c * acc + bias_c, then
    round+clip back to int8 (the producer-side requant that removes the
    separate quantize HBM pass). Grid pipelines pixel blocks per image;
    weights/scales stay resident in VMEM.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(w_ref, s_ref, bias_ref, x_ref, out_ref):
        acc = jax.lax.dot_general(
            w_ref[:],
            x_ref[0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (Cout_pad, PBLK)
        y = acc.astype(jnp.float32) * s_ref[:] + bias_ref[:]
        out_ref[0] = jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)

    grid = (b, npix // pblk)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((cout_pad, cin), lambda i, j: (0, 0)),
            pl.BlockSpec((cout_pad, 1), lambda i, j: (0, 0)),
            pl.BlockSpec((cout_pad, 1), lambda i, j: (0, 0)),
            pl.BlockSpec((1, cin, pblk), lambda i, j: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, cout_pad, pblk), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, cout_pad, npix), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )


def run_probe(
    batch: int = 128,
    hw: int = 320,
    cin: int = 32,
    cout: int = 16,
    pblk: int = 8192,
    passes: int = 3,
) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpucenterface.bench.timing import chain_op_time_ms, median_spread

    npix = hw * hw
    npix_pad = -(-npix // pblk) * pblk
    cout_pad = max(32, cout)  # int8 sublane tile is 32

    rng = np.random.RandomState(0)
    x = jnp.asarray(
        rng.randint(-127, 128, (batch, cin, npix_pad), np.int8)
    )
    w = jnp.asarray(rng.randint(-127, 128, (cout_pad, cin), np.int8))
    scale = jnp.asarray(
        rng.rand(cout_pad, 1).astype(np.float32) * 1e-3
    )
    bias = jnp.asarray(rng.rand(cout_pad, 1).astype(np.float32))

    raw_pallas = make_pallas_conv1x1_int8(batch, cin, cout_pad, npix_pad, pblk)

    def pallas_fn(w, scale, bias, x):
        return raw_pallas(w, scale, bias, x)

    def xla_fn(w, scale, bias, x):
        acc = jax.lax.dot_general(
            w, x, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (Cout, B, P)
        y = acc.astype(jnp.float32) * scale[:, None] + bias[:, None]
        return jnp.clip(jnp.round(y), -127.0, 127.0).astype(
            jnp.int8
        ).transpose(1, 0, 2)

    # correctness first (a small kernel instance built for the check shape)
    small = jax.jit(make_pallas_conv1x1_int8(2, cin, cout_pad, pblk, pblk))
    ref = np.asarray(jax.jit(xla_fn)(w, scale, bias, x[:2, :, :pblk]))
    got = np.asarray(small(w, scale, bias, x[:2, :, :pblk]))
    np.testing.assert_array_equal(got, ref)

    # Timing: chained-carry slope (timing.py chain_op_time_ms) — the FIFO
    # method's ~1 ms/launch dispatch overhead would dominate these ~1-3 ms
    # ops, and the scalar-sum slope method lets XLA dead-code the store.
    # The conv's in/out shapes match (cout_pad == cin), so the output
    # chains directly into the next iteration's input.
    assert cout_pad == cin, "chain timing needs out shape == in shape"

    def time_fn(fn):
        vals = [
            chain_op_time_ms(lambda c: fn(w, scale, bias, c), x)
            for _ in range(passes)
        ]
        med, spread = median_spread(vals, ndigits=6)
        return med, [spread[0], spread[1]]

    # measured streaming floor: an elementwise pass over identical traffic
    t_stream, _ = time_fn(lambda w, s, b, c: c + jnp.int8(1))
    t_pallas, sp_pallas = time_fn(pallas_fn)
    t_xla, sp_xla = time_fn(xla_fn)

    gbytes = (
        x.size + batch * cout_pad * npix_pad + w.size
        + scale.size * 4 + bias.size * 4
    ) / 1e9
    floor_ms = t_stream  # measured elementwise floor at identical traffic
    return {
        "shape": f"({batch},{cin},{npix_pad}) -> ({batch},{cout_pad},{npix_pad}) int8",
        "traffic_gb": round(gbytes, 3),
        "stream_floor_ms": round(t_stream, 3),
        "stream_gbps": round(gbytes / t_stream * 1e3, 0),
        "pallas_ms": round(t_pallas, 3),
        "pallas_spread_ms": [round(v, 3) for v in sp_pallas],
        "xla_ms": round(t_xla, 3),
        "xla_spread_ms": [round(v, 3) for v in sp_xla],
        "pallas_vs_floor": round(t_pallas / floor_ms, 2),
        "xla_vs_floor": round(t_xla / floor_ms, 2),
    }


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="int8 conv+epilogue Pallas probe")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--hw", type=int, default=320)
    p.add_argument("--cin", type=int, default=32)
    p.add_argument("--cout", type=int, default=16)
    p.add_argument("--pblk", type=int, default=8192)
    args = p.parse_args(argv)
    print(json.dumps(run_probe(
        batch=args.batch, hw=args.hw, cin=args.cin, cout=args.cout,
        pblk=args.pblk,
    ), indent=1))


if __name__ == "__main__":
    main()
