"""Planar fused inverted-residual Pallas kernel (stride 1) — round-2 design.

Why a second fused-MBConv kernel (see ops/fused_mbconv.py for round 1's):
round 1 kept NHWC with channels in the lane dimension, so every VMEM tile and
every DMA padded C (16..32) up to 128 lanes — 4-8x phantom traffic, which is
exactly what its measurement ledger said ("padded-lane DMA ... eats the
traffic savings"). This kernel flips the layout:

    activations: (B, C, H*Wp)  "row-padded planar":
        C in sublanes (dense, 8/16-granular);
        lanes are H rows of Wp = W + pad pixels, pad >= 2 zero columns chosen
        so H*Wp is a multiple of 128. ALL pixels of an image sit in lanes.

Design points, each tied to a measured failure it avoids:
- HBM arrays are dense 2D per image -> zero DMA padding (round-1 killer).
- 1x1 convs are `dot(w (Co, Ci), x (Ci, HWp))`: contraction in the LHS-lane /
  RHS-sublane position the MXU wants. (Round 1's "planar" probe that measured
  6.5 TF/s contracted the UNTILED dim of a 3D (C, H, W) value; the 2D view is
  what makes the MXU engage.)
- the 3x3 depthwise is 9 lane-shifted pure FMAs — NO masks in the tap loop:
  the row-pad columns supply the w-edge zeros and a tile-aligned zero halo
  supplies the h-edge zeros. (v2 of this kernel masked every tap with a
  where(); that tripled the VPU op count and lost to XLA.)
  The pad columns are re-zeroed in the expand epilogue (one multiply), so
  garbage never propagates: every planar tensor in the chain keeps the
  invariant "pad columns may be arbitrary; they are zeroed before use".
- the 6x-expanded activation NEVER touches HBM (the measured wall of the
  forward: ~7 ms of 13 at bs32@640 was high-res MBConv HBM round-trips).
  v5e has 128MiB of physical VMEM; the default 16MB scoped limit is raised so
  whole-image expanded buffers fit without channel-chunking at every model
  resolution (chunking cost a 128/Ec projection inflation in v2).

Stride-2 blocks are NOT handled (lane compaction = unsupported gather, and
measured XLA already runs the stride-2 blocks at the HBM roofline).

Capability context: SURVEY.md §2 C1 (the reference's cuDNN inverted-residual
stack); this is its TPU-native hot-path equivalent.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def padded_width(h: int, w: int) -> int:
    """Smallest Wp >= w+2 with h*Wp a multiple of 128 (row-padded planar)."""
    wp = w + 2
    while (h * wp) % LANE:
        wp += 1
    return wp


def _halo(wp: int) -> int:
    """Lane halo: smallest tile multiple covering one padded row + 1 pixel."""
    return -(-(wp + 1) // LANE) * LANE


def _pick_chunk(e: int, c: int, cout: int, hwp: int, halo: int) -> int:
    """Largest expand-channel chunk Ec (dividing E, multiple of 8) fitting the
    VMEM budget; with the raised limit this is G=1 for every block shape in
    the model, but the chunked path is kept for larger-than-model shapes."""
    budget = 56 * 1024 * 1024
    resident = c * hwp * 2 * 2 + cout * hwp * 4 * 2  # pipelined x + f32 out
    for ec in range(min(e, 1024), 7, -8):
        if e % ec:
            continue
        work = ec * (hwp + 2 * halo) * 2 + ec * 2560 * 4 * 2
        if resident + work <= budget:
            return ec
    return 8


def _kernel(
    x_ref,        # (1, C, HWp) resident (or (1, Ec, HWp) chunk if no expand)
    w1_ref,       # (1, Ec, C) expand chunk (or (1,1,1) dummy)
    b1_ref,       # (1, Ec, 1) f32
    wd_ref,       # (1, Ec, 9) depthwise taps, tap index (dy+1)*3+(dx+1)
    bd_ref,       # (1, Ec, 1) f32
    w2_ref,       # (1, Cout, Ec) projection chunk
    b2_ref,       # (Cout, 1) f32
    colmask_ref,  # (1, HWp) f32: 1.0 on real pixels, 0.0 on pad columns
    o_ref,        # (1, Cout, HWp) f32, revisited/accumulated across g
    *,
    Ec: int,
    H: int,
    Wp: int,
    has_expand: bool,
    has_skip: bool,
    relu6: bool,
):
    f32 = jnp.float32
    bf = jnp.bfloat16
    HWp = H * Wp
    P = _halo(Wp)
    g = pl.program_id(1)

    def act(v):
        v = jnp.maximum(v, 0.0)
        return jnp.minimum(v, 6.0) if relu6 else v

    # ---- expand chunk: (Ec, HWp) bf16, pad columns forced to zero --------
    if has_expand:
        e = jax.lax.dot_general(
            w1_ref[0], x_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        e = (act(e + b1_ref[0]) * colmask_ref[:]).astype(bf)
    else:
        e = (x_ref[0].astype(f32) * colmask_ref[:]).astype(bf)
    e = jnp.pad(e, ((0, 0), (P, P)))  # tile-aligned zero halo (h edges)

    # ---- 3x3 depthwise: 9 pure lane-shifted FMAs, banded -----------------
    # (band so live f32 temporaries are (Ec, BAND), not (Ec, HWp): whole-
    # image f32 intermediates blew the scoped-VMEM stack)
    BAND = 2560 if HWp >= 2560 else HWp
    for lo in range(0, HWp, BAND):
        size = min(BAND, HWp - lo)
        acc = jnp.zeros((Ec, size), f32)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                s0 = P + lo + dy * Wp + dx  # >= 0 by construction of P
                tap = e[:, s0 : s0 + size].astype(f32)
                t = (dy + 1) * 3 + (dx + 1)
                acc = acc + tap * wd_ref[0, :, t : t + 1]
        d = act(acc + bd_ref[0]).astype(bf)

        p = jax.lax.dot_general(
            w2_ref[0], d, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )

        @pl.when(g == 0)
        def _():
            base = p + b2_ref[:]
            if has_skip:
                base = base + x_ref[0, :, lo : lo + size].astype(f32)
            o_ref[0, :, lo : lo + size] = base

        @pl.when(g > 0)
        def _():
            o_ref[0, :, lo : lo + size] = o_ref[0, :, lo : lo + size] + p


def planar_mbconv(
    x: jnp.ndarray,
    w1: Optional[jnp.ndarray],
    b1: Optional[jnp.ndarray],
    wd: jnp.ndarray,
    bd: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    *,
    H: int,
    W: int,
    skip: bool,
    relu6: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused inverted-residual block, stride 1, row-padded planar layout.

    x: (B, C, H*Wp) with Wp = padded_width(H, W); pad columns are ignored on
    input (re-zeroed internally) and arbitrary on output.
    w1: (1,1,C,E) HWIO or None (expand factor 1); wd: (3,3,1,E);
    w2: (1,1,E,Cout); biases 1-D. Returns (B, Cout, H*Wp) in x.dtype.
    """
    b, c, hwp = x.shape
    wp = padded_width(H, W)
    assert hwp == H * wp, (hwp, H, W, wp)
    e = wd.shape[-1]
    cout = w2.shape[-1]
    has_expand = w1 is not None
    if not has_expand:
        assert e == c, (e, c)
    if skip:
        assert c == cout, (c, cout)
        assert has_expand, "skip without expand unsupported (x is chunked)"

    bf = jnp.bfloat16
    f32 = jnp.float32
    ec = _pick_chunk(e, c if has_expand else 0, cout, hwp, _halo(wp))
    gchunks = e // ec

    if has_expand:
        w1b = w1.reshape(c, e).T.reshape(gchunks, ec, c).astype(bf)
        b1b = b1.reshape(gchunks, ec, 1).astype(f32)
        x_spec = pl.BlockSpec(
            (1, c, hwp), lambda i, g: (i, 0, 0), memory_space=pltpu.VMEM
        )
    else:
        w1b = jnp.zeros((1, 1, 1), bf)
        b1b = jnp.zeros((1, 1, 1), f32)
        x_spec = pl.BlockSpec(
            (1, ec, hwp), lambda i, g: (i, g, 0), memory_space=pltpu.VMEM
        )
    wdb = wd.reshape(9, e).T.reshape(gchunks, ec, 9).astype(f32)
    bdb = bd.reshape(gchunks, ec, 1).astype(f32)
    w2b = (
        w2.reshape(e, cout).T.reshape(cout, gchunks, ec)
        .transpose(1, 0, 2)
        .astype(bf)
    )
    b2b = b2.reshape(cout, 1).astype(f32)
    col = jnp.arange(hwp, dtype=jnp.int32) % wp
    colmask = (col < W).astype(f32).reshape(1, hwp)

    kernel = functools.partial(
        _kernel,
        Ec=ec,
        H=H,
        Wp=wp,
        has_expand=has_expand,
        has_skip=skip,
        relu6=relu6,
    )
    chunked = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i, g: (g,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    out_f32 = pl.pallas_call(
        kernel,
        grid=(b, gchunks),
        in_specs=[
            x_spec,
            chunked((ec, c) if has_expand else (1, 1)),
            chunked((ec, 1) if has_expand else (1, 1)),
            chunked((ec, 9)),
            chunked((ec, 1)),
            chunked((cout, ec)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, cout, hwp), lambda i, g: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, cout, hwp), f32),
        # v5e has 128MiB of physical VMEM; the conservative 16MB scoped
        # default rejects the resident whole-image buffers at 320^2
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(x, w1b, b1b, wdb, bdb, w2b, b2b, colmask)
    return out_f32.astype(x.dtype)


def _chain_kernel(*refs, specs, H, Wp, relu6):
    """N stride-1 inverted-residual blocks on one VMEM-resident image.

    refs: x_ref, then 6 refs per block (w1,b1,wd,bd,w2,b2; dummies when the
    block has no expand), then colmask_ref, then o_ref.
    Whole-image compute (no banding): only used at resolutions where the
    largest expanded activation fits VMEM comfortably (<= ~88x88 rows).
    """
    f32 = jnp.float32
    bf = jnp.bfloat16
    HWp = H * Wp
    P = _halo(Wp)
    x_ref = refs[0]
    colmask_ref = refs[-2]
    o_ref = refs[-1]

    def act(v):
        v = jnp.maximum(v, 0.0)
        return jnp.minimum(v, 6.0) if relu6 else v

    v = x_ref[0]
    for i, (has_expand, has_skip) in enumerate(specs):
        w1_ref, b1_ref, wd_ref, bd_ref, w2_ref, b2_ref = refs[1 + 6 * i : 7 + 6 * i]
        if has_expand:
            e = jax.lax.dot_general(
                w1_ref[:], v, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            e = (act(e + b1_ref[:]) * colmask_ref[:]).astype(bf)
        else:
            e = (v.astype(f32) * colmask_ref[:]).astype(bf)
        e = jnp.pad(e, ((0, 0), (P, P)))
        Ec = e.shape[0]
        acc = jnp.zeros((Ec, HWp), f32)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                s0 = P + dy * Wp + dx
                t = (dy + 1) * 3 + (dx + 1)
                acc = acc + e[:, s0 : s0 + HWp].astype(f32) * wd_ref[:, t : t + 1]
        d = act(acc + bd_ref[:]).astype(bf)
        p = jax.lax.dot_general(
            w2_ref[:], d, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )
        p = p + b2_ref[:]
        if has_skip:
            p = p + v.astype(f32)
        v = p.astype(bf)
    o_ref[0] = v


def planar_mbconv_chain(
    x: jnp.ndarray,
    blocks,
    *,
    H: int,
    W: int,
    relu6: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run N consecutive stride-1 inverted-residual blocks as ONE Pallas call.

    Motivation (measured): at bs32 the late backbone (40^2/20^2, 11 blocks =
    ~66 XLA ops of tiny work each) is dominated by per-op fixed cost — the
    bs32 program carries ~7ms of batch-size-independent overhead. Collapsing
    a segment into one kernel removes the per-op cost; Mosaic's lane-shift
    depthwise inefficiency doesn't matter at these sizes because the
    arithmetic is negligible.

    x: (B, C0, H*Wp) planar; blocks: sequence of dicts with HWIO weights
    {w1 (1,1,C,E) or None, b1, wd (3,3,1,E), bd, w2 (1,1,E,Co), b2,
    skip: bool}. Returns (B, C_last, H*Wp) bf16.
    """
    b, c0, hwp = x.shape
    wp = padded_width(H, W)
    assert hwp == H * wp, (hwp, H, W, wp)
    bf = jnp.bfloat16
    f32 = jnp.float32

    args, in_specs, specs = [x], [
        pl.BlockSpec((1, c0, hwp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ], []
    vm = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    c = c0
    for blk in blocks:
        e = blk["wd"].shape[-1]
        cout = blk["w2"].shape[-1]
        has_expand = blk["w1"] is not None
        if not has_expand:
            assert e == c, (e, c)
        # VMEM sanity: expanded + f32 accumulator for this block
        assert e * hwp * 6 < 48 * 1024 * 1024, (e, hwp)
        specs.append((has_expand, bool(blk["skip"])))
        if has_expand:
            args += [
                blk["w1"].reshape(c, e).T.astype(bf),
                blk["b1"].reshape(e, 1).astype(f32),
            ]
        else:
            args += [jnp.zeros((1, 1), bf), jnp.zeros((1, 1), f32)]
        args += [
            blk["wd"].reshape(9, e).T.astype(f32),
            blk["bd"].reshape(e, 1).astype(f32),
            blk["w2"].reshape(e, cout).T.astype(bf),
            blk["b2"].reshape(cout, 1).astype(f32),
        ]
        in_specs += [vm()] * 6
        c = cout
    col = jnp.arange(hwp, dtype=jnp.int32) % wp
    args.append((col < W).astype(f32).reshape(1, hwp))
    in_specs.append(vm())

    kernel = functools.partial(
        _chain_kernel, specs=specs, H=H, Wp=wp, relu6=relu6
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, c, hwp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, c, hwp), bf),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)


def planar_from_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> row-padded planar (B, C, H*Wp). One XLA pass
    (transpose+pad fuse); pad columns are zero-filled."""
    b, h, w, c = x.shape
    wp = padded_width(h, w)
    xt = x.transpose(0, 3, 1, 2)
    xt = jnp.pad(xt, ((0, 0), (0, 0), (0, 0), (0, wp - w)))
    return xt.reshape(b, c, h * wp)


def nhwc_from_planar(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Row-padded planar (B, C, H*Wp) -> (B, H, W, C); drops pad columns."""
    b, c, _ = x.shape
    wp = padded_width(h, w)
    return x.reshape(b, c, h, wp)[..., :w].transpose(0, 2, 3, 1)


def mbconv_reference_planar(x, w1, b1, wd, bd, w2, b2, *, H, W, skip, relu6=True):
    """Plain-XLA NHWC reference with identical math, for property tests.
    Returns row-padded planar with zeroed pad columns."""
    from tpucenterface.ops.fused_mbconv import mbconv_reference

    xn = nhwc_from_planar(x, H, W)
    c = xn.shape[-1]
    e = wd.shape[-1]
    y = mbconv_reference(
        xn,
        None if w1 is None else w1.reshape(c, e),
        None if w1 is None else b1,
        wd.reshape(3, 3, e),
        bd,
        w2.reshape(e, w2.shape[-1]),
        b2,
        skip=skip,
        relu6=relu6,
    )
    return planar_from_nhwc(y)
