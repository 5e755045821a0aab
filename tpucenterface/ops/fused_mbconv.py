"""Fused MobileNetV2 inverted-residual block as one Pallas TPU kernel.

Motivation (measured on v5e, bs32 @640): the backbone's high-resolution
blocks dominate forward time because every block round-trips its 6x-expanded
activation (e.g. 96ch @320^2 = 630MB/batch) through HBM — XLA does not fuse
conv->conv. This kernel runs

    1x1 expand (MXU) -> bias+ReLU6 -> 3x3 depthwise stride 1 (VPU, 9 shifted
    MACs) -> bias+ReLU6 -> 1x1 project (MXU) -> bias [-> +skip]

entirely in VMEM over row-bands of the image, so HBM traffic is just the
input band (with 1-row halos) plus the output band.

Implementation notes:
- Overlapping (halo'd) input bands cannot be expressed with BlockSpecs, so
  the input stays in HBM (`memory_space=ANY`) and each grid step DMAs its
  band into a VMEM scratch, double-buffered so the next band's DMA overlaps
  this band's compute.
- The caller pre-pads the image spatially by 1 (zeros), removing all boundary
  conditionals from the kernel.
- stride-2 blocks are not handled (strided lane access is awkward in Mosaic);
  the model runs its 3 stride-2 blocks through XLA convs.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    x_hbm,      # (B, H+2, W2P, Cin) in HBM/ANY; W2P = W+2 rounded up to 8
                #   (the sublane dim of the tiled HBM layout must be 8-aligned)
    w1_ref,     # (Cin, Ce) VMEM ((1,1) dummy when no expand)
    b1_ref,     # (1, Ce)
    wd_ref,     # (9, Ce) depthwise taps, row-major dy*3+dx
    bd_ref,     # (1, Ce)
    w2_ref,     # (Ce, Cout)
    b2_ref,     # (1, Cout)
    o_ref,      # (1, TH, W, Cout) VMEM out block
    xband,      # (2, TH+2, W2P, Cin) VMEM scratch (double buffer)
    sem,        # DMA semaphores (2,)
    *,
    TH: int,
    W: int,
    Cin: int,
    Ce: int,
    Cout: int,
    has_expand: bool,
    has_skip: bool,
    relu6: bool,
    NB: int,    # number of row-bands (grid dim 1 size)
    W2P: int,   # padded row width (W+2 rounded up to a multiple of 8)
):
    bi = pl.program_id(0)
    r = pl.program_id(1)
    g = bi * NB + r  # linear step index

    def band_dma(slot, b_idx, r_idx):
        return pltpu.make_async_copy(
            x_hbm.at[b_idx, pl.ds(r_idx * TH, TH + 2)],
            xband.at[slot],
            sem.at[slot],
        )

    # warm-up: first step starts its own DMA
    @pl.when(g == 0)
    def _():
        band_dma(0, bi, r).start()

    # start next band's DMA (crossing into the next batch element if needed)
    nxt = g + 1
    nb_i = nxt // NB
    nb_r = nxt % NB

    @pl.when(nxt < pl.num_programs(0) * NB)
    def _():
        band_dma(nxt % 2, nb_i, nb_r).start()

    band_dma(g % 2, bi, r).wait()
    xb = xband[g % 2]  # (TH+2, W2P, Cin)

    f32 = jnp.float32

    def act(v):
        v = jnp.maximum(v, 0.0)
        return jnp.minimum(v, 6.0) if relu6 else v

    # ---- 1x1 expand on the MXU (whole band incl. halo) ----
    if has_expand:
        xe = xb.reshape((TH + 2) * W2P, Cin)
        e = jax.lax.dot_general(
            xe, w1_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=f32
        )
        e = act(e + b1_ref[:].astype(f32)).astype(jnp.bfloat16)
        e = e.reshape(TH + 2, W2P, Ce)
        # The spatial zero-padding must stay ZERO after expand (act(bias) != 0
        # at padded positions would leak into the depthwise taps). Halo rows
        # of interior bands are real neighbor data — mask only true borders.
        # (3D iotas: Mosaic can't minor-dim-unsqueeze an i1 mask)
        col = jax.lax.broadcasted_iota(jnp.int32, (TH + 2, W2P, Ce), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (TH + 2, W2P, Ce), 0)
        is_pad = (col == 0) | (col >= W + 1)
        is_pad = is_pad | ((row == 0) & (r == 0))
        is_pad = is_pad | ((row == TH + 1) & (r == NB - 1))
        e = jnp.where(is_pad, jnp.bfloat16(0), e)
    else:
        e = xb

    # ---- 3x3 depthwise stride 1: 9 shifted MACs on the VPU ----
    acc = jnp.zeros((TH, W, Ce), f32)
    for dy in range(3):
        for dx in range(3):
            tap = wd_ref[dy * 3 + dx, :].astype(f32)
            acc = acc + e[dy : dy + TH, dx : dx + W, :].astype(f32) * tap
    acc = act(acc + bd_ref[0, :].astype(f32))

    # ---- 1x1 project on the MXU ----
    p = jax.lax.dot_general(
        acc.reshape(TH * W, Ce).astype(jnp.bfloat16),
        w2_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    p = p + b2_ref[:].astype(f32)
    if has_skip:
        p = p + xb[1 : 1 + TH, 1 : 1 + W, :].reshape(TH * W, Cin).astype(f32)
    o_ref[0] = p.reshape(TH, W, Cout).astype(o_ref.dtype)


def _pick_band(h: int, w: int, ce: int) -> int:
    """Output-row band height: divide H; keep band buffers within ~4MB VMEM."""
    budget = 4 * 1024 * 1024
    best = None
    for th in (32, 20, 16, 10, 8, 5, 4, 2):
        if h % th:
            continue
        bytes_needed = (th + 2) * (w + 2) * max(ce, 128) * 2 * 3
        if bytes_needed <= budget:
            return th
        best = best or th
    return best or h


def fused_mbconv(
    x: jnp.ndarray,
    w1: Optional[jnp.ndarray],
    b1: Optional[jnp.ndarray],
    wd: jnp.ndarray,
    bd: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    *,
    skip: bool,
    relu6: bool = True,
    band: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused inverted-residual block, stride 1.

    x: (B, H, W, Cin). w1: (Cin, Ce) or None (expand factor 1, Ce == Cin).
    wd: (3, 3, Ce); w2: (Ce, Cout); biases 1-D. Returns (B, H, W, Cout).
    """
    b, h, w, cin = x.shape
    ce = wd.shape[-1]
    cout = w2.shape[-1]
    has_expand = w1 is not None
    if not has_expand:
        assert ce == cin, (ce, cin)
    th = band or _pick_band(h, w, ce)
    assert h % th == 0, (h, th)
    nb = h // th

    bf = jnp.bfloat16
    w2p = -(-(w + 2) // 8) * 8  # sublane alignment for the HBM band DMA
    xp = jnp.pad(x.astype(bf), ((0, 0), (1, 1), (1, w2p - (w + 1)), (0, 0)))
    if has_expand:
        w1b = w1.reshape(cin, ce).astype(bf)
        b1b = b1.reshape(1, ce).astype(bf)
    else:
        w1b = jnp.zeros((1, 1), bf)
        b1b = jnp.zeros((1, 1), bf)
    wdb = wd.reshape(9, ce).astype(bf)
    bdb = bd.reshape(1, ce).astype(bf)
    w2b = w2.reshape(ce, cout).astype(bf)
    b2b = b2.reshape(1, cout).astype(bf)

    kernel = functools.partial(
        _kernel,
        TH=th,
        W=w,
        Cin=cin,
        Ce=ce,
        Cout=cout,
        has_expand=has_expand,
        has_skip=skip,
        relu6=relu6,
        NB=nb,
        W2P=w2p,
    )
    vm = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b, nb),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [vm()] * 6,
        out_specs=pl.BlockSpec(
            (1, th, w, cout), lambda i, r: (i, r, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, w2p, cin), bf),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, w1b, b1b, wdb, bdb, w2b, b2b)
    return out


def mbconv_reference(
    x, w1, b1, wd, bd, w2, b2, *, skip: bool, relu6: bool = True
) -> jnp.ndarray:
    """Plain-XLA reference (same math) for property tests and fallback."""
    f32 = jnp.float32

    def act(v):
        v = jnp.maximum(v, 0.0)
        return jnp.minimum(v, 6.0) if relu6 else v

    y = x.astype(f32)
    if w1 is not None:
        ce = wd.shape[-1]
        y = jax.lax.conv_general_dilated(
            y,
            w1.reshape(1, 1, x.shape[-1], ce).astype(f32),
            (1, 1),
            "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = act(y + b1.astype(f32))
    ce = wd.shape[-1]
    y = jax.lax.conv_general_dilated(
        y,
        wd.reshape(3, 3, 1, ce).astype(f32),
        (1, 1),
        [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=ce,
    )
    y = act(y + bd.astype(f32))
    y = jax.lax.conv_general_dilated(
        y,
        w2.reshape(1, 1, ce, w2.shape[-1]).astype(f32),
        (1, 1),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y + b2.astype(f32)
    if skip:
        y = y + x.astype(f32)
    return y.astype(x.dtype)
