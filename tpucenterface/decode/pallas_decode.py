"""Fused Pallas TPU decode kernel (SURVEY.md §7 M2, BASELINE north-star).

One kernel per batch element (grid=(B,)) performs the ENTIRE decode that the
reference spreads over `_nms`/`_topk`/`_gather_feat`/`ctdet_decode`:

    sigmoid(hm) -> 3x3 max-window peak mask -> exact top-K -> gather wh/off
    -> corner boxes in input pixels

all inside VMEM, with no intermediate HBM round trips and no XLA sort.

Top-K design (the hard part per SURVEY.md §7): a full descending sort of H*W
scores is what makes XLA's `top_k` expensive. Instead we keep a per-row max
cache (H scalars) and run K rounds of:
    argmax over the row cache -> argmax within that single row ->
    emit (score, index, box), knock the cell out, refresh that row's max.
Each round touches O(H + W) lanes instead of O(H*W). Tie-breaking matches
`jax.lax.top_k` (lowest flat index wins), which the property tests rely on.

Mosaic/TPU constraints shaping the implementation (learned the hard way):
- a (1,H,W,2) block pads the 2-wide channel dim to 128 lanes (13MB at
  H=W=160) -> wh/off are fed as four separate (B,H,W) planes instead.
- dynamic indices are allowed on sublane/outer dims but NOT the lane dim ->
  row reads use `ref[pl.ds(r,1), :]`; the within-row element at column c is
  extracted by a masked lane reduction (sum(row * onehot(c))), and per-round
  results accumulate into loop-carried (1,K) vectors via one-hot lane masks.
- boxes are emitted as a (1,4,K) block (static stores, one row per corner)
  and transposed to (B,K,4) outside the kernel (XLA fuses the transpose).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucenterface.config import DecodeConfig


def _decode_kernel(
    hm_ref,      # (1, H, W) f32 logits
    whx_ref,     # (1, H, W) f32
    why_ref,     # (1, H, W) f32
    offx_ref,    # (1, H, W) f32
    offy_ref,    # (1, H, W) f32
    boxes_ref,   # (1, 4, K) f32 out: rows x1,y1,x2,y2
    scores_ref,  # (1, 1, K) f32 out
    idx_ref,     # (1, 1, K) i32 out
    padded,      # (H+2, W+2) f32 scratch
    peaks,       # (H, W) f32 scratch
    row_max,     # (H, 1) f32 scratch
    *,
    K: int,
    H: int,
    W: int,
    stride: float,
    wh_log: bool,
):
    scores = jax.nn.sigmoid(hm_ref[0])

    # ---- 3x3 max-window pseudo-NMS with a -inf halo ----
    padded[:] = jnp.full((H + 2, W + 2), -jnp.inf, jnp.float32)
    padded[1 : H + 1, 1 : W + 1] = scores
    hmax = padded[0:H, 0:W]
    for dy in range(3):
        for dx in range(3):
            if dy == 0 and dx == 0:
                continue
            hmax = jnp.maximum(hmax, padded[dy : dy + H, dx : dx + W])
    peaks[:] = jnp.where(hmax == scores, scores, 0.0)
    row_max[:] = jnp.max(peaks[:], axis=1, keepdims=True)

    out_lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    col_lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)

    def _row_at(ref, r):
        return ref[0, pl.ds(r, 1), :]  # (1, W), dynamic-sublane read

    # ---- K rounds of hierarchical exact argmax ----
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0)

    def body(i, carry):
        sv, iv, x1v, y1v, x2v, y2v = carry
        rm = row_max[:]                       # (H, 1)
        g = jnp.max(rm)
        # first-index tie-break (Mosaic argmax tie order is unspecified; this
        # must match jax.lax.top_k's lowest-flat-index-wins for parity)
        r = jnp.min(jnp.where(rm == g, row_iota, H)).astype(jnp.int32)
        row = peaks[pl.ds(r, 1), :]           # (1, W)
        c = jnp.min(jnp.where(row == g, col_lane, W)).astype(jnp.int32)
        chit = col_lane == c                  # one-hot column mask

        def _pick(ref):
            return jnp.sum(jnp.where(chit, _row_at(ref, r), 0.0))

        cx = c.astype(jnp.float32) + _pick(offx_ref)
        cy = r.astype(jnp.float32) + _pick(offy_ref)
        bw, bh = _pick(whx_ref), _pick(why_ref)
        if wh_log:
            bw, bh = jnp.exp(bw), jnp.exp(bh)
        else:
            bw = jnp.maximum(bw, 0.0)  # match golden's negative-size clamp
            bh = jnp.maximum(bh, 0.0)

        hit = out_lane == i                   # one-hot accumulate (no dynamic
        sv = jnp.where(hit, g, sv)            # lane-dim stores on TPU)
        iv = jnp.where(hit, r * W + c, iv)
        x1v = jnp.where(hit, (cx - bw * 0.5) * stride, x1v)
        y1v = jnp.where(hit, (cy - bh * 0.5) * stride, y1v)
        x2v = jnp.where(hit, (cx + bw * 0.5) * stride, x2v)
        y2v = jnp.where(hit, (cy + bh * 0.5) * stride, y2v)

        # knock out the emitted cell (masked in-row write); refresh row max
        new_row = jnp.where(chit, -1.0, row)
        peaks[pl.ds(r, 1), :] = new_row
        row_max[pl.ds(r, 1), :] = jnp.max(new_row, axis=1, keepdims=True)
        return sv, iv, x1v, y1v, x2v, y2v

    zf = jnp.zeros((1, K), jnp.float32)
    sv, iv, x1v, y1v, x2v, y2v = jax.lax.fori_loop(
        0, K, body, (zf, jnp.zeros((1, K), jnp.int32), zf, zf, zf, zf)
    )
    scores_ref[0] = sv
    idx_ref[0] = iv
    boxes_ref[0, 0:1, :] = x1v
    boxes_ref[0, 1:2, :] = y1v
    boxes_ref[0, 2:3, :] = x2v
    boxes_ref[0, 3:4, :] = y2v


def decode_feats_pallas(
    feats: Dict[str, jnp.ndarray],
    cfg: DecodeConfig,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused decode; drop-in for `decode.reference.decode_feats`.

    feats['hm'] (B,H,W,1) f32 logits, feats['wh']/'off' (B,H,W,2) f32.
    Returns (boxes (B,K,4) in input pixels, scores (B,K)).
    """
    hm = feats["hm"][..., 0].astype(jnp.float32)
    wh = feats["wh"].astype(jnp.float32)
    off = feats["off"].astype(jnp.float32)
    b, h, w = hm.shape
    k = cfg.max_dets

    kernel = functools.partial(
        _decode_kernel, K=k, H=h, W=w, stride=float(cfg.stride), wh_log=cfg.wh_log
    )
    plane = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    boxes4, scores, _idx = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[plane] * 5,
        out_specs=[
            pl.BlockSpec((1, 4, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 4, k), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, k), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((h + 2, w + 2), jnp.float32),
            pltpu.VMEM((h, w), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
        ],
        interpret=interpret,
    )(hm, wh[..., 0], wh[..., 1], off[..., 0], off[..., 1])
    return jnp.moveaxis(boxes4, 1, 2), scores[:, 0, :]
