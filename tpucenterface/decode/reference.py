"""Golden pure-jnp CenterNet decode (SURVEY.md §2 C4, §3.1 [K][B]).

The canonical ctdet decode pipeline, capability-equivalent to the reference's
`_nms` / `_topk` / `_gather_feat` / `ctdet_decode` chain but written as a
single functional jnp program that XLA fuses device-side (no host round trip):

    scores = sigmoid(hm)
    keep   = (maxpool3x3(scores) == scores)          # pseudo-NMS peak mask
    top-k over the flattened masked map               # peak extraction
    gather wh/off at peaks -> corner boxes * stride   # box recovery

Used as the property-test oracle for the fused Pallas kernel and as the
fallback on non-TPU backends.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from tpucenterface.config import DecodeConfig


def pseudo_nms(scores: jnp.ndarray) -> jnp.ndarray:
    """3x3 max-pool peak mask: keep positions that are their own 3x3 maximum.

    scores: (B, H, W) probabilities — channel-free on purpose: a trailing
    size-1 channel dim puts the whole map into 1/128 of the VPU lanes on TPU
    (measured 160x slower). Ties on plateaus keep all tied cells — matching
    the torch `hmax == hm` semantics.
    """
    # Separable shifted-max (two 3-tap passes) instead of reduce_window: same
    # result, but lowers to plain VPU maximum ops that fuse with neighbors
    # (reduce_window compiles to a standalone window op that resists fusion).
    p = jnp.pad(scores, ((0, 0), (1, 1), (0, 0)), constant_values=-jnp.inf)
    v = jnp.maximum(jnp.maximum(p[:, :-2], p[:, 1:-1]), p[:, 2:])
    p = jnp.pad(v, ((0, 0), (0, 0), (1, 1)), constant_values=-jnp.inf)
    hmax = jnp.maximum(jnp.maximum(p[..., :-2], p[..., 1:-1]), p[..., 2:])
    return jnp.where(hmax == scores, scores, 0.0)


def decode_feats(
    feats: Dict[str, jnp.ndarray],
    cfg: DecodeConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode head maps to (boxes, scores) in model-input pixel coordinates.

    feats['hm']:  (B, H, W, 1) logits (f32)
    feats['wh']:  (B, H, W, 2)
    feats['off']: (B, H, W, 2)
    Returns boxes (B, K, 4) [x1,y1,x2,y2] in input pixels, scores (B, K).
    If feats has 'lm', also returns landmarks via decode_landmarks (separate fn).
    """
    boxes, scores, _ = decode_feats_with_idx(feats, cfg)
    return boxes, scores


def topk_2stage(
    flat: jnp.ndarray, k: int, chunk: Optional[int] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact-by-value two-stage top-k over (B, N).

    lax.top_k at (bs32, N=25600, K=200) measures 0.79ms on v5e — 5% of the
    whole detect program; this runs 0.17ms (chunk=8), decode 0.95 -> 0.42ms.
    Stage 1 takes per-chunk maxima (N/chunk values),
    stage 2 top-k's the chunks, stage 3 gathers the K winning chunks' cells
    (K*chunk candidates) and top-k's those. Any cell strictly greater than
    the true k-th value lives in one of at most k-1 chunks, so the k winning
    chunks contain every such cell: values returned are EXACTLY lax.top_k's.

    Only the ORDER among cells whose scores are exactly equal can differ from
    lax.top_k's lowest-index-first rule (chunk rank, not flat index, breaks
    ties here). Real score maps are tie-free apart from plateaus of identical
    logits; the maxpool pseudo-NMS semantics don't depend on this order.
    """
    b, n = flat.shape
    if chunk is None:
        # chunk=8 for every measured regime: an ISOLATED decode probe said
        # chunk=16 wins at K<=128 (0.585 -> 0.577 ms bs128), but in the
        # full program it loses 0.16 ms (25.58 -> 25.74 ms e2e) — fusion
        # context flips the verdict; keep the e2e-measured choice
        chunk = 8
    if n % chunk or n // chunk <= k:
        return jax.lax.top_k(flat, k)
    m = n // chunk
    chunks = flat.reshape(b, m, chunk)
    cmax = chunks.max(axis=-1)                     # (B, M)
    _, cidx = jax.lax.top_k(cmax, k)               # (B, K) winning chunks
    cand = jnp.take_along_axis(chunks, cidx[..., None], axis=1)  # (B, K, chunk)
    cand_idx = cidx[..., None] * chunk + jnp.arange(chunk)[None, None, :]
    vals, pos = jax.lax.top_k(cand.reshape(b, k * chunk), k)
    idx = jnp.take_along_axis(cand_idx.reshape(b, k * chunk), pos, axis=1)
    return vals, idx


def decode_feats_with_idx(
    feats: Dict[str, jnp.ndarray],
    cfg: DecodeConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """As `decode_feats` but also returns the flat peak indices (B, K),
    needed by the optional landmark gather."""
    hm, wh, off = feats["hm"], feats["wh"], feats["off"]
    b, h, w, _ = hm.shape
    k = min(cfg.max_dets, h * w)  # tiny buckets: K can't exceed the map

    scores = jax.nn.sigmoid(hm[..., 0])          # (B, H, W) single face class
    peaks = pseudo_nms(scores)
    flat = peaks.reshape(b, h * w)
    if cfg.fast_topk:
        top_scores, top_idx = topk_2stage(flat, k)
    else:
        top_scores, top_idx = jax.lax.top_k(flat, k)  # (B, K)

    ys = (top_idx // w).astype(jnp.float32)
    xs = (top_idx % w).astype(jnp.float32)

    if "whoff" in feats:
        # fused-head models expose wh+off as one contiguous (B, H, W, 4)
        # view: ONE gather for all box params (two separate gathers measure
        # ~0.38ms at bs128 @640; this halves that)
        g = jnp.take_along_axis(
            feats["whoff"].reshape(b, h * w, 4), top_idx[..., None], axis=1
        )
        wh_g, off_g = g[..., 0:2], g[..., 2:4]
    else:
        wh_flat = wh.reshape(b, h * w, 2)
        off_flat = off.reshape(b, h * w, 2)
        wh_g = jnp.take_along_axis(wh_flat, top_idx[..., None], axis=1)  # (B, K, 2)
        off_g = jnp.take_along_axis(off_flat, top_idx[..., None], axis=1)

    cx = xs + off_g[..., 0]
    cy = ys + off_g[..., 1]
    if cfg.wh_log:
        bw = jnp.exp(wh_g[..., 0])
        bh = jnp.exp(wh_g[..., 1])
    else:
        # clamp: an (untrained) wh head can emit negative sizes, which would
        # produce inverted x1>x2 boxes; trained models are unaffected
        bw = jnp.maximum(wh_g[..., 0], 0.0)
        bh = jnp.maximum(wh_g[..., 1], 0.0)

    s = float(cfg.stride)
    boxes = jnp.stack(
        [
            (cx - bw / 2.0) * s,
            (cy - bh / 2.0) * s,
            (cx + bw / 2.0) * s,
            (cy + bh / 2.0) * s,
        ],
        axis=-1,
    )
    return boxes, top_scores, top_idx


def decode_landmarks(
    feats: Dict[str, jnp.ndarray],
    top_idx: jnp.ndarray,
    cfg: DecodeConfig,
) -> jnp.ndarray:
    """Gather the optional 5-point landmark head at peak indices -> (B,K,5,2) px."""
    lm = feats["lm"]
    b, h, w, c = lm.shape
    lm_flat = lm.reshape(b, h * w, c)
    lm_g = jnp.take_along_axis(lm_flat, top_idx[..., None], axis=1)
    ys = (top_idx // w).astype(jnp.float32)
    xs = (top_idx % w).astype(jnp.float32)
    pts = lm_g.reshape(b, -1, 5, 2)
    s = float(cfg.stride)
    return jnp.stack(
        [(xs[..., None] + pts[..., 0]) * s, (ys[..., None] + pts[..., 1]) * s],
        axis=-1,
    )


def landmarks_to_original(
    lm: jnp.ndarray,
    scale: jnp.ndarray,
    pad_xy: jnp.ndarray,
    orig_hw: jnp.ndarray,
) -> jnp.ndarray:
    """Inverse letterbox for landmark points (..., 5, 2) [x, y]."""
    out = (lm - pad_xy.astype(lm.dtype)) / scale
    h = orig_hw[0].astype(lm.dtype)
    w = orig_hw[1].astype(lm.dtype)
    return jnp.clip(out, 0.0, jnp.stack([w, h]))


def boxes_to_original(
    boxes: jnp.ndarray,
    scale: jnp.ndarray,
    pad_xy: jnp.ndarray,
    orig_hw: jnp.ndarray,
) -> jnp.ndarray:
    """Inverse letterbox: model-input pixel boxes -> original image coords.

    boxes: (..., 4) [x1,y1,x2,y2]; scale: scalar letterbox scale;
    pad_xy: (2,) [pad_x, pad_y] letterbox offset; orig_hw: (2,) [h, w].
    Runs device-side (part of the jitted detect program).
    """
    pad = jnp.concatenate([pad_xy, pad_xy]).astype(boxes.dtype)
    out = (boxes - pad) / scale
    h = orig_hw[0].astype(boxes.dtype)
    w = orig_hw[1].astype(boxes.dtype)
    lim = jnp.stack([w, h, w, h])
    return jnp.clip(out, 0.0, lim)
