"""Per-section device-time profile of the fused detect path (bs32 @640).

Uses the slope method (bench.timing.op_time_ms) — the only timing that is
honest through the axon relay. Prints a table: preprocess, stem, every
backbone block, neck, heads, decode, plus whole-forward and whole-detect
cross-checks (sections are timed in isolation, so fusion across section
boundaries can make the whole cheaper than the sum).

Usage: python -m tpucenterface.bench.profile_forward [--batch 32] [--size 640]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from tpucenterface.bench.timing import op_time_ms
from tpucenterface.config import DetectorConfig
from tpucenterface.detector import Detector
from tpucenterface.model.backbone import backbone_plan
from tpucenterface.model.blocks import ConvBN, InvertedResidual
from tpucenterface.model.heads import CenterNetHeads
from tpucenterface.model.neck import FPNLiteNeck
from tpucenterface.preprocess import letterbox_normalize_batch


def profile(batch: int = 32, size: int = 640, k_pair=(2, 8), only: str = "") -> dict:
    det = Detector(config=DetectorConfig())
    mcfg = det.config.model
    params = det.variables["params"]
    dtype = jnp.dtype(mcfg.compute_dtype)
    kw = dict(
        relu6=mcfg.relu6,
        bn_eps=mcfg.bn_eps,
        bn_momentum=mcfg.bn_momentum,
        dtype=dtype,
        folded=mcfg.folded,
    )
    rows = {}

    def tm(name, fn, *args):
        if only and only not in name:
            return 0.0
        ms = op_time_ms(fn, *args, k_pair=k_pair)
        rows[name] = ms
        print(f"{name:28s} {ms:8.3f} ms", flush=True)
        return ms

    # --- preprocess -------------------------------------------------------
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 255, (batch, size, size, 3), np.uint8))
    hws = jnp.asarray(np.tile(np.array([[size, size]], np.int32), (batch, 1)))
    ppfn = lambda im: letterbox_normalize_batch(im, hws, size, det.config.preprocess)[0]
    tm("preprocess", ppfn, imgs)

    # --- stem -------------------------------------------------------------
    s = size // 2
    x_in = jnp.asarray(rng.rand(batch, size, size, 3), dtype)
    stem_p = {"params": params["backbone"]["stem"]}
    if mcfg.s2d_stem:
        stem = ConvBN(
            mcfg.width(mcfg.stem_channels),
            kernel=2, stride=1, padding=((1, 0), (1, 0)), **kw,
        )

        def stem_fn(x):
            b, h, w, c = x.shape
            xs = (
                x.reshape(b, h // 2, 2, w // 2, 2, c)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(b, h // 2, w // 2, 4 * c)
            )
            return stem.apply(stem_p, xs, False)

        tm("stem(s2d) @%d->%dx%d" % (size, s, mcfg.width(mcfg.stem_channels)),
           stem_fn, x_in)
    else:
        stem = ConvBN(mcfg.width(mcfg.stem_channels), kernel=3, stride=2, **kw)
        tm("stem  @%d->%dx%d" % (size, s, mcfg.width(mcfg.stem_channels)),
           lambda x: stem.apply(stem_p, x, False), x_in)

    # --- every backbone block in isolation --------------------------------
    plan = backbone_plan(mcfg)
    in_ch = mcfg.width(mcfg.stem_channels)
    res = s
    total_blocks = 0.0
    for i, (t, c, st, out_stride) in enumerate(plan):
        x = jnp.asarray(rng.rand(batch, res, res, in_ch), dtype)
        blk = InvertedResidual(features=c, stride=st, expand=t, **kw)
        bp = {"params": params["backbone"][f"block_{i}"]}
        ms = tm(
            f"block_{i:<2d} t{t} {in_ch:>3d}->{c:<3d} s{st} @{res}",
            lambda x, blk=blk, bp=bp: blk.apply(bp, x, False), x,
        )
        total_blocks += ms
        res //= st
        in_ch = c

    # --- neck --------------------------------------------------------------
    feats = {}
    res, in_ch = s, mcfg.width(mcfg.stem_channels)
    strides_map = {}
    for i, (t, c, st, out_stride) in enumerate(plan):
        res //= st
        strides_map[out_stride] = (res, c)
    feat_arrays = {
        k: jnp.asarray(rng.rand(batch, r, r, c), dtype)
        for k, (r, c) in strides_map.items()
        if k in (4, 8, 16, 32)
    }
    neck = FPNLiteNeck(mcfg)
    neck_p = {"params": params["neck"]}
    tm("neck", lambda f: neck.apply(neck_p, f, False), feat_arrays)

    # --- heads ---------------------------------------------------------------
    r4, c4 = strides_map[4]
    y4 = jnp.asarray(rng.rand(batch, r4, r4, mcfg.fpn_channels), dtype)
    heads = CenterNetHeads(mcfg)
    heads_p = {"params": params["heads"]}
    tm("heads", lambda y: heads.apply(heads_p, y), y4)

    # --- decode ------------------------------------------------------------
    hm = jnp.asarray(rng.rand(batch, r4, r4, 1), jnp.float32)
    wh = jnp.asarray(rng.rand(batch, r4, r4, 2), jnp.float32)
    off = jnp.asarray(rng.rand(batch, r4, r4, 2), jnp.float32)

    def dec(hm):
        return det._decode({"hm": hm, "wh": wh, "off": off})[:2]

    tm("decode", dec, hm)

    # --- cross-checks -------------------------------------------------------
    fwd = lambda x: det._forward(x)
    tm("FULL forward", fwd, x_in)

    bfn_inner = lambda im: det._batch_fn(batch, (size, size), size)(im, hws)
    tm("FULL detect (pp+fwd+dec)", bfn_inner, imgs)
    print(f"{'sum of blocks':28s} {total_blocks:8.3f} ms")
    return rows


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    profile(args.batch, args.size, only=args.only)
