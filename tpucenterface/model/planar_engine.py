"""PlanarEngine: the low-dispatch TPU inference path (round 2).

Measured reality on v5e (bench/profile_forward.py + stagewise timing): at the
contractual bs=32 the detect program carries ~7ms of batch-size-INDEPENDENT
cost — per-op dispatch/fill overhead across ~130 small XLA ops — while the
marginal per-image cost is only ~0.26ms (bs128 slope). The late backbone
(blocks 4..16 at 80^2/40^2/20^2) is ~66 tiny ops; the FPN neck + heads are
another ~14.

This engine runs the same folded weights with a fraction of the ops:
- stem, stride-2 blocks and the high-res blocks 0..3 stay plain XLA convs
  (XLA's conv emitters run those at or near the HBM roofline; both round-1's
  NHWC kernel and round-2's planar kernel measured slower there — see
  PERFORMANCE.md);
- every maximal run of stride-1 blocks at <= `max_chain_res` rows runs as ONE
  fused Pallas call (ops/planar_mbconv.planar_mbconv_chain): blocks 4-5,
  7-12, 14-16 become 3 kernels instead of 66 ops, with expanded activations
  never leaving VMEM;
- neck + heads stay XLA (same math as the flax modules).

Parity: PlanarEngine(folded_variables)(x) == flax CenterFaceNet(folded) within
bf16 tolerance (tests/test_planar_engine.py).

Round-2 follow-up measurements (bs32 @640, v5e, slope method):
- the plain-XLA engine (max_chain_res=0, no algebraic fusion) runs the SAME
  math as the folded flax forward ~0.4ms FASTER in isolation (12.6 vs
  13.0ms) — fusion-boundary luck — but the FULL detect program measures
  IDENTICAL to the flax path (2113 vs 2115 img/s): attaching preprocess +
  decode re-shuffles the fusion boundaries and the gap vanishes. The engine
  is selectable via ModelConfig.inference_engine ('flax' stays default) and
  is wired through Detector._forward.
- BOTH algebraic weight-composition fusions LOSE on v5e and default off:
  fusing block_0.project into block_1.expand costs +0.74ms (the single
  32->96 conv emitter is slower than 32->16 + 16->96 back-to-back), and
  fusing lateral_32 into block_16.project costs +0.39ms. Same counter-
  intuitive emitter behavior as the other ledger entries (PERFORMANCE.md):
  at bs32 XLA's batch-in-lanes emitters prefer skinnier convs.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from tpucenterface.config import ModelConfig
from tpucenterface.model.backbone import backbone_plan
from tpucenterface.ops.planar_mbconv import (
    nhwc_from_planar,
    planar_from_nhwc,
    planar_mbconv_chain,
)


def _conv(x, k, b, stride=1, groups=1, act=True, relu6=True, out_dtype=jnp.bfloat16):
    # bf16 end-to-end epilogue, exactly like the folded flax ConvBN path —
    # an f32 preferred_element_type + f32 bias/clamp epilogue measured
    # +1.5ms/batch32 over the whole net (doubled epilogue bytes).
    kh = k.shape[0]
    p = (kh - 1) // 2
    cdt = jnp.float32 if out_dtype == jnp.float32 else jnp.bfloat16
    y = jax.lax.conv_general_dilated(
        x.astype(cdt),
        k.astype(cdt),
        (stride, stride),
        [(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    y = y + b.astype(cdt)
    if act:
        y = jnp.maximum(y, 0.0)
        if relu6:
            y = jnp.minimum(y, 6.0)
    return y.astype(out_dtype)


class PlanarEngine:
    """Callable inference engine built from folded (optionally fused-head)
    variables; output matches CenterFaceNet(folded=True, fused_heads=...)."""

    def __init__(
        self,
        folded_variables: Dict[str, Any],
        cfg: ModelConfig,
        max_chain_res: int = 0,
        algebraic_fusion: bool = False,
        interpret: bool = False,
    ):
        """max_chain_res=0 disables the Pallas chains — MEASURED SLOWER than
        XLA at every resolution on v5e (the Mosaic depthwise tap loop runs
        4-10x behind XLA's dw emitter in both lane- and sublane-shift form;
        see PERFORMANCE.md round-2 ledger). The chains stay available for
        study (max_chain_res>=20) and are parity-tested.

        algebraic_fusion applies two EXACT weight-composition rewrites:
        - block_0.project (linear 1x1, no skip) folds into block_1.expand:
          one 32->96 conv replaces 32->16 + 16->96, and the 16ch 320^2
          activation (105MB/batch32 of HBM round-trip) vanishes;
        - lateral_32 (1x1 on block_16's output, which nothing else consumes)
          folds into block_16.project: the 1920->320 projection becomes
          1920->fpn_channels, shrinking both compute and the stride-32 map.
        Default False: MEASURED SLOWER on v5e at bs32@640 (+0.74ms and
        +0.39ms respectively — see module docstring); exactness is still
        covered by tests/test_planar_engine.py.
        """
        self.cfg = cfg
        self.dtype = jnp.dtype(cfg.compute_dtype)
        self.max_chain_res = max_chain_res
        self.interpret = interpret
        self.plan = backbone_plan(cfg)
        self.p = jax.tree.map(jnp.asarray, folded_variables["params"])
        self.fused_heads = "fused" in self.p["heads"]
        self.fuse_b0_b1 = False
        self.fuse_top_lateral = False
        if algebraic_fusion:
            self._apply_algebraic_fusion()

    def _apply_algebraic_fusion(self) -> None:
        import numpy as np

        p = jax.tree.map(np.asarray, self.p)
        bb = p["backbone"]
        plan = self.plan
        # -- block_0.project ∘ block_1.expand (both 1x1, linear boundary:
        #    block_0 emits no skip [channel change] and its output feeds
        #    only block_1, whose expand is the first nonlinearity) --
        if (
            len(plan) > 1
            and plan[0][0] == 1 and plan[0][2] == 1      # b0: t=1, s=1
            and plan[1][0] != 1                           # b1 has an expand
            and plan[0][1] != self.cfg.width(self.cfg.stem_channels)  # no skip
        ):
            wp_ = bb["block_0"]["project"]["conv"]["kernel"][0, 0]   # (C0, c1)
            bp_ = bb["block_0"]["project"]["conv"]["bias"]
            we = bb["block_1"]["expand"]["conv"]["kernel"][0, 0]     # (c1, E1)
            be = bb["block_1"]["expand"]["conv"]["bias"]
            w = (wp_ @ we)[None, None]                               # (1,1,C0,E1)
            b = bp_ @ we + be
            bb["block_1"] = dict(bb["block_1"])
            bb["block_1"]["expand"] = {
                "conv": {"kernel": w.astype(np.float32), "bias": b.astype(np.float32)}
            }
            self.fuse_b0_b1 = True
        # -- block_16.project ∘ lateral_32 (project is linear; the top map
        #    feeds only the neck's top lateral) --
        last = len(plan) - 1
        if plan[last][3] == 32 and f"lateral_32" in p["neck"]:
            blk = bb[f"block_{last}"]
            wp_ = blk["project"]["conv"]["kernel"][0, 0]             # (E, 320)
            bp_ = blk["project"]["conv"]["bias"]
            wl = p["neck"]["lateral_32"]["conv"]["kernel"][0, 0]     # (320, 24)
            bl = p["neck"]["lateral_32"]["conv"]["bias"]
            w = (wp_ @ wl)[None, None]
            b = bp_ @ wl + bl
            bb[f"block_{last}"] = dict(blk)
            bb[f"block_{last}"]["project"] = {
                "conv": {"kernel": w.astype(np.float32), "bias": b.astype(np.float32)}
            }
            self.fuse_top_lateral = True
        self.p = jax.tree.map(jnp.asarray, p)

    def _block_weights(self, i: int, t: int) -> Dict[str, Any]:
        blk = self.p["backbone"][f"block_{i}"]
        return {
            "w1": blk["expand"]["conv"]["kernel"] if t != 1 else None,
            "b1": blk["expand"]["conv"]["bias"] if t != 1 else None,
            "wd": blk["depthwise"]["conv"]["kernel"],
            "bd": blk["depthwise"]["conv"]["bias"],
            "w2": blk["project"]["conv"]["kernel"],
            "b2": blk["project"]["conv"]["bias"],
        }

    def _xla_block(self, y, i: int, t: int, s: int, has_skip: bool):
        blk = self.p["backbone"][f"block_{i}"]
        r6 = self.cfg.relu6
        dt = self.dtype
        z = y
        if t != 1:
            z = _conv(z, blk["expand"]["conv"]["kernel"],
                      blk["expand"]["conv"]["bias"], relu6=r6, out_dtype=dt)
        e = blk["depthwise"]["conv"]["kernel"].shape[-1]
        z = _conv(z, blk["depthwise"]["conv"]["kernel"],
                  blk["depthwise"]["conv"]["bias"], stride=s, groups=e,
                  relu6=r6, out_dtype=dt)
        z = _conv(z, blk["project"]["conv"]["kernel"],
                  blk["project"]["conv"]["bias"], act=False, out_dtype=dt)
        return y + z if has_skip else z

    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        bb = self.p["backbone"]
        r6 = cfg.relu6
        dt = self.dtype
        y = _conv(x.astype(dt), bb["stem"]["conv"]["kernel"],
                  bb["stem"]["conv"]["bias"], stride=2, relu6=r6, out_dtype=dt)

        feats: Dict[int, jnp.ndarray] = {}
        cin = cfg.width(cfg.stem_channels)
        i = 0
        n = len(self.plan)
        while i < n:
            t, c, s, out_stride = self.plan[i]
            h = y.shape[1]
            if i == 0 and self.fuse_b0_b1:
                # block_0 runs depthwise-only; its (linear) projection lives
                # inside block_1's expand now. cin stays at the stem width.
                blk = self.p["backbone"]["block_0"]
                e = blk["depthwise"]["conv"]["kernel"].shape[-1]
                y = _conv(y, blk["depthwise"]["conv"]["kernel"],
                          blk["depthwise"]["conv"]["bias"], stride=1,
                          groups=e, relu6=r6, out_dtype=dt)
                i += 1
                continue
            # maximal run of stride-1 blocks at a kernel-friendly resolution
            if s == 1 and h <= self.max_chain_res:
                run = []
                cin_run = cin
                j = i
                while j < n and self.plan[j][2] == 1:
                    tj, cj, _, _ = self.plan[j]
                    blk = self._block_weights(j, tj)
                    blk["skip"] = cin_run == cj
                    run.append(blk)
                    cin_run = cj
                    j += 1
                yp = planar_from_nhwc(y)
                yp = planar_mbconv_chain(
                    yp, run, H=h, W=y.shape[2], relu6=r6,
                    interpret=self.interpret,
                )
                y = nhwc_from_planar(yp, h, y.shape[2])
                for jj in range(i, j):
                    tj, cj, sj, osj = self.plan[jj]
                    cin = cj
                i = j
            else:
                has_skip = s == 1 and cin == c
                y = self._xla_block(y, i, t, s, has_skip)
                cin = c
                i += 1
            # record skip features exactly like MobileNetV2Backbone
            t2, c2, s2, os2 = self.plan[i - 1]
            nxt = self.plan[i] if i < n else None
            if os2 >= 4 and (nxt is None or nxt[3] > os2):
                feats[os2] = y

        # ---- FPN-lite neck (same math as model/neck.py) ----
        nk = self.p["neck"]
        strides = sorted(feats.keys(), reverse=True)
        f = feats[strides[0]]
        if self.fuse_top_lateral and strides[0] == 32:
            # lateral_32's conv is composed into block_16's projection; only
            # its activation remains to apply here.
            y = jnp.maximum(f.astype(jnp.float32), 0.0)
            if r6:
                y = jnp.minimum(y, 6.0)
            y = y.astype(dt)
        else:
            y = _conv(f, nk[f"lateral_{strides[0]}"]["conv"]["kernel"],
                      nk[f"lateral_{strides[0]}"]["conv"]["bias"], relu6=r6,
                      out_dtype=dt)
        for s in strides[1:]:
            lat = _conv(feats[s], nk[f"lateral_{s}"]["conv"]["kernel"],
                        nk[f"lateral_{s}"]["conv"]["bias"], relu6=r6,
                        out_dtype=dt)
            bsz, hh, ww, cc = y.shape
            up = jnp.broadcast_to(
                y[:, :, None, :, None, :], (bsz, hh, 2, ww, 2, cc)
            ).reshape(bsz, 2 * hh, 2 * ww, cc)
            y = up + lat
            y = _conv(y, nk[f"smooth_{s}"]["conv"]["kernel"],
                      nk[f"smooth_{s}"]["conv"]["bias"], relu6=r6, out_dtype=dt)

        # ---- heads (fused single-branch or per-branch) ----
        hp = self.p["heads"]
        out: Dict[str, jnp.ndarray] = {}
        if self.fused_heads:
            node = hp["fused"]
            z = _conv(y, node["conv"]["kernel"], node["conv"]["bias"],
                      relu6=False, out_dtype=dt)
            z = _conv(z, node["out"]["kernel"], node["out"]["bias"],
                      act=False, out_dtype=jnp.float32)
            names = [("hm", cfg.num_classes), ("wh", 2), ("off", 2)]
            if cfg.with_landmarks:
                names.append(("lm", 10))
            c0 = 0
            for name, nn_ in names:
                out[name] = z[..., c0 : c0 + nn_]
                c0 += nn_
        else:
            names = ["hm", "wh", "off"] + (["lm"] if cfg.with_landmarks else [])
            for name in names:
                node = hp[name]
                z = y
                if cfg.head_conv > 0:
                    z = _conv(z, node["conv"]["kernel"], node["conv"]["bias"],
                              relu6=False, out_dtype=dt)
                out[name] = _conv(z, node["out"]["kernel"], node["out"]["bias"],
                                  act=False, out_dtype=jnp.float32)
        return out
