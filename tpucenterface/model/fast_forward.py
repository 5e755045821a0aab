"""FastEngine: the hand-scheduled TPU inference path.

Measured reality on v5e (see bench/timing.py for the methodology): this
lightweight net is HBM-traffic-bound, and XLA physically pads every NHWC
feature dim to 128 lanes — a 24-channel stride-4 map costs 5.3x its logical
bytes. XLA also never fuses conv->conv, so each MBConv block round-trips its
6x-expanded activation through HBM.

FastEngine counters both:
- every channel dim is LOGICALLY padded to a multiple of 128 with zero
  weights/biases (physically free — XLA stored that padding anyway), which
  legalizes aligned DMAs in hand kernels and keeps the whole chain pad-free
  of repacking copies;
- stride-1 inverted-residual blocks run as ONE fused Pallas kernel
  (ops/fused_mbconv): expanded tensors never leave VMEM;
- stem / stride-2 blocks / neck / heads run as plain XLA convs on the padded
  tensors (zero-padded weights), numerically identical.

Parity: FastEngine(folded_variables) == flax CenterFaceNet(folded) within
bf16 tolerance (tests/test_fast_forward.py).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from tpucenterface.config import ModelConfig
from tpucenterface.model.backbone import backbone_plan
from tpucenterface.ops.fused_mbconv import fused_mbconv

LANE = 128


def _ceil_mult(c: int, m: int = LANE) -> int:
    return -(-c // m) * m


def _pad_axis(a: jnp.ndarray, axis: int, target: int) -> jnp.ndarray:
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, target - a.shape[axis])
    return jnp.pad(a, pad)


def _conv(x, k, b, stride=1, groups=1, act=True, relu6=True, out_dtype=jnp.bfloat16):
    kh = k.shape[0]
    p = (kh - 1) // 2
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16),
        k.astype(jnp.bfloat16),
        (stride, stride),
        [(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    y = y + b.astype(jnp.float32)
    if act:
        y = jnp.maximum(y, 0.0)
        if relu6:
            y = jnp.minimum(y, 6.0)
    return y.astype(out_dtype)


class FastEngine:
    """Callable inference engine built from folded variables."""

    def __init__(
        self,
        folded_variables: Dict[str, Any],
        cfg: ModelConfig,
        use_mbconv_kernel: bool = False,  # XLA wins on v5e (PERFORMANCE.md)
        kernel_interpret: bool = False,
        min_kernel_hw: int = 24,
    ):
        self.cfg = cfg
        self.use_kernel = use_mbconv_kernel
        self.interpret = kernel_interpret
        self.min_kernel_hw = min_kernel_hw
        self.plan = backbone_plan(cfg)
        self.p = jax.tree.map(jnp.asarray, folded_variables["params"])

    # -- padded weight accessors (padding is traced-constant, folded by XLA) --

    def _cb(self, node, cin_pad: int, cout_pad: int, groups: bool = False):
        """ConvBN-folded scope -> (kernel, bias) padded to the given widths."""
        k = node["conv"]["kernel"]
        b = node["conv"]["bias"]
        kh, kw, ci, co = k.shape
        if groups:
            # depthwise: (kh, kw, 1, C) -> pad channel axis only
            k = _pad_axis(k, 3, cout_pad)
        else:
            k = _pad_axis(_pad_axis(k, 2, cin_pad), 3, cout_pad)
        b = _pad_axis(b, 0, cout_pad)
        return k, b

    # ------------------------------------------------------------------ #

    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        bb = self.p["backbone"]
        r6 = cfg.relu6

        stem_co = _ceil_mult(cfg.width(cfg.stem_channels))
        k, b = self._cb(bb["stem"], 3, stem_co)  # input stays 3ch (lane-minor 3)
        y = _conv(x, k, b, stride=2, relu6=r6)

        feats: Dict[int, jnp.ndarray] = {}
        cin_log = cfg.width(cfg.stem_channels)
        for i, (t, c, s, out_stride) in enumerate(self.plan):
            blk = bb[f"block_{i}"]
            cin_pad = _ceil_mult(cin_log)
            ce_log = cin_log * t
            ce_pad = _ceil_mult(ce_log)
            co_pad = _ceil_mult(c)
            has_skip = s == 1 and cin_log == c
            hw = y.shape[1]
            if (
                self.use_kernel
                and s == 1
                and hw >= self.min_kernel_hw
                and hw % 2 == 0
            ):
                # fused Pallas block on padded channels
                if t != 1:
                    w1 = _pad_axis(
                        _pad_axis(blk["expand"]["conv"]["kernel"][0, 0], 0, cin_pad),
                        1,
                        ce_pad,
                    )
                    b1 = _pad_axis(blk["expand"]["conv"]["bias"], 0, ce_pad)
                else:
                    w1 = b1 = None
                wd = _pad_axis(
                    blk["depthwise"]["conv"]["kernel"][:, :, 0, :], 2, ce_pad
                )
                bd = _pad_axis(blk["depthwise"]["conv"]["bias"], 0, ce_pad)
                w2 = _pad_axis(
                    _pad_axis(blk["project"]["conv"]["kernel"][0, 0], 0, ce_pad),
                    1,
                    co_pad,
                )
                b2 = _pad_axis(blk["project"]["conv"]["bias"], 0, co_pad)
                y = fused_mbconv(
                    y, w1, b1, wd, bd, w2, b2,
                    skip=has_skip, relu6=r6, interpret=self.interpret,
                )
            else:
                z = y
                if t != 1:
                    k, b = self._cb(blk["expand"], cin_pad, ce_pad)
                    z = _conv(z, k, b, relu6=r6)
                k, b = self._cb(blk["depthwise"], ce_pad, ce_pad, groups=True)
                z = _conv(z, k, b, stride=s, groups=ce_pad, relu6=r6)
                k, b = self._cb(blk["project"], ce_pad, co_pad)
                z = _conv(z, k, b, act=False)
                y = y + z if has_skip else z
            cin_log = c
            nxt = self.plan[i + 1] if i + 1 < len(self.plan) else None
            if out_stride >= 4 and (nxt is None or nxt[3] > out_stride):
                feats[out_stride] = (y, _ceil_mult(c))

        # ---- FPN-lite neck on padded channels ----
        nk = self.p["neck"]
        cpad = _ceil_mult(cfg.fpn_channels)
        strides = sorted(feats.keys(), reverse=True)
        f, fp = feats[strides[0]]
        k, b = self._cb(nk[f"lateral_{strides[0]}"], fp, cpad)
        y = _conv(f, k, b, relu6=r6)
        for s in strides[1:]:
            f, fp = feats[s]
            k, b = self._cb(nk[f"lateral_{s}"], fp, cpad)
            lat = _conv(f, k, b, relu6=r6)
            bsz, hh, ww, cc = y.shape
            up = jnp.broadcast_to(
                y[:, :, None, :, None, :], (bsz, hh, 2, ww, 2, cc)
            ).reshape(bsz, 2 * hh, 2 * ww, cc)
            y = up + lat
            k, b = self._cb(nk[f"smooth_{s}"], cpad, cpad)
            y = _conv(y, k, b, relu6=r6)

        # ---- heads: hidden convs padded; final 1x1 emits logical channels ----
        hp = self.p["heads"]
        hid = _ceil_mult(cfg.head_conv) if cfg.head_conv > 0 else 0
        out: Dict[str, jnp.ndarray] = {}
        names = ["hm", "wh", "off"] + (["lm"] if cfg.with_landmarks else [])
        for name in names:
            node = hp[name]
            z = y
            if cfg.head_conv > 0:
                k = _pad_axis(_pad_axis(node["conv"]["kernel"], 2, cpad), 3, hid)
                b = _pad_axis(node["conv"]["bias"], 0, hid)
                z = _conv(z, k, b, relu6=False)  # heads use plain ReLU
            k = _pad_axis(node["out"]["kernel"], 2, hid or cpad)
            b = node["out"]["bias"]
            out[name] = _conv(z, k, b, act=False, out_dtype=jnp.float32)
        return out
