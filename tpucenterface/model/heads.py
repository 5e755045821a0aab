"""CenterNet heads on the stride-4 map: hm(1) / wh(2) / offset(2) [+ landmarks(10)].

Capability mirror of SURVEY.md §2 C3. Parity-critical detail preserved:
heatmap head bias initialized to -log((1-0.01)/0.01) ≈ -4.595 (§3.5 [K]).
Heads always emit float32 — the decode path needs f32 heatmap precision.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from tpucenterface.config import ModelConfig


class _Head(nn.Module):
    out_ch: int
    hidden: int
    bias_init_val: object = 0.0  # float, or per-channel vector (fused heads)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.hidden > 0:
            x = nn.Conv(
                self.hidden,
                (3, 3),
                padding=((1, 1), (1, 1)),  # torch Conv2d(padding=1) parity
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="conv",
            )(x)
            x = nn.relu(x)
        bias_init = (
            (lambda key, shape, dtype=jnp.float32: jnp.asarray(
                self.bias_init_val, dtype
            ).reshape(shape))
            if hasattr(self.bias_init_val, "__len__")
            else nn.initializers.constant(self.bias_init_val)
        )
        x = nn.Conv(
            self.out_ch,
            (1, 1),
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            bias_init=bias_init,
            name="out",
        )(x.astype(jnp.float32))
        return x


class CenterNetHeads(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        if cfg.fused_heads:
            # single wide conv + block-diagonal 1x1 (weights.fold.fuse_head_
            # params); mathematically identical to the separate branches but
            # 2 dense ops instead of 6-8 skinny ones (small-batch occupancy)
            names = [("hm", cfg.num_classes), ("wh", 2), ("off", 2)]
            if cfg.with_landmarks:
                names.append(("lm", 10))
            total_out = sum(n for _, n in names)
            # From-scratch init must still carry the heatmap prior bias on the
            # hm slice (folded-weight loads overwrite this anyway).
            bias_vec = [cfg.hm_bias_init] * cfg.num_classes + [0.0] * (
                total_out - cfg.num_classes
            )
            y = _Head(
                total_out,
                cfg.head_conv * len(names),
                bias_init_val=tuple(bias_vec),
                dtype=dtype,
                name="fused",
            )(x)
            out, c0 = {}, 0
            for name, n in names:
                out[name] = y[..., c0 : c0 + n]
                c0 += n
            # contiguous wh+off view: lets decode gather box params in ONE
            # take_along_axis instead of two (serving decode micro-win)
            out["whoff"] = y[..., cfg.num_classes : cfg.num_classes + 4]
            return out
        out = {
            "hm": _Head(
                cfg.num_classes,
                cfg.head_conv,
                bias_init_val=cfg.hm_bias_init,
                dtype=dtype,
                name="hm",
            )(x),
            "wh": _Head(2, cfg.head_conv, dtype=dtype, name="wh")(x),
            "off": _Head(2, cfg.head_conv, dtype=dtype, name="off")(x),
        }
        if cfg.with_landmarks:
            out["lm"] = _Head(10, cfg.head_conv, dtype=dtype, name="lm")(x)
        return out
