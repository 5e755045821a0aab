"""MobileNetV2-class backbone emitting multi-stride NHWC features.

Capability mirror of SURVEY.md §2 C1 (depthwise-separable feature extractor,
strides 2..32). Returns skip features at strides 4/8/16/32 for the FPN-lite
neck. Block naming is deterministic (`block_<i>`) so the torch twin and the
weight-port tool map 1:1.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from tpucenterface.config import ModelConfig
from tpucenterface.model.blocks import ConvBN, InvertedResidual


def backbone_plan(cfg: ModelConfig) -> List[Tuple[int, int, int, int]]:
    """Flatten inverted_residual_setting into per-block (expand, ch, stride, out_stride)."""
    plan = []
    out_stride = 2  # after stem
    for t, c, n, s in cfg.inverted_residual_setting:
        for i in range(n):
            stride = s if i == 0 else 1
            out_stride *= stride
            plan.append((t, cfg.width(c), stride, out_stride))
    return plan


class MobileNetV2Backbone(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[int, jnp.ndarray]:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        kw = dict(
            relu6=cfg.relu6,
            bn_eps=cfg.bn_eps,
            bn_momentum=cfg.bn_momentum,
            dtype=dtype,
            folded=cfg.folded,
            bn_dtype=jnp.dtype(cfg.bn_compute_dtype),
        )
        x = x.astype(dtype)
        if cfg.s2d_stem:
            # 2x space-to-depth + 2x2/s1 conv == the 3x3/s2 stem exactly
            # (weights remapped by weights.fold.s2d_remap_stem; see
            # ModelConfig.s2d_stem for the why).
            b, h, w, c = x.shape
            x = (
                x.reshape(b, h // 2, 2, w // 2, 2, c)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(b, h // 2, w // 2, 4 * c)
            )
            x = ConvBN(
                cfg.width(cfg.stem_channels),
                kernel=2,
                stride=1,
                padding=((1, 0), (1, 0)),
                name="stem",
                **kw,
            )(x, train)
        else:
            x = ConvBN(
                cfg.width(cfg.stem_channels), kernel=3, stride=2, name="stem", **kw
            )(x, train)
        feats: Dict[int, jnp.ndarray] = {}
        plan = backbone_plan(cfg)
        for i, (t, c, s, out_stride) in enumerate(plan):
            # Record the finest feature at each stride BEFORE downsampling past it.
            nxt = plan[i + 1] if i + 1 < len(plan) else None
            x = InvertedResidual(
                features=c, stride=s, expand=t, name=f"block_{i}", **kw
            )(x, train)
            if out_stride >= 4 and (nxt is None or nxt[3] > out_stride):
                feats[out_stride] = x
        # feats now holds the last (deepest) map at strides 4, 8, 16(…), 32
        return feats
