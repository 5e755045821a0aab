"""FPN-lite neck: top-down fusion of stride-32..4 features to one stride-4 map.

Capability mirror of SURVEY.md §2 C2 (upsampler/IDAUp/FPN-lite). TPU-first
design choice: nearest-neighbor ×2 upsample + 1x1 lateral + 3x3 smooth conv
instead of transpose convolutions — resize+conv lowers to pure XLA ops that
fuse cleanly and avoid transpose-conv's uneven MXU utilization.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpucenterface.config import ModelConfig
from tpucenterface.model.blocks import ConvBN


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest ×2 upsample, NHWC, via broadcast-reshape (cheap XLA, no gather)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class FPNLiteNeck(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(
        self, feats: Dict[int, jnp.ndarray], train: bool = False
    ) -> jnp.ndarray:
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
        strides = sorted(feats.keys(), reverse=True)  # [32, 16, 8, 4]
        c = cfg.fpn_channels
        y = ConvBN(c, kernel=1, name=f"lateral_{strides[0]}", **kw)(
            feats[strides[0]], train
        )
        for s in strides[1:]:
            lat = ConvBN(c, kernel=1, name=f"lateral_{s}", **kw)(feats[s], train)
            y = _upsample2x(y) + lat
            y = ConvBN(c, kernel=3, name=f"smooth_{s}", **kw)(y, train)
        return y  # stride-4, fpn_channels wide
