"""CenterNet losses (SURVEY.md §2 C8 [K]).

- Penalty-reduced pixelwise focal loss on the heatmap (alpha=2, beta=4),
  normalized by the number of positives.
- Masked L1 regression on wh and offset, gathered at GT center indices.

All pure-jnp, batch-shardable (sums reduce over the global batch under GSPMD).
Target tensor layout matches `train.targets` (canonical ctdet):
    hm   (B, H, W, C)  rendered Gaussians in [0, 1]
    ind  (B, M)        flat y*W+x center indices (0 where inactive)
    mask (B, M)        1.0 for active objects
    wh   (B, M, 2), off (B, M, 2) regression targets
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from tpucenterface.config import TrainConfig


def focal_loss(
    hm_logits: jnp.ndarray,
    hm_target: jnp.ndarray,
    alpha: float = 2.0,
    beta: float = 4.0,
) -> jnp.ndarray:
    """Penalty-reduced focal loss (CenterNet `_neg_loss` variant), scalar."""
    pred = jax.nn.sigmoid(hm_logits)
    pred = jnp.clip(pred, 1e-4, 1.0 - 1e-4)
    pos = (hm_target >= 1.0).astype(pred.dtype)
    neg_weight = jnp.power(1.0 - hm_target, beta)
    pos_loss = -jnp.log(pred) * jnp.power(1.0 - pred, alpha) * pos
    neg_loss = -jnp.log(1.0 - pred) * jnp.power(pred, alpha) * neg_weight * (1.0 - pos)
    num_pos = jnp.maximum(pos.sum(), 1.0)
    return (pos_loss.sum() + neg_loss.sum()) / num_pos


def gather_at_ind(feat: jnp.ndarray, ind: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C), (B, M) -> (B, M, C) gather at flat spatial indices."""
    b, h, w, c = feat.shape
    flat = feat.reshape(b, h * w, c)
    return jnp.take_along_axis(flat, ind[..., None].astype(jnp.int32), axis=1)


def masked_l1(
    pred_map: jnp.ndarray,
    target: jnp.ndarray,
    ind: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Mean L1 at active GT indices.

    Canonical CenterNet RegL1Loss normalization: the mask is expanded to the
    channel dim before summing, so the divisor counts mask * channels.
    """
    pred = gather_at_ind(pred_map, ind)
    m = jnp.broadcast_to(mask[..., None].astype(pred.dtype), pred.shape)
    loss = jnp.abs(pred - target) * m
    return loss.sum() / jnp.maximum(m.sum(), 1.0)


def detection_loss(
    outputs: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    cfg: TrainConfig,
) -> tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Weighted CenterNet loss; returns (total, per-term metrics)."""
    hm_l = focal_loss(
        outputs["hm"], targets["hm"], alpha=cfg.focal_alpha, beta=cfg.focal_beta
    )
    wh_l = masked_l1(outputs["wh"], targets["wh"], targets["ind"], targets["mask"])
    off_l = masked_l1(outputs["off"], targets["off"], targets["ind"], targets["mask"])
    total = cfg.hm_weight * hm_l + cfg.wh_weight * wh_l + cfg.off_weight * off_l
    metrics = {"loss": total, "hm_loss": hm_l, "wh_loss": wh_l, "off_loss": off_l}
    if "lm" in outputs and "lm" in targets:
        lm_l = masked_l1(
            outputs["lm"], targets["lm"], targets["ind"], targets["lm_mask"]
        )
        total = total + cfg.lm_weight * lm_l
        metrics["lm_loss"] = lm_l
        metrics["loss"] = total
    return total, metrics
