"""BatchNorm folding for the inference hot path.

y = BN(conv(x)) with inference statistics is an affine map per output channel:
    scale = gamma / sqrt(var + eps)
    y = conv(x) * scale + (beta - mean * scale)
so fold kernel' = kernel * scale (per-O-channel), bias' = beta - mean*scale.
The folded model (ModelConfig.folded=True) is then pure bf16 conv+activation
chains — the measured forward cost was dominated by f32 BN materialization
between convs (~0.5GB HBM traffic per stride-4 layer at bs32), which this
removes entirely.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np


def fold_variables(
    variables: Dict[str, Any], bn_eps: float = 1e-5
) -> Dict[str, Any]:
    """Fold every {conv, bn} sibling pair into a biased conv; drop batch_stats.

    Returns {'params': folded_tree} for a ModelConfig(folded=True) model.
    Head scopes (conv/out with native biases, no bn sibling) pass through.
    """
    params = variables["params"]
    stats = variables["batch_stats"]

    def rec(p_node, s_node):
        if isinstance(p_node, dict) and "conv" in p_node and "bn" in p_node:
            kernel = np.asarray(p_node["conv"]["kernel"], np.float64)
            gamma = np.asarray(p_node["bn"]["scale"], np.float64)
            beta = np.asarray(p_node["bn"]["bias"], np.float64)
            mean = np.asarray(s_node["bn"]["mean"], np.float64)
            var = np.asarray(s_node["bn"]["var"], np.float64)
            scale = gamma / np.sqrt(var + bn_eps)
            return {
                "conv": {
                    "kernel": jnp.asarray(kernel * scale, jnp.float32),
                    "bias": jnp.asarray(beta - mean * scale, jnp.float32),
                }
            }
        if isinstance(p_node, dict):
            return {
                k: rec(v, s_node.get(k, {}) if isinstance(s_node, dict) else {})
                for k, v in p_node.items()
            }
        return p_node

    return {"params": rec(params, stats)}
