"""Safetensors IO for flax variables (SURVEY.md §5 checkpoint/resume).

Inference artifacts are stored as flat safetensors with '/'-joined flax paths
('params/backbone/stem/conv/kernel', ...). Training checkpoints (optimizer
state etc.) use orbax — see `train.loop`.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from flax.traverse_util import flatten_dict, unflatten_dict

from tpucenterface.config import ModelConfig


def save_safetensors(variables: Dict[str, Any], path: str) -> None:
    from safetensors.numpy import save_file

    flat = flatten_dict(variables, sep="/")
    save_file({k: np.asarray(v) for k, v in flat.items()}, path)


def load_safetensors(path: str, cfg: ModelConfig | None = None) -> Dict[str, Any]:
    from safetensors.numpy import load_file

    flat = load_file(path)
    return unflatten_dict({k: jnp.asarray(v) for k, v in flat.items()}, sep="/")


def save_quant_scales(scales: Dict[str, Any], path: str) -> None:
    """Persist Detector.quantize() activation scales as JSON.

    Per-tensor entries are floats; per-channel (int8_dw depthwise) entries
    are lists. Deployment: calibrate once, save, then
    `det.quantize(scales=load_quant_scales(path), int8_dw=...)` in every
    serving process — no calibration pass, no cross-fleet scale drift.
    """
    import json

    out = {
        k: (v.tolist() if isinstance(v, np.ndarray) else float(v))
        for k, v in scales.items()
    }
    with open(path, "w") as f:
        json.dump(out, f)


def load_quant_scales(path: str) -> Dict[str, Any]:
    """Inverse of save_quant_scales (lists come back as numpy arrays)."""
    import json

    with open(path) as f:
        raw = json.load(f)
    return {
        k: (np.asarray(v, np.float64) if isinstance(v, list) else float(v))
        for k, v in raw.items()
    }
