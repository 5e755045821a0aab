"""Port torch state_dicts into flax {params, batch_stats} (SURVEY.md §7 M0).

Layout rules (one-off, torch-CPU only, never on the hot path):
- Conv weight:  torch (O, I/g, kh, kw)  ->  flax (kh, kw, I/g, O)   [HWIO]
  (the same transpose covers depthwise convs: (C,1,k,k) -> (k,k,1,C))
- BatchNorm:    weight->scale, bias->bias, running_mean->mean, running_var->var
- Biases:       copied as-is.

The flax tree is walked as the source of truth: every flax leaf must find its
torch tensor (by the naming contract in `torch_twin`), and shape-after-
transpose must match, else we fail loudly — silent partial loads are how
parity dies (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from flax.traverse_util import flatten_dict, unflatten_dict

from tpucenterface.config import ModelConfig

_BN_MAP = {"scale": "weight", "bias": "bias", "mean": "running_mean", "var": "running_var"}


def _torch_key(path) -> tuple[str, bool]:
    """flax flat path -> (torch dotted key, needs_OIHW_to_HWIO_transpose)."""
    col, *mods, leaf = path  # col is 'params' or 'batch_stats'
    parent = mods[-1] if mods else ""
    if parent == "bn" or col == "batch_stats":
        return ".".join(mods) + "." + _BN_MAP[leaf], False
    if leaf == "kernel":
        return ".".join(mods) + ".weight", True
    return ".".join(mods) + "." + leaf, False


def flax_from_torch_state(
    state_dict: Mapping[str, Any], cfg: ModelConfig
) -> Dict[str, Any]:
    """Convert a torch state_dict (twin naming contract) to flax variables."""
    # normalize common wrappers
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        sd[k] = np.asarray(v)

    # Abstract init: shapes/dtypes only, no compute (fast on any backend).
    import jax

    from tpucenterface.model.centernet import CenterFaceNet

    model = CenterFaceNet(cfg)
    template = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros((1, 128, 128, 3), jnp.float32), train=False),
        jax.random.PRNGKey(0),
    )
    flat = flatten_dict(
        {"params": template["params"], "batch_stats": template["batch_stats"]}
    )
    out = {}
    for path, leaf in flat.items():
        tk, transpose = _torch_key(path)
        if tk not in sd:
            raise KeyError(
                f"torch checkpoint missing '{tk}' (flax path {'/'.join(path)}); "
                f"available keys near it: "
                f"{[k for k in sd if k.split('.')[0] == tk.split('.')[0]][:8]}"
            )
        w = sd[tk]
        if transpose:
            w = np.transpose(w, (2, 3, 1, 0))
        if w.shape != leaf.shape:
            raise ValueError(
                f"shape mismatch for {tk}: torch {w.shape} vs flax {leaf.shape} "
                f"at {'/'.join(path)}"
            )
        out[path] = jnp.asarray(w, dtype=leaf.dtype)
    tree = unflatten_dict(out)
    return {"params": tree["params"], "batch_stats": tree["batch_stats"]}


def flax_from_torch_module(module, cfg: ModelConfig) -> Dict[str, Any]:
    return flax_from_torch_state(module.state_dict(), cfg)


def torch_state_from_flax(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse port: flax {params, batch_stats} -> torch state_dict (numpy).

    Exact inverse of `flax_from_torch_state` (HWIO -> OIHW); lets users take
    JAX-trained weights back into the torch twin (validation, downstream
    torch-side export — SURVEY.md §2 C14).
    """
    flat = flatten_dict(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    )
    out: Dict[str, Any] = {}
    for path, leaf in flat.items():
        tk, transpose = _torch_key(path)
        w = np.asarray(leaf)
        if transpose:
            w = np.transpose(w, (3, 2, 0, 1))
        out[tk] = w
    return out


def load_torch_pth(path: str, cfg: ModelConfig) -> Dict[str, Any]:
    """Load a `.pth` checkpoint file and port it.

    Handles the reference family's wrappers: a bare state_dict, or a dict with
    a 'state_dict'/'model' entry (SURVEY.md §2 C10 [K]). NOTE: real reference
    checkpoints may use different module names than our twin; when the
    reference tree materializes, extend `_torch_key` with a translation table.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for key in ("state_dict", "model", "model_state_dict"):
            if key in ckpt and isinstance(ckpt[key], dict):
                ckpt = ckpt[key]
                break
    return flax_from_torch_state(ckpt, cfg)
