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


# --------------------------------------------------------------------------- #
# Foreign-checkpoint adapters (VERDICT r1 #4)
# --------------------------------------------------------------------------- #


def twin_key_order(cfg: ModelConfig):
    """The twin naming contract as an ORDERED [(key, shape)] list (torch
    registration order == network order). This is the matching target for
    foreign checkpoints."""
    from tpucenterface.weights.torch_twin import TorchCenterFace

    twin = TorchCenterFace(cfg)
    # 0-dim entries (num_batches_tracked) are bookkeeping, not weights
    return [
        (k, tuple(v.shape))
        for k, v in twin.state_dict().items()
        if v.ndim > 0
    ]


def apply_name_map(state_dict: Mapping[str, Any], name_map) -> Dict[str, Any]:
    """Rename checkpoint keys with a declarative (regex, replacement) table.

    Rules apply in order; the FIRST matching rule wins (re.subn with count
    semantics of re.sub over the whole key). Keys matching a rule whose
    replacement is None are dropped (e.g. num_batches_tracked buffers).
    """
    import re

    out: Dict[str, Any] = {}
    for k, v in state_dict.items():
        nk = k
        for pat, repl in name_map:
            if re.search(pat, k):
                nk = None if repl is None else re.sub(pat, repl, k)
                break
        if nk is not None:
            out[nk] = v
    return out


def _ambiguous_unit_pairs(entries):
    """Module units whose ordered shape signatures are identical — adjacent
    OR NOT.

    Positional shape matching cannot verify the ORDER of ANY two modules
    with the same shape signature (e.g. MobileNet's repeated identical
    blocks): swapping two equal-signature units — even separated by other
    modules — leaves the flat shape sequence unchanged, so if the foreign
    net registered them in a different order than the twin's data flow, the
    two-pointer walk maps them crosswise with no shape mismatch
    (VERDICT r2 #4). Scans every module granularity (prefix depth); leaf
    tensors are always grouped at least at their parent module (torch's
    within-module parameter order — weight, bias, running_mean,
    running_var — is a universal convention, so it is NOT flagged).
    Equal-signature units are reported as consecutive pairs per signature
    class (bounding the list size).
    """
    pairs = set()
    if not entries:
        return []
    maxd = max(k.count(".") for k, _ in entries)
    for d in range(1, maxd + 1):
        groups: list = []  # (unit_prefix, [shapes...])
        for k, s in entries:
            parts = k.split(".")
            pref = ".".join(parts[: min(d, len(parts) - 1)])
            if groups and groups[-1][0] == pref:
                groups[-1][1].append(s)
            else:
                groups.append((pref, [s]))
        by_sig: dict = {}
        for pref, sig in groups:
            by_sig.setdefault(tuple(sig), []).append(pref)
        for prefs in by_sig.values():
            distinct = sorted(set(prefs))
            for a, b in zip(distinct, distinct[1:]):
                pairs.add((a, b))
    return sorted(pairs)


def propose_name_map(
    state_dict: Mapping[str, Any], cfg: ModelConfig
) -> Dict[str, Any]:
    """Shape/order-based introspection: propose a foreign-key -> twin-key
    mapping for an arbitrary `.pth` state_dict.

    Both torch state_dicts preserve module registration order, which follows
    the network's data flow; so after dropping non-tensor bookkeeping entries
    (num_batches_tracked etc.), a two-pointer walk matching on exact tensor
    shape aligns the sequences. Returns
        {'mapping': {foreign: twin}, 'unmatched_foreign': [...],
         'unmatched_twin': [...], 'ambiguous': [(unitA, unitB), ...],
         'complete': bool}
    so a caller can review what didn't line up before trusting the port.

    `ambiguous` lists adjacent foreign module units whose shape signatures
    are identical — their pairing is order-sensitive and shape matching
    alone cannot verify it (two same-shape layers registered in swapped
    order would map crosswise). `complete` is True only when every twin key
    matched AND no such ambiguity exists; callers that have verified the
    foreign net's registration order follows its data flow can inspect
    `mapping` and proceed deliberately (`allow_ambiguous=True` in
    `flax_from_foreign_state`).
    """
    import numpy as np  # noqa: F811

    expected = twin_key_order(cfg)
    foreign = []
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        v = np.asarray(v)
        if v.ndim == 0:  # num_batches_tracked and friends
            continue
        foreign.append((k, tuple(v.shape)))

    mapping: Dict[str, str] = {}
    un_f, un_t = [], []
    i = j = 0
    while i < len(foreign) and j < len(expected):
        fk, fs = foreign[i]
        tk, ts = expected[j]
        if fs == ts:
            mapping[fk] = tk
            i += 1
            j += 1
            continue
        # try skipping one side (an extra foreign tensor, or a missing one)
        if i + 1 < len(foreign) and foreign[i + 1][1] == ts:
            un_f.append(fk)
            i += 1
        else:
            un_t.append(tk)
            j += 1
    un_f += [k for k, _ in foreign[i:]]
    un_t += [k for k, _ in expected[j:]]
    ambiguous = _ambiguous_unit_pairs(
        [(k, s) for k, s in foreign if k in mapping]
    )
    return {
        "mapping": mapping,
        "unmatched_foreign": un_f,
        "unmatched_twin": un_t,
        "ambiguous": ambiguous,
        "complete": not un_t and not ambiguous,
    }


def flax_from_foreign_state(
    state_dict: Mapping[str, Any],
    cfg: ModelConfig,
    name_map=None,
    allow_ambiguous: bool = False,
) -> Dict[str, Any]:
    """Port a foreign (non-twin-named) torch state_dict.

    With `name_map` (declarative (regex, replacement) rules) the keys are
    rewritten to the twin contract; without it, `propose_name_map` aligns by
    shape/order and raises with a readable report if the alignment is
    incomplete OR order-ambiguous (silent partial loads and silently crossed
    same-shape weights are how parity dies). `allow_ambiguous=True` accepts
    an alignment whose only defect is adjacent identical-signature units —
    use it only after verifying the foreign net registers its modules in
    data-flow order."""
    if name_map is not None:
        return flax_from_torch_state(apply_name_map(state_dict, name_map), cfg)
    prop = propose_name_map(state_dict, cfg)
    if prop["unmatched_twin"]:
        raise ValueError(
            "shape/order auto-mapping incomplete:\n"
            f"  unmatched twin keys:    {prop['unmatched_twin'][:10]}\n"
            f"  unmatched foreign keys: {prop['unmatched_foreign'][:10]}\n"
            "Provide an explicit name_map=[(regex, replacement), ...]."
        )
    if prop["ambiguous"] and not allow_ambiguous:
        raise ValueError(
            "shape/order auto-mapping is order-AMBIGUOUS: these adjacent "
            "units have identical shape signatures, so a swapped "
            "registration order would port crosswise undetected:\n  "
            + "\n  ".join(f"{a} <-> {b}" for a, b in prop["ambiguous"][:10])
            + "\nVerify the foreign net's registration order follows its "
            "data flow, then pass allow_ambiguous=True (or provide an "
            "explicit name_map)."
        )
    renamed = {
        prop["mapping"][k]: v
        for k, v in state_dict.items()
        if k in prop["mapping"]
    }
    return flax_from_torch_state(renamed, cfg)


def unwrap_checkpoint(ckpt):
    """Unwrap the reference family's checkpoint containers: a bare
    state_dict, or a dict with a 'state_dict'/'model'/'model_state_dict'
    entry (SURVEY.md §2 C10 [K]). Single point of truth for every consumer
    (load_torch_pth and the port CLI's --report analysis)."""
    if isinstance(ckpt, dict):
        for key in ("state_dict", "model", "model_state_dict"):
            if key in ckpt and isinstance(ckpt[key], dict):
                return ckpt[key]
    return ckpt


def load_torch_pth(
    path: str,
    cfg: ModelConfig,
    name_map=None,
    auto_map: bool = False,
    allow_ambiguous: bool = False,
) -> Dict[str, Any]:
    """Load a `.pth` checkpoint file and port it.

    Handles the reference family's wrappers via `unwrap_checkpoint`.
    Checkpoints that use module names other than the twin contract port
    through `name_map` (declarative regex rules) or `auto_map=True`
    (shape/order alignment via `propose_name_map` — re-verify against the
    real tree when it appears).
    """
    import torch

    ckpt = unwrap_checkpoint(
        torch.load(path, map_location="cpu", weights_only=False)
    )
    if name_map is not None or auto_map:
        return flax_from_foreign_state(
            ckpt, cfg, name_map=name_map, allow_ambiguous=allow_ambiguous
        )
    return flax_from_torch_state(ckpt, cfg)
