"""Safetensors IO for flax variables (SURVEY.md §5 checkpoint/resume).

Inference artifacts are stored as flat safetensors with '/'-joined flax paths
('params/backbone/stem/conv/kernel', ...). Training checkpoints (optimizer
state etc.) use orbax — see `train.loop`.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from flax.traverse_util import flatten_dict, unflatten_dict

from tpucenterface.config import ModelConfig


# indirection point so tests can inject a corrupted transfer
_device_get = jax.device_get


@jax.jit
def _stage(ls):
    """Ravel + checksum each leaf on device, in one jitted program.

    Module-level (not a per-call closure) so jax.jit's cache hits across
    repeated exports of the same tree structure — a checkpoint cadence
    would otherwise pay a full retrace+recompile of this
    several-hundred-leaf program on every save."""
    flats = [jnp.ravel(x) for x in ls]
    checks = [
        jnp.sum(f.astype(jnp.float32) * _checksum_weights(f.size, jnp))
        for f in flats
    ]
    return flats, checks


def _checksum_weights(n: int, xp):
    """Order-sensitive checksum weights, identical on device and host.

    Period 61, not a power of two: a de-layout bug returning raw
    (8,128)-tiled bytes permutes elements while PRESERVING index mod any
    divisor of the 128-lane tile width, so a 64-periodic weighting would
    pass that whole corruption class unchanged. 61 is coprime to every
    tile/lane dimension on the hardware (8, 128, 512), so any such block
    reorder decorrelates the weighted sum."""
    return (xp.arange(n, dtype=xp.int32) % 61 + 1).astype(xp.float32)


def fetch_exact(tree):
    """Layout-proof device->host fetch of a pytree. Use for EVERY weight
    export in place of a bare jax.device_get.

    Why (measured, r5): on the axon-relay TPU backend, a plain
    jax.device_get of params that had lived through a donated jitted train
    step returned the RAW device-layout bytes for every 1x1-conv kernel —
    each (1,1,I,O) kernel came back as its transposed (O,I) matrix
    reinterpreted row-major (bit-verified: np.array_equal(good[0,0].T,
    bad[0,0])). The orbax checkpoint fetch of the SAME arrays moments
    earlier was correct, so the corruption is silent and fetch-dependent —
    it produced the "loss falls, AP 0.0" flagship failures (r4-r5): every
    exported model.safetensors carried transposed projection/head kernels
    while training itself was healthy. Defense in depth:

      1. fetch rank-1 ravels computed ON DEVICE in one jitted program —
         a 1-D buffer has no dimension order for a de-layout bug to
         scramble;
      2. verify an order-sensitive device-computed checksum of each leaf
         against the host recompute, so residual transfer corruption
         raises instead of silently exporting a broken artifact.
    """
    leaves, treedef = jax.tree.flatten(tree)
    if not leaves:
        return tree

    flats, checks = _stage(leaves)
    host_flats = _device_get(flats)
    host_checks = _device_get(checks)
    out = []
    for leaf, flat, chk in zip(leaves, host_flats, host_checks):
        a = np.asarray(flat)
        expect = float(
            np.sum(a.astype(np.float32) * _checksum_weights(a.size, np))
        )
        got = float(chk)
        # device and host sum in different orders: tolerance covers f32
        # accumulation skew; a scrambled fetch decorrelates the weighted
        # sum by O(1) relative, far outside this band
        tol = 1e-2 * max(abs(expect), abs(got), 1.0)
        if not np.isfinite(expect) or not np.isfinite(got):
            if np.isfinite(expect) != np.isfinite(got):
                # finiteness DISAGREES across the two fetches: one side
                # saw non-finite bytes the other did not — that is
                # transfer corruption, not a diverged run (a genuinely
                # non-finite leaf makes BOTH checksums non-finite)
                raise RuntimeError(
                    "fetch_exact: device->host transfer corruption "
                    f"detected (leaf shape {np.shape(leaf)}, device "
                    f"checksum {got}, host recompute {expect}) — "
                    "refusing to export"
                )
            # both non-finite (e.g. checkpointing a diverged run for
            # forensics): order-sensitive verification is impossible —
            # keep the 1-D-fetched data, which is already layout-proof
            out.append(a.reshape(np.shape(leaf)))
            continue
        if abs(expect - got) > tol:
            raise RuntimeError(
                "fetch_exact: device->host transfer corruption detected "
                f"(leaf shape {np.shape(leaf)}, device checksum {got}, "
                f"host recompute {expect}) — refusing to export"
            )
        out.append(a.reshape(np.shape(leaf)))
    return jax.tree.unflatten(treedef, out)


def save_safetensors(variables: Dict[str, Any], path: str) -> None:
    from safetensors.numpy import save_file

    # device-resident trees route through the layout-proof verified fetch
    # (fetch_exact docstring) — np.asarray on a jax Array is the same bare
    # transfer that silently transposed 1x1 kernels on the relay backend
    if any(
        isinstance(leaf, jax.Array) for leaf in jax.tree.leaves(variables)
    ):
        variables = fetch_exact(variables)
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


def save_packed_weights(det, path: str) -> Dict[str, int]:
    """Pack a quantize()d Detector's serving weights into one .npz.

    Every kernel the serving trace quantizes is stored as its INTEGER grid
    indices — two per byte at weight_bits<=4, one int8 byte otherwise —
    with the per-output-channel scale frozen alongside. Biases and any
    non-quantized leaves ride raw. Reconstruction guarantee: the loaded
    model's served kernels sit on the recorded grid at the recorded scales
    (frozen "w:<tag>" entries make trace-time round() the identity), so
    every process loading one artifact serves bit-identically. Versus the
    ORIGINAL detector: bit-exact when its scales were already frozen
    (adaround); for plain-PTQ tags the original trace recomputed the scale
    inside the fused program, which can differ from the frozen value by
    1 ulp — head maps then agree to ~1e-7 relative (float dust, far below
    the int8 quantization step). The float-precision kernels are NOT
    recoverable from the artifact — this is a deployment artifact, not a
    training checkpoint (keep model.safetensors for that).

    Returns {"packed_bytes": ..., "f32_bytes": ...} (on-disk vs the f32
    params footprint). Load side: `load_packed_weights` -> (scales,
    quant_params) for `Detector.quantize(scales=..., quant_params=...)` —
    the dict is fully self-describing (cfg:weight_bits / cfg:int8_dw).
    """
    import io as _io
    import json

    eng = getattr(det, "_quant", None)
    if eng is None:
        raise ValueError("save_packed_weights requires a quantize()d detector")
    from tpucenterface.quant.adaround import _kernel_paths
    from tpucenterface.quant.engine import _quantize_weight

    qmax = eng.wqmax
    arrays: Dict[str, np.ndarray] = {}
    manifest: Dict[str, Any] = {
        "weight_bits": eng.weight_bits,
        "int8_dw": int(eng.int8_dw),
        "packed": {},
        "leaves": {},
        "act": sorted(eng.act_scales or {}),
    }

    flat = flatten_dict(jax.tree.map(np.asarray, eng.p))
    packed_paths = set()
    for tag, kp in _kernel_paths(eng).items():
        if tag.endswith(".dw") and not eng.int8_dw:
            continue
        if tag in eng.skip_tags:
            continue
        try:
            node = flat[kp]
        except KeyError:
            continue
        packed_paths.add(kp)
        # grid indices + scale via the EXACT serving-trace ops on the
        # current backend (same lesson as the stem LUT: a host-float
        # recomputation can differ by ulps from the device's f32 math and
        # flip tie-ordering downstream) — _quantize_weight IS the trace
        kq, sw_dev = _quantize_weight(
            jnp.asarray(node), eng.weight_scales.get(tag), qmax
        )
        g = np.asarray(kq, np.int16)
        sw = np.asarray(sw_dev, np.float64)
        u = (g + qmax).astype(np.uint8).reshape(-1)  # [0, 2*qmax]
        if eng.weight_bits <= 4:
            if u.size % 2:
                u = np.concatenate([u, np.zeros(1, np.uint8)])
            u = (u[0::2] << 4) | u[1::2]
        arrays[f"g/{tag}"] = u
        arrays[f"s/{tag}"] = sw.astype(np.float32)
        manifest["packed"][tag] = {
            "path": list(kp), "shape": list(node.shape)
        }

    for kp, node in flat.items():
        if kp in packed_paths:
            continue
        key = "p/" + "/".join(kp)
        manifest["leaves"][key] = {
            "path": list(kp), "dtype": str(node.dtype)
        }
        arrays[key] = (
            node.astype(np.float32) if node.dtype == jnp.bfloat16 else node
        )

    for tag, v in (eng.act_scales or {}).items():
        arrays[f"a/{tag}"] = np.asarray(v, np.float64)

    arrays["manifest"] = np.frombuffer(
        json.dumps(manifest).encode(), np.uint8
    ).copy()
    buf = _io.BytesIO()
    np.savez(buf, **arrays)
    data = buf.getvalue()
    with open(path, "wb") as f:
        f.write(data)
    f32_bytes = sum(int(np.prod(v.shape)) * 4 for v in flat.values())
    return {"packed_bytes": len(data), "f32_bytes": f32_bytes}


def load_packed_weights(path: str):
    """Inverse of save_packed_weights -> (scales, quant_params).

    Install with `det.quantize(scales=scales, quant_params=quant_params)`
    — weight_bits / int8_dw ride the self-describing scales dict, and the
    frozen "w:<tag>" entries make the served program bit-identical to the
    detector that was packed."""
    import json

    z = np.load(path)
    manifest = json.loads(bytes(z["manifest"]).decode())
    qmax = 2 ** (manifest["weight_bits"] - 1) - 1
    flat: Dict[tuple, np.ndarray] = {}
    scales: Dict[str, Any] = {}
    for tag, info in manifest["packed"].items():
        shape = tuple(info["shape"])
        u = z[f"g/{tag}"]
        if manifest["weight_bits"] <= 4:
            u = np.stack([(u >> 4) & 0xF, u & 0xF], axis=-1).reshape(-1)
        n = int(np.prod(shape))
        g = u[:n].astype(np.int16) - qmax
        sw = z[f"s/{tag}"].astype(np.float64)
        flat[tuple(info["path"])] = (
            g.reshape(shape).astype(np.float64) * sw
        ).astype(np.float32)
        scales[f"w:{tag}"] = sw.astype(np.float32)
    for key, info in manifest["leaves"].items():
        arr = z[key]
        if info["dtype"] == "bfloat16":
            arr = arr.astype(jnp.bfloat16)
        flat[tuple(info["path"])] = arr
    for tag in manifest["act"]:
        v = z[f"a/{tag}"]
        scales[tag] = v if v.ndim else float(v)
    scales["cfg:weight_bits"] = manifest["weight_bits"]
    scales["cfg:int8_dw"] = int(manifest["int8_dw"])
    return scales, unflatten_dict(flat)
