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


def fuse_head_params(heads: Dict[str, Any], names) -> Dict[str, Any]:
    """Merge per-branch head params into one wide conv + block-diagonal 1x1.

    The three (or four, with landmarks) head branches are independent
    subnetworks on the same stride-4 input; concatenating their hidden
    channels and block-diagonalizing the output 1x1 is mathematically
    identical but runs as 2 dense ops instead of 6-8 skinny ones — a win in
    the small-batch occupancy-bound regime (see PERFORMANCE.md).
    """
    ks = [np.asarray(heads[n]["conv"]["kernel"]) for n in names]
    bs = [np.asarray(heads[n]["conv"]["bias"]) for n in names]
    ows = [np.asarray(heads[n]["out"]["kernel"]) for n in names]
    obs = [np.asarray(heads[n]["out"]["bias"]) for n in names]
    hidden = [k.shape[-1] for k in ks]
    outs = [w.shape[-1] for w in ows]
    kcat = np.concatenate(ks, axis=-1)                    # (3,3,C, sum_hidden)
    bcat = np.concatenate(bs, axis=-1)
    wblk = np.zeros((1, 1, sum(hidden), sum(outs)), kcat.dtype)
    ho = co = 0
    for h, o, w in zip(hidden, outs, ows):
        wblk[0, 0, ho : ho + h, co : co + o] = w[0, 0]
        ho += h
        co += o
    oblk = np.concatenate(obs, axis=-1)
    return {
        "conv": {"kernel": jnp.asarray(kcat), "bias": jnp.asarray(bcat)},
        "out": {"kernel": jnp.asarray(wblk), "bias": jnp.asarray(oblk)},
    }


def raw_pixel_offset(pp_cfg) -> np.ndarray:
    """The per-channel raw-pixel offset of the stem_preprocess convention,
    in INPUT channel order: 255*mean, reversed for BGR inputs.

    The convention is x' = u - 255*mean (mean-centered raw pixels, std NOT
    applied — it lives in the baked stem kernel). Crucially the zero point
    of x' is the mean pixel, exactly where the normalized representation's
    zero is — so the stem conv's zero-PADDING means the same thing in both
    conventions and the bake is exact including borders.
    """
    mean = np.asarray(pp_cfg.mean, np.float64) * 255.0
    if pp_cfg.bgr_input:
        mean = mean[::-1]
    return mean


def bake_preprocess_into_stem(stem_conv: Dict[str, Any], pp_cfg) -> Dict[str, Any]:
    """Compose the input normalization (BGR->RGB flip, /255, mean/std) into
    the folded stem conv (VERDICT r2 task-1 lever a).

    The normalize is a per-input-channel affine on raw pixel values
    u in [0, 255]:  x_rgb = (u_rgb - 255*mean) / (255*std). A conv is
    linear in its input and per-channel scaling commutes into the kernel:
        conv((u - 255*mean)/std, K) == conv(u - 255*mean, K/std)
    exactly — including the zero-padded borders, because x' = u - 255*mean
    has the same zero point as the normalized representation. So the baked
    kernel is A[..,c,o] = K[..,flip(c),o]/std (flip folds BGR->RGB), the
    bias is unchanged, and programs feed `u - 255*mean` raw-scale values
    (preprocess raw=True):
      - the standalone normalize pass on the (B, H, W, 3) input disappears
        (u8 -> x' is a cast+subtract XLA fuses into the consumer);
      - the int8 engine's stem input has a FIXED scale known from config
        constants (|x'| <= max(255*mean, 255*(1-mean)) ~ 151), needing no
        calibration and only the +-0.5-raw-unit rounding of int8;
      - at bf16, x' (magnitude ~128, ulp 1.0 -> +-0.5 raw units) is FINER
        than the normalized representation (magnitude ~2, ulp 0.0156 ~ 1.2
        raw units after the std division).
    Exact in real arithmetic; computed in f64.
    """
    k = np.asarray(stem_conv["kernel"], np.float64)   # (kh, kw, 3, O)
    b = np.asarray(stem_conv["bias"])
    if k.shape[2] != 3:
        raise ValueError(
            f"stem bake expects a 3-input-channel stem, got {k.shape}"
        )
    std = np.asarray(pp_cfg.std, np.float64) * 255.0   # RGB order
    a = k / std.reshape(1, 1, 3, 1)
    if pp_cfg.bgr_input:
        a = a[:, :, ::-1, :]   # stem consumes raw BGR frames directly
    return {
        "kernel": jnp.asarray(a, jnp.float32),
        "bias": jnp.asarray(b, jnp.float32),
    }


def s2d_remap_stem(kernel: np.ndarray) -> np.ndarray:
    """Remap a 3x3/stride-2 stem kernel (3,3,C,O) to the equivalent
    2x2/stride-1 kernel (2,2,4C,O) on the 2x-space-to-depth input.

    The original conv (pad 1, stride 2) computes
        out[i,j] = sum_{ky,kx} W[ky,kx] * x[2i+ky-1, 2j+kx-1];
    with x_s2d[r,s,(dy,dx,c)] = x[2r+dy, 2s+dx, c] every original tap lands on
        ky=0 -> (u=0, dy=1), ky=1 -> (u=1, dy=0), ky=2 -> (u=1, dy=1)
    of a 2x2 conv with pad ((1,0),(1,0)); the (u=0, dy=0) slot is zero.
    """
    kh, kw_, c, o = kernel.shape
    assert (kh, kw_) == (3, 3), "s2d stem remap expects a 3x3 kernel"
    out = np.zeros((2, 2, 4 * c, o), np.asarray(kernel).dtype)
    for ky in range(3):
        uy, dy = (0, 1) if ky == 0 else (1, ky - 1)
        for kx in range(3):
            ux, dx = (0, 1) if kx == 0 else (1, kx - 1)
            out[uy, ux, (dy * 2 + dx) * c : (dy * 2 + dx + 1) * c] = kernel[ky, kx]
    return out


def fold_variables(
    variables: Dict[str, Any],
    bn_eps: float = 1e-5,
    fuse_heads: bool = False,
    s2d_stem: bool = False,
    bake_preprocess=None,
) -> Dict[str, Any]:
    """Fold every {conv, bn} sibling pair into a biased conv; drop batch_stats.

    Returns {'params': folded_tree} for a ModelConfig(folded=True) model.
    Head scopes (conv/out with native biases, no bn sibling) pass through,
    or get merged into a single 'fused' scope with fuse_heads=True (pair with
    ModelConfig(fused_heads=True)).
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

    out = rec(params, stats)
    if fuse_heads:
        names = [n for n in ("hm", "wh", "off", "lm") if n in out["heads"]]
        out = dict(out)
        out["heads"] = {"fused": fuse_head_params(out["heads"], names)}
    if bake_preprocess is not None:
        # bake BEFORE the s2d remap: the bake operates on the 3-channel stem
        out = dict(out)
        out["backbone"] = dict(out["backbone"])
        stem = dict(out["backbone"]["stem"])
        stem["conv"] = bake_preprocess_into_stem(stem["conv"], bake_preprocess)
        out["backbone"]["stem"] = stem
    if s2d_stem:
        out = dict(out)
        out["backbone"] = dict(out["backbone"])
        stem = dict(out["backbone"]["stem"])
        stem["conv"] = {
            "kernel": jnp.asarray(
                s2d_remap_stem(np.asarray(stem["conv"]["kernel"])), jnp.float32
            ),
            "bias": stem["conv"]["bias"],
        }
        out["backbone"]["stem"] = stem
    return {"params": out}
