"""AdaRound: adaptive weight rounding for the W8A8 serving forward.

Nearest-rounding (`round()`) is not the MSE-optimal int8 representation of
a conv's OUTPUT — per-weight up/down rounding choices interact through the
convolution. AdaRound (Nagel et al. 2020, "Up or Down? Adaptive Rounding
for Post-Training Quantization") learns the choice per weight by
layer-wise reconstruction on calibration data, no labels needed:

    W_q = s * clip(floor(W/s) + h(V), -qmax, qmax)   (qmax: 127 at W8, 7 at W4)
    h(V) = clip(sigmoid(V) * (zeta - gamma) + gamma, 0, 1),  zeta/gamma = 1.1/-0.1

optimizing per layer (sequential, front to back)

    || act(conv(x_hat, W_q) + b) - y_float ||^2  +  lam * sum(1 - |2h-1|^beta)

where x_hat is the QUANTIZED net's dequantized input to this conv (so
errors introduced upstream are compensated downstream — the asymmetric
reconstruction of the paper) and y_float is the ORIGINAL float net's
post-activation output. The regularizer anneals beta high->low, pushing
every h to {0,1}; the final mask is h >= 0.5.

Serving representation: instead of carrying masks as extra state, the
learned rounding is written back as ON-GRID kernels — engine.p[kernel] :=
s * clip(floor(W/s) + mask) with the per-output-channel scale frozen in
`engine.weight_scales[tag]` ("w:<tag>" in the persisted scales dict). The
serving trace's round(k/s) then reconstructs the learned rounding EXACTLY,
and the existing persistence pair (scales JSON + quant_params safetensors)
carries AdaRound with zero new deployment surface. The served program is
byte-identical in structure — only the baked weight constants move.

Composition: run after calibrate(), before qat_finetune (whose bias
correction and STE stages then start from the adarounded weights; pass the
pre-adaround params as qat's teacher so distillation still targets the
true float model — Detector.quantize wires this).

Reference context: the reference family ships no adaptive-rounding PTQ
(SURVEY.md §2 C14); TPU-native value-add on the int8 serving story.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpucenterface.quant.engine import QuantEngine
from tpucenterface.quant.qat import (
    _bias_paths,
    _tree_get,
    _tree_set,
    head_map_loss,
)

_ZETA, _GAMMA = 1.1, -0.1


def _h(v: jnp.ndarray) -> jnp.ndarray:
    """Rectified sigmoid: smooth [0, 1] rounding variable."""
    return jnp.clip(jax.nn.sigmoid(v) * (_ZETA - _GAMMA) + _GAMMA, 0.0, 1.0)


def _h_init(frac: jnp.ndarray) -> jnp.ndarray:
    """V such that h(V) == frac (the nearest-rounding fractional part) —
    optimization starts exactly at round-to-nearest."""
    p = jnp.clip((frac - _GAMMA) / (_ZETA - _GAMMA), 1e-4, 1 - 1e-4)
    return jnp.log(p / (1.0 - p))


def _kernel_paths(engine: QuantEngine) -> Dict[str, Tuple[str, ...]]:
    return {
        tag: path[:-1] + ("kernel",)
        for tag, path in _bias_paths(engine).items()
    }


def adaround(
    engine: QuantEngine,
    batches: List[Any],
    steps: int = 250,
    lr: float = 1e-2,
    reg_weight: float = 0.01,
    beta_range: Tuple[float, float] = (20.0, 2.0),
) -> Dict[str, float]:
    """Learn per-weight rounding for every quantized conv of the engine.

    batches: normalized NHWC float arrays (the calibration batches).
    Requires a calibrated engine. Rewrites engine.p kernels on-grid and
    fills engine.weight_scales; returns {tag: learned/nearest hard-rounding
    reconstruction-MSE ratio} (<= 1 by the per-layer acceptance guard)
    plus _e2e_first/_e2e_last (full-set head-map loss vs the float model
    before/after) and _accepted (0.0 = the e2e guard reverted everything:
    engine.p and weight_scales untouched).
    """
    if engine.act_scales is None:
        raise ValueError("adaround requires a calibrated engine")
    if not batches:
        raise ValueError("adaround needs at least one batch")
    shapes = {tuple(np.asarray(b).shape[1:]) for b in batches}
    if len(shapes) != 1:
        # calibrate() aggregates per-batch amax and so accepts mixed
        # spatial sizes, but layer-wise reconstruction concatenates every
        # batch's captured activations per conv — fail BEFORE the
        # expensive compiles, not mid-run with weight_scales half-written
        raise ValueError(
            f"adaround needs all calibration batches at one spatial size "
            f"(got {sorted(shapes)}); resize or split the calibration set"
        )
    import optax

    # the engine's weight grid (127 for W8, 7 for W4): AdaRound's headroom
    # over nearest rounding grows as the grid coarsens — at W8 wins sit
    # near the noise floor (paper + measured), at W4 they are decisive
    qmax = float(engine.wqmax)

    xs = [jnp.asarray(b) for b in batches]
    kpaths = _kernel_paths(engine)
    bpaths = _bias_paths(engine)
    float_p = engine.p  # the original float reference (never mutated)
    work_p = engine.p  # accumulates on-grid kernels as layers finish

    keys = ["hm", "whoff"] + (["lm"] if engine.cfg.with_landmarks else [])

    # All calibration-data forwards run JITTED with the params as traced
    # arguments (one compile each, reused across layers) — per-tag eager
    # forwards are pathologically slow through the remote-TPU tunnel.
    # Static conv metadata (stride/groups/act) is collected at trace time.
    meta: Dict[str, Dict[str, Any]] = {}

    def _split_caps(out: Dict[str, Dict[str, Any]]):
        arrays: Dict[str, Dict[str, Any]] = {}
        for tag, d in out.items():
            arrs = {}
            for k, v in d.items():
                if isinstance(v, (int, str)):
                    meta.setdefault(tag, {})[k] = v
                else:
                    arrs[k] = v
            arrays[tag] = arrs
        return arrays

    # The per-tag weight scales are a traced ARGUMENT (`w`, installed as
    # engine.weight_scales inside the trace): once a layer is written back
    # on-grid its kernel's amax-derived scale can be finer than the frozen
    # scale (max on-grid multiple < 127), so a cached trace that baked in
    # scale=None would re-round at a DIFFERENT scale than the serving
    # program. Pending layers start at their amax-derived scale —
    # bit-identical to what _quantize_weight derives from the float kernel.
    def _quantized_tag(tag: str) -> bool:
        # replicate _conv's quantize gating (depthwise only under int8_dw)
        return not (
            tag.endswith(".dw") and not engine.int8_dw
        ) and tag not in engine.skip_tags

    ws: Dict[str, jnp.ndarray] = {}
    for _tag, _kp in kpaths.items():
        if not _quantized_tag(_tag):
            continue
        _kk = jnp.asarray(_tree_get(work_p, _kp), jnp.float32)
        _amax0 = jnp.max(jnp.abs(_kk), axis=(0, 1, 2))
        ws[_tag] = (jnp.maximum(_amax0, 1e-8) / qmax).astype(jnp.float32)

    @jax.jit
    def _cap_quant(p, w, x):
        # every quantized conv's input (xq, sx) in ONE traced forward
        engine._cap_tag, engine._cap_out = "*", {}
        saved, engine.weight_scales = engine.weight_scales, w
        try:
            engine._forward(x, "quant", params=p)
            return _split_caps(engine._cap_out)
        finally:
            engine.weight_scales = saved
            engine._cap_tag, engine._cap_out = None, {}

    # NOTE on jit hygiene: every large array (params, calibration batches,
    # captured activations) is passed as a traced ARGUMENT, never closed
    # over — closure constants are serialized into the compiled program,
    # which the remote-TPU compile relay rejects outright (HTTP 413) once
    # the captures reach tens of MB.
    @jax.jit
    def _cap_float(p, x):
        # every conv's float post-activation target (float_p never moves,
        # so these are computed once up front)
        engine._cap_tag, engine._cap_out = "*", {}
        try:
            engine._forward(x, "float", params=p)
            return _split_caps(engine._cap_out)
        finally:
            engine._cap_tag, engine._cap_out = None, {}

    @jax.jit
    def _float_heads(p, x):
        out = engine._forward(x, "float", params=p)
        return {k: out[k].astype(jnp.float32) for k in keys}

    fheads = [_float_heads(float_p, x) for x in xs]

    @jax.jit
    def _e2e(p, w, xs_t, fheads_t):
        # full-set head-map loss of the quant path at params `p` vs the
        # original float model (same normalized-MSE metric qat_finetune
        # selects on)
        saved, engine.weight_scales = engine.weight_scales, w
        try:
            tot = jnp.float32(0.0)
            for x, t in zip(xs_t, fheads_t):
                q = engine._forward(x, "quant", params=p)
                tot = tot + head_map_loss(q, t, keys)
            return tot / len(xs_t)
        finally:
            engine.weight_scales = saved

    def _e2e_loss(p) -> float:
        return float(_e2e(p, ws, tuple(xs), tuple(fheads)))

    e2e_first = _e2e_loss(work_p)

    tx = optax.adam(lr)

    @partial(jax.jit, static_argnames=("stride", "groups", "act", "pad"))
    def _ada_step(v, opt_state, beta, x_hat, y_t, floor, sw, b,
                  stride, groups, act, pad):
        def recon(vv):
            kq = sw * jnp.clip(floor + _h(vv), -qmax, qmax)
            y = jax.lax.conv_general_dilated(
                x_hat, kq, (stride, stride), [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups,
                preferred_element_type=jnp.float32,
            ) + b
            if act == "relu6":
                y = jnp.clip(y, 0.0, 6.0)
            elif act == "relu":
                y = jnp.maximum(y, 0.0)
            mse = jnp.mean((y - y_t) ** 2)
            reg = jnp.mean(1.0 - jnp.abs(2.0 * _h(vv) - 1.0) ** beta)
            return mse + reg_weight * reg, mse

        (_, mse), grads = jax.value_and_grad(recon, has_aux=True)(v)
        updates, opt_state = tx.update(grads, opt_state, v)
        return optax.apply_updates(v, updates), opt_state, mse

    @partial(jax.jit, static_argnames=("stride", "groups", "act", "pad"))
    def _hard_mse(kk, x_hat, y_t, b, stride, groups, act, pad):
        y = jax.lax.conv_general_dilated(
            x_hat, kk.astype(jnp.float32), (stride, stride),
            [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.float32,
        ) + b
        if act == "relu6":
            y = jnp.clip(y, 0.0, 6.0)
        elif act == "relu":
            y = jnp.maximum(y, 0.0)
        return jnp.mean((y - y_t) ** 2)

    report: Dict[str, float] = {}
    for tag in kpaths:
        if not _quantized_tag(tag):
            continue
        # quantized-net inputs (with layers optimized so far) + float
        # targets; re-captured per layer because work_p moved (the paper's
        # sequential/asymmetric reconstruction). The current tag's xq/sx is
        # extracted per batch INSIDE the loop — holding every quantized
        # conv's captured int8 input for ALL batches simultaneously is
        # multi-GB at realistic calibration sizes; this bounds residency to
        # one batch's full capture at a time (the same one-launch-footprint
        # discipline the float-target captures below apply).
        x_hat_parts = []
        for x in xs:
            c = _cap_quant(work_p, ws, x)
            if tag not in c or "xq" not in c[tag]:
                x_hat_parts = None
                break  # tag never quantized in this graph
            x_hat_parts.append(
                c[tag]["xq"].astype(jnp.float32) * c[tag]["sx"]
            )
            del c  # free the other ~L tags' captures for this batch
        if x_hat_parts is None:
            continue
        stride, groups = meta[tag]["stride"], meta[tag]["groups"]
        act = meta[tag]["act"]
        x_hat = jnp.concatenate(x_hat_parts)
        del x_hat_parts
        # float targets re-captured per layer and extracted immediately:
        # holding every conv's float output for every batch for the whole
        # run is multi-GB at realistic calibration sizes (the capture-all
        # launch itself peaks at ONE batch's full activation footprint,
        # same order as any forward)
        y_t = jnp.concatenate(
            [_cap_float(float_p, x)[tag]["y"] for x in xs]
        )

        k = jnp.asarray(_tree_get(work_p, kpaths[tag]), jnp.float32)
        b = jnp.asarray(_tree_get(work_p, bpaths[tag]), jnp.float32)
        # THE scale for this layer: ws[tag] was derived from this exact
        # (still-float) kernel with _quantize_weight's rule — recomputing
        # here would be a second copy of that rule to keep in sync
        sw = ws[tag]
        kdiv = k / sw
        floor = jnp.floor(kdiv)
        v0 = _h_init(kdiv - floor)
        pad = (k.shape[0] - 1) // 2

        opt_state = tx.init(v0)
        v = v0
        for i in range(int(steps)):
            t = i / max(1, int(steps) - 1)
            beta = beta_range[0] + (beta_range[1] - beta_range[0]) * t
            v, opt_state, mse = _ada_step(
                v, opt_state, jnp.float32(beta), x_hat, y_t, floor, sw, b,
                stride=stride, groups=groups, act=act, pad=pad,
            )

        # final hard rounding; accept only if it beats round-to-nearest on
        # the SAME reconstruction (guards a mis-tuned run on an easy layer)
        mask = (_h(v) >= 0.5).astype(jnp.float32)
        k_new = (sw * jnp.clip(floor + mask, -qmax, qmax)).astype(
            _tree_get(work_p, kpaths[tag]).dtype
        )

        k_nearest = sw * jnp.clip(jnp.round(kdiv), -qmax, qmax)
        m_new = float(_hard_mse(k_new, x_hat, y_t, b, stride=stride,
                                groups=groups, act=act, pad=pad))
        m_near = float(_hard_mse(k_nearest, x_hat, y_t, b, stride=stride,
                                 groups=groups, act=act, pad=pad))
        if m_new <= m_near:
            work_p = _tree_set(work_p, kpaths[tag], k_new)
            report[tag] = m_new / max(m_near, 1e-12)
        else:
            # keep nearest rounding but still freeze the scale on-grid so
            # the persisted pair reproduces this decision exactly
            work_p = _tree_set(
                work_p, kpaths[tag],
                k_nearest.astype(_tree_get(work_p, kpaths[tag]).dtype),
            )
            report[tag] = 1.0
        # freeze the scale for the serving trace; ws[tag] already holds
        # this exact value, which later captures/e2e keep using (the
        # on-grid kernel's amax-derived scale may be finer — recomputing
        # would change the program)
        engine.weight_scales[tag] = np.asarray(sw)

    # e2e acceptance: per-layer reconstruction wins don't always compose at
    # 8 bits (the deviations are near the noise floor) — ship the learned
    # rounding only if the END-TO-END real-path loss did not regress;
    # otherwise revert to the untouched nearest-rounding engine.
    engine.p = work_p
    e2e_last = _e2e_loss(work_p)
    accepted = e2e_last <= e2e_first
    if not accepted:
        engine.p = float_p
        engine.weight_scales.clear()
    report["_e2e_first"] = e2e_first
    report["_e2e_last"] = e2e_last if accepted else e2e_first
    report["_accepted"] = float(accepted)
    return report
