"""Quantization-aware fine-tuning (QAT) for the W8A8 serving forward.

PTQ (QuantEngine.calibrate) leaves a small head-map error vs the float
forward (~1% of range per-tensor, ~1-2% with per-channel int8_dw). QAT
recovers part of it with two label-free stages run on the same unlabeled
frames used for calibration (self-distillation against the float forward's
own head maps — no training labels required):

1. BIAS CORRECTION (the dependable stage): quantization shifts each conv's
   per-channel output mean (rounded weights x rounded activations have a
   systematic, not just random, error component — Nagel et al.'s
   data-free-quantization observation). We measure the per-channel
   pre-activation mean gap between the float and the REAL int8 forward on
   the calibration set and absorb it into the conv biases, iterating
   front-to-back interactions over a couple of passes, with a final pass
   on the head output conv alone — that last correction reduces the
   calibration-set head-map MSE unconditionally (no nonlinearity follows
   the head output).

2. STE FINE-TUNING (optional, `steps > 0`): gradient steps through a
   differentiable simulation of the serving graph
   (quant.engine.fake_quant/fake_quant_weight):
   - weights: per-output-channel symmetric fake-quant, scale recomputed
     from the live weights each step (stop-gradient on the scale) — the
     exact rule `_quantize_weight` applies at serving trace time;
   - activations: fake-quant at the engine's calibrated scales
     (per-channel for depthwise inputs under int8_dw), frozen;
   - the stem keeps its FIXED config-derived scale (stem_preprocess).

Candidate SELECTION for both stages evaluates the full-calibration-set
loss through the REAL quantized forward (mode='quant', params traced as
arguments) and keeps the best-seen params, so QAT never ships params worse
on the served path than the PTQ point it started from.

The fine-tuned params are installed into the SAME QuantEngine whose quant
forward serves (weights quantize from `engine.p` at trace time), so the
objective QAT minimizes is exactly the serving path's deviation from
float. The Detector's float/parity weights are untouched: `dequantize()`
returns to the exact pre-QAT model.

Deployment: persist `engine.p` (weights.io.save_safetensors on
{"params": p}) next to the calibrated scales; install both in a serving
process via `Detector.quantize(scales=..., quant_params=...)`.

Reference context: the reference family ships no QAT (SURVEY.md §2 C14 —
at most PTQ through ncnn export tooling); this is TPU-native value-add
armoring the int8 serving headline's accuracy story (PERFORMANCE.md).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from tpucenterface.quant.engine import QuantEngine


def _bias_paths(engine: QuantEngine) -> Dict[str, Tuple[str, ...]]:
    """Map each conv tag of the engine graph to its bias' param-tree path
    (mirrors QuantEngine._forward's traversal order)."""
    paths: Dict[str, Tuple[str, ...]] = {
        "stem": ("backbone", "stem", "conv", "bias")
    }
    feat_strides: List[int] = []
    for i, (t, _c, _s, out_stride) in enumerate(engine.plan):
        blk = ("backbone", f"block_{i}")
        if t != 1:
            paths[f"b{i}.expand"] = blk + ("expand", "conv", "bias")
        paths[f"b{i}.dw"] = blk + ("depthwise", "conv", "bias")
        paths[f"b{i}.project"] = blk + ("project", "conv", "bias")
        nxt = engine.plan[i + 1] if i + 1 < len(engine.plan) else None
        if out_stride >= 4 and (nxt is None or nxt[3] > out_stride):
            feat_strides.append(out_stride)
    strides = sorted(feat_strides, reverse=True)
    for s in strides:
        paths[f"lat{s}"] = ("neck", f"lateral_{s}", "conv", "bias")
    for s in strides[1:]:
        paths[f"smooth{s}"] = ("neck", f"smooth_{s}", "conv", "bias")
    paths["head.conv"] = ("heads", "fused", "conv", "bias")
    paths["head.out"] = ("heads", "fused", "out", "bias")
    return paths


def _tree_get(params, path: Tuple[str, ...]):
    """Read a nested-dict leaf by path."""
    for k in path:
        params = params[k]
    return params


def _tree_set(params, path: Tuple[str, ...], value):
    """Functional nested-dict update: params[path] = value."""
    out = dict(params)
    if len(path) == 1:
        out[path[0]] = value
    else:
        out[path[0]] = _tree_set(params[path[0]], path[1:], value)
    return out


def _tree_add(params: Dict[str, Any], path: Tuple[str, ...], delta):
    """Functional nested-dict update: params[path] += delta."""
    return _tree_set(params, path, _tree_get(params, path) + delta)


def head_map_loss(out, target, keys) -> jnp.ndarray:
    """Normalized per-head MSE between two head-map dicts — THE metric of
    the label-free fine-tuning stack: qat_finetune selects candidates on it
    and adaround's e2e acceptance guard uses the identical definition (the
    two must not drift)."""
    tot = jnp.float32(0.0)
    for k in keys:
        d = out[k].astype(jnp.float32) - target[k]
        tot = tot + jnp.mean(d * d) / (jnp.mean(target[k] * target[k]) + 1e-6)
    return tot


def qat_finetune(
    engine: QuantEngine,
    batches: List[Any],
    steps: int = 100,
    lr: float = 1e-4,
    eval_every: int = 5,
    bc_passes: int = 2,
    teacher_params: Any = None,
) -> Dict[str, float]:
    """Bias-correct, then (optionally) STE-fine-tune `engine.p` so the REAL
    int8 forward matches the (frozen) float forward on `batches`.

    batches: normalized NHWC float arrays — the same tensors fed to
    `calibrate` (Detector.quantize passes its calibration batches through).
    The engine must already be calibrated (activation scales are frozen
    QAT constants).

    Loss: per-head MSE between the int8 and float head maps, normalized by
    the float map's second moment so hm/whoff/lm contribute on comparable
    scales, averaged over all batches, evaluated through the REAL quant
    forward with the candidate params cast to the engine's serving dtypes.

    Optimization shape (why selection is separate from gradients): the
    fake-quant loss is PIECEWISE-CONSTANT in most weights (moving a weight
    within its rounding bin changes nothing downstream) with jumps at bin
    boundaries, so per-step loss oscillates; and the differentiable
    fakequant forward tracks the true int8 path only to ~the bf16
    intermediate-write rounding — the same order as the PTQ error being
    removed — so descending the fakequant loss alone can fit that mismatch
    instead of the real error. STE gradients drive the UPDATES; the
    best-seen REAL-path loss decides what ships.

    Returns {loss_first, loss_bc, loss_last, steps}: loss_first is the
    full-set real-path loss at the PTQ operating point, loss_bc after bias
    correction, loss_last for the installed best-seen params —
    loss_last <= loss_first by construction.

    Installs the winning params into `engine.p` (cast back to the engine's
    original param dtypes); callers owning a Detector must invalidate its
    jit cache (Detector.quantize does this).
    """
    if engine.act_scales is None:
        raise ValueError(
            "qat_finetune requires a calibrated engine (activation scales "
            "are frozen QAT constants) — run calibrate() first"
        )
    if not batches:
        raise ValueError("qat_finetune needs at least one batch")
    import optax

    keys = ["hm", "whoff"] + (["lm"] if engine.cfg.with_landmarks else [])
    xs = [jnp.asarray(b) for b in batches]
    orig = engine.p

    # teacher_params: the float reference to distill toward — defaults to
    # engine.p; pass the PRE-adaround params when composing with adaround
    # (which rewrites engine.p on-grid), so distillation still targets the
    # true float model (Detector.quantize wires this).
    if teacher_params is None:
        teacher_params = engine.p

    # jit hygiene (same rule adaround documents): every large array —
    # calibration batches, teacher head maps, teacher params — is passed
    # as a traced ARGUMENT, never closed over. Closure constants are
    # serialized into the compiled program, which the remote-TPU compile
    # relay rejects (HTTP 413) once captures reach tens of MB; at
    # production calibration sizes (bs128@640 f32 ≈ 600 MB/batch) a
    # closure here would fail on the real target even though CPU tests
    # pass. _cast_like_orig closes over dtypes only (static, not arrays).
    @jax.jit
    def teacher(x, tp):
        out = engine._forward(x, "float", params=tp)
        return {
            k: jax.lax.stop_gradient(out[k].astype(jnp.float32)) for k in keys
        }

    ts = [teacher(x, teacher_params) for x in xs]

    def _loss_terms(out, t):
        return head_map_loss(out, t, keys)

    orig_dtypes = jax.tree.map(lambda a: a.dtype, orig)

    def _cast_like_orig(params):
        return jax.tree.map(
            lambda new, dt: new.astype(dt), params, orig_dtypes
        )

    @jax.jit
    def _full_loss_jit(params, xs_t, ts_t):
        # selection metric: the REAL int8 forward (weights quantize inside
        # the trace from the candidate params), not the STE simulation.
        # Cast to the engine's original param dtypes first — the winning
        # candidate is installed cast, so select on exactly what will serve.
        params = _cast_like_orig(params)
        tot = jnp.float32(0.0)
        for x, t in zip(xs_t, ts_t):
            tot = tot + _loss_terms(
                engine._forward(x, "quant", params=params), t
            )
        return tot / len(xs_t)

    def full_loss(params):
        return _full_loss_jit(params, tuple(xs), tuple(ts))

    def _collect_means(mode, params, xs_t):
        out: Dict[str, Any] = {}
        for x in xs_t:
            engine._bc_collector = {}
            engine._forward(x, mode, params=params)
            col, engine._bc_collector = engine._bc_collector, None
            for tag, v in col.items():
                out[tag] = out.get(tag, jnp.float32(0.0)) + v / len(xs_t)
        return out

    @jax.jit
    def _means_float_jit(tp, xs_t):
        return _collect_means("float", tp, xs_t)

    @jax.jit
    def _means_quant_jit(params, xs_t):
        return _collect_means("quant", _cast_like_orig(params), xs_t)

    def means_float():
        return _means_float_jit(teacher_params, tuple(xs))

    def means_quant(params):
        return _means_quant_jit(params, tuple(xs))

    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), orig)
    first = float(full_loss(params))
    best_loss, best_params = first, params

    # -- stage 1: per-channel bias correction against the real int8 path --
    # Monotone by construction: every candidate is built FROM the current
    # best params and kept only if the real-path loss improves. All-tag
    # passes can hurt (an inner bias shift propagates through downstream
    # quantizers and nonlinearities), so a losing pass stops the loop; the
    # final head.out-only correction runs from the best point — nothing
    # nonlinear follows the head output conv, so absorbing its mean error
    # reduces the calibration-set head MSE unconditionally.
    try:
        paths = _bias_paths(engine)
        mf = jax.device_get(means_float())
        for _ in range(max(0, int(bc_passes))):
            mq = jax.device_get(means_quant(best_params))
            cand = best_params
            for tag, path in paths.items():
                if tag in mf and tag in mq:
                    cand = _tree_add(
                        cand, path, jnp.asarray(mf[tag] - mq[tag])
                    )
            fl = float(full_loss(cand))
            if fl < best_loss:
                best_loss, best_params = fl, cand
            else:
                break
        mq = jax.device_get(means_quant(best_params))
        cand = _tree_add(
            best_params,
            paths["head.out"],
            jnp.asarray(mf["head.out"] - mq["head.out"]),
        )
        fl = float(full_loss(cand))
        if fl < best_loss:
            best_loss, best_params = fl, cand
    finally:
        engine._bc_collector = None
    loss_bc = best_loss

    # -- stage 2: STE gradient fine-tuning (optional) --
    if int(steps) > 0:
        def distill_loss(params, x, t):
            return _loss_terms(
                engine._forward(x, "fakequant", params=params), t
            )

        tx = optax.adam(lr)
        params = best_params
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, x, t):
            loss, grads = jax.value_and_grad(distill_loss)(params, x, t)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        eval_every = max(1, int(eval_every))
        for i in range(int(steps)):
            j = i % len(xs)
            params, opt_state, _ = step(params, opt_state, xs[j], ts[j])
            if (i + 1) % eval_every == 0 or i + 1 == int(steps):
                fl = float(full_loss(params))
                if fl < best_loss:
                    best_loss, best_params = fl, params

    engine.p = _cast_like_orig(best_params)
    return {
        "loss_first": first,
        "loss_bc": loss_bc,
        "loss_last": best_loss,
        "steps": int(steps),
    }
