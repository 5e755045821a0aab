"""W8A8 post-training quantized inference engine.

One traversal function drives three modes:
- 'float'     : plain bf16 folded forward (reference for parity tests)
- 'calibrate' : bf16 forward that records per-conv-input absolute maxima
- 'quant'     : int8 weights (per-output-channel scales, precomputed) x
                int8 activations (per-layer scales from calibration) on the
                MXU ops; depthwise stays bf16; requantization is written as
                a conv epilogue (int32 -> f32 scale+bias+ReLU6 -> bf16), but
                MEASURED REALITY (PERFORMANCE.md #4 + round-2 session-3):
                XLA does NOT fuse the q/dq elementwise chains into the int8
                convolution, so at the occupancy-bound bs32 this engine
                adds HBM passes and LOSES (1604 vs 2112 img/s e2e) — but at
                bs>=128, where the program is arithmetic-heavy, the int8
                MXU rate dominates and it WINS: 4384 vs 3832 img/s e2e.
                Opt-in serving mode via Detector.quantize() for use with
                the dynamic-batching ServingEngine; the bf16 path stays the
                parity default.

Scale conventions: symmetric, x_q = clip(round(x / s), -127, 127).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpucenterface.config import ModelConfig
from tpucenterface.model.backbone import backbone_plan


def stem_fixed_scale(pp_cfg) -> float:
    """Fixed int8 scale of the stem's `pixel - 255*mean` input:
    max(255*mean, 255*(1-mean))/127. SINGLE definition — the in-program
    stem quantization and the host-side LUT staging must agree bit-exactly
    (the int8-input path's correctness rests on it)."""
    mean = np.asarray(pp_cfg.mean, np.float64) * 255.0
    return float(np.max(np.maximum(mean, 255.0 - mean))) / 127.0


def stem_input_lut(pp_cfg) -> np.ndarray:
    """(256, 3) int8 LUT: raw uint8 pixel -> the stem conv's int8 input.

    stem_preprocess models feed `u - 255*mean` (raw-scale, mean-centered,
    original channel order — the BGR flip and /std live in the baked stem
    kernel), quantized with the FIXED config-derived scale
    max(255*mean, 255*(1-mean))/127. Both steps are per-channel functions of
    the uint8 value alone, so the whole in-program input chain collapses to
    this 256-entry per-channel table. Applying it during host staging and
    feeding int8 removes the program's quantize pass and shrinks its input
    retiling copy (measured 0.49 ms at bs128 @640, PERFORMANCE.md r3b).

    Exactness: the table is built by running the EXACT in-program chain
    (normalize_images(raw=True) -> round(x/sx) in f32) on the current
    default backend over the full 256-value ramp — on TPU the divide is a
    reciprocal approximation that a host-side float recomputation does NOT
    reproduce (measured: plain numpy differs), so bit-equality with the
    in-program quantization holds by construction, not by reimplementation.
    """
    import jax

    from tpucenterface.preprocess import normalize_images

    sx = np.float32(stem_fixed_scale(pp_cfg))
    ramp = np.tile(
        np.arange(256, dtype=np.uint8)[None, :, None, None], (1, 1, 1, 3)
    )

    @jax.jit
    def build(u):
        x = normalize_images(u, pp_cfg, raw=True)
        return jnp.clip(
            jnp.round(x.astype(jnp.float32) / jnp.float32(sx)), -127, 127
        ).astype(jnp.int8)

    return np.asarray(build(ramp)).reshape(256, 3)


def apply_stem_lut(
    imgs_u8: np.ndarray, lut: np.ndarray, nthreads: int = 0
) -> np.ndarray:
    """Host application of `stem_input_lut` to (..., 3) uint8 -> int8.

    Uses the threaded C++ staging kernel (native/stage_ext.cpp) when the
    toolchain is available; falls back to per-channel numpy fancy indexing
    (correct but ~10x slower — fine for tests, not for a serving loop)."""
    from tpucenterface import native

    out = native.stem_lut_apply(imgs_u8, lut, nthreads=nthreads)
    if out is not None:
        return out
    out = np.empty(imgs_u8.shape, np.int8)
    for c in range(3):
        out[..., c] = lut[:, c][imgs_u8[..., c]]
    return out


def _quantize_weight(k: jnp.ndarray, fixed_scale=None, qmax: int = 127):
    """Per-output-channel symmetric low-bit weight quant; k is HWIO.

    qmax: largest grid index — 127 for int8 weights, 7 for int4 (the
    values still ride int8 device arrays; sub-8-bit grids trade accuracy
    for a 2x-per-bit smaller packed export, not TPU speed — the MXU's
    narrowest operand is int8). fixed_scale: per-output-channel scale
    override (quant.adaround installs these: the kernel is then stored as
    on-grid multiples of the scale, so round() reconstructs the learned
    rounding exactly)."""
    if fixed_scale is not None:
        sw = jnp.asarray(fixed_scale, jnp.float32)
    else:
        amax = jnp.max(jnp.abs(k), axis=(0, 1, 2))
        sw = jnp.maximum(amax, 1e-8) / qmax
    kq = jnp.clip(jnp.round(k / sw), -qmax, qmax).astype(jnp.int8)
    return kq, sw.astype(jnp.float32)


def fake_quant(x: jnp.ndarray, s, qmax: int = 127) -> jnp.ndarray:
    """Differentiable quantize-dequantize (straight-through estimator).

    Forward: clip(round(x/s), -qmax, qmax) * s — the exact value the int8
    path's (quantize, epilogue-rescale) pair reconstructs. Backward: the
    round is transparent (grad 1) inside the representable range and 0
    where the clip saturates (the standard STE with clip-masking); the
    scale `s` is treated as a constant (stop-gradient), matching PTQ's
    frozen calibrated activation scales."""
    s = jax.lax.stop_gradient(jnp.asarray(s, jnp.float32))
    qmax = float(qmax)
    q = x.astype(jnp.float32) / s
    y = jnp.clip(jnp.round(q), -qmax, qmax) * s
    in_range = (q >= -qmax) & (q <= qmax)
    x32 = x.astype(jnp.float32)
    return jnp.where(
        in_range,
        x32 + jax.lax.stop_gradient(y - x32),
        jax.lax.stop_gradient(y),
    )


def fake_quant_weight(
    k: jnp.ndarray, fixed_scale=None, qmax: int = 127
) -> jnp.ndarray:
    """STE fake-quant of an HWIO kernel with the SAME per-output-channel
    scale rule `_quantize_weight` applies at serving trace time — what QAT
    optimizes is bit-aligned with what serves. The scale is recomputed from
    the live weights every step (stop-gradient on the scale itself), unless
    a fixed per-tag scale is installed (adaround)."""
    k32 = k.astype(jnp.float32)
    if fixed_scale is not None:
        sw = jnp.asarray(fixed_scale, jnp.float32)
    else:
        amax = jnp.max(jnp.abs(k32), axis=(0, 1, 2))
        sw = jnp.maximum(amax, 1e-8) / qmax
    return fake_quant(k32, sw, qmax)


class QuantEngine:
    def __init__(
        self,
        folded_variables: Dict[str, Any],
        cfg: ModelConfig,
        int8_dw: bool = False,
        pp_cfg=None,
        skip_tags=(),
        weight_bits: int = 8,
    ):
        """int8_dw: also quantize the depthwise convs (int8 x int8 -> int32
        on the VPU) and chain expand->dw->project in int8 — halves the
        traffic of the 6x-expanded tensors. A depthwise conv never mixes
        channels, so its activation quantization is PER-CHANNEL (each
        channel gets its own calibrated scale, composing exactly with the
        per-channel weight scales in the epilogue) — this removes most of
        the second-quantization error that sank the round-2 per-tensor
        variant (8-12% head-map error -> ~1-2%)."""
        self.cfg = cfg
        self.int8_dw = int8_dw
        # weight grid width: 8 -> W8A8 (the TPU-speed path), 4 -> W4A8
        # (weights on the 15-value grid inside int8 arrays; accuracy/export-
        # size study — no MXU speed change, its narrowest operand is int8).
        # Activations are ALWAYS A8. Persisted scales carry the bits under
        # "cfg:weight_bits"; set_scales refuses a mismatched install.
        if not 2 <= int(weight_bits) <= 8:
            raise ValueError(f"weight_bits must be in [2, 8]: {weight_bits}")
        self.weight_bits = int(weight_bits)
        self.wqmax = 2 ** (self.weight_bits - 1) - 1
        # convs (by tag) kept bf16 inside an otherwise-int8 forward: the
        # early 320^2 layers are emitter-bound, not MXU-rate-bound, so int8
        # buys them nothing while costing quantization error (see the
        # mixed-precision probe in PERFORMANCE.md round 3b)
        self.skip_tags = frozenset(skip_tags)
        self.p = jax.tree.map(jnp.asarray, folded_variables["params"])
        if "fused" not in self.p.get("heads", {}):
            from tpucenterface.weights.fold import fuse_head_params

            names = [n for n in ("hm", "wh", "off", "lm") if n in self.p["heads"]]
            if any("conv" not in self.p["heads"][n] for n in names):
                raise ValueError(
                    "QuantEngine requires head_conv > 0 (fused-head form "
                    "needs the hidden head conv); this model has single-1x1 "
                    "heads"
                )
            heads = fuse_head_params(self.p["heads"], names)
            self.p = dict(self.p)
            self.p["heads"] = {"fused": heads}
        self.plan = backbone_plan(cfg)
        self.act_scales: Optional[Dict[str, float]] = None
        # per-tag per-output-channel weight-scale overrides (quant.adaround:
        # the matching engine.p kernels are rewritten as on-grid multiples,
        # so trace-time round() reconstructs the learned rounding exactly);
        # persisted inside the scales dict under "w:<tag>" keys
        self.weight_scales: Dict[str, Any] = {}
        self._amax: Dict[str, float] = {}
        self._calib_percentile: Optional[float] = None
        # required for stem_preprocess models (fixed stem input scale);
        # Detector.quantize always passes it
        self.pp_cfg = pp_cfg

    def _stem_fixed_scale(self) -> float:
        """Fixed int8 scale of the stem's `pixel - 255*mean` input."""
        if self.pp_cfg is None:
            raise ValueError(
                "stem_preprocess models need pp_cfg (the PreprocessConfig "
                "whose mean defines the stem input range); pass it to "
                "QuantEngine(pp_cfg=...) — a wrong guess would silently "
                "saturate bright pixels"
            )
        return stem_fixed_scale(self.pp_cfg)

    # ------------------------------------------------------------------ #

    def _conv(
        self,
        tag: str,
        mode: str,
        x: jnp.ndarray,
        k: jnp.ndarray,
        b: jnp.ndarray,
        stride: int = 1,
        groups: int = 1,
        act: str = "relu6",
        out_dtype=jnp.bfloat16,
        out_int8_tag: Optional[str] = None,
    ) -> jnp.ndarray:
        """One conv of the engine graph.

        out_int8_tag: when set (quant mode), the output is quantized with
        the CONSUMER's calibrated activation scale inside this conv's
        epilogue and returned as int8 — the consumer then skips its input
        quantization pass. Numerically identical to quantizing at the
        consumer (same scale, same op); the win is traffic: the producer
        writes half the bytes and the standalone quantize read+write pass
        on the (6x-expanded) tensor disappears. Used on the dw -> project
        boundary, where the producer is a bf16 conv whose epilogue XLA
        fuses freely.
        """
        kh = k.shape[0]
        pad = (kh - 1) // 2
        quantize = (
            mode in ("quant", "fakequant")
            and (groups == 1 or self.int8_dw)
            and tag not in self.skip_tags
        )
        if out_int8_tag is not None and (
            out_int8_tag in self.skip_tags
            or mode not in ("quant", "fakequant")
        ):
            # consumer stays bf16 (or we're not quantizing): don't emit its
            # int8 quantization from this epilogue
            out_int8_tag = None
        # depthwise convs never mix channels -> per-channel activation quant
        per_channel = groups > 1 and self.int8_dw
        if mode == "calibrate":
            # traced: collected into the jitted calibration forward's output
            # (one device fetch per BATCH instead of one blocking sync per
            # conv — ~60 relay round trips saved per calibration batch).
            # percentile calibration (calibrate(percentile=)) clips
            # activation outliers: the scale covers the q-th percentile of
            # |x| instead of the max, trading bounded clip error on the
            # tail for finer resolution on the bulk (standard PTQ practice
            # when a few outlier activations would stretch the int8 grid)
            a = jnp.abs(x)
            q = self._calib_percentile
            if per_channel:
                self._amax_collector[tag] = (
                    jnp.max(a, axis=(0, 1, 2)) if q is None
                    else jnp.percentile(
                        a.reshape(-1, a.shape[-1]).astype(jnp.float32),
                        q, axis=0,
                    )
                )
            else:
                self._amax_collector[tag] = (
                    jnp.max(a) if q is None
                    else jnp.percentile(a.astype(jnp.float32), q)
                )
        if quantize and mode == "fakequant":
            # Differentiable f32 simulation of the int8 branch below (same
            # scales, same rounding — quant.qat): STE gradients flow into
            # k/b. out_int8 chaining is skipped (guard above); the consumer
            # applies the identical fake-quant at its own scale instead,
            # which is the same function the chained epilogue computes.
            if tag == "stem" and self.cfg.stem_preprocess:
                sx = jnp.float32(self._stem_fixed_scale())
            else:
                sx = self._act_scale(tag)
            # idempotent when the producer already applied the chained
            # epilogue fake-quant at this same scale (round/clip of values
            # already on the grid is the identity)
            xq = fake_quant(x, sx)
            kq = fake_quant_weight(k, self.weight_scales.get(tag), self.wqmax)
            y = jax.lax.conv_general_dilated(
                xq,
                kq,
                (stride, stride),
                [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups,
                preferred_element_type=jnp.float32,
            )
            y = y + b.astype(jnp.float32)
        elif quantize:
            if x.dtype == jnp.int8:
                # producer (or the host staging path, for the stem) already
                # emitted this conv's quantization — see stem_lut_u8_to_s8
                sx = (
                    jnp.float32(self._stem_fixed_scale())
                    if tag == "stem" and self.cfg.stem_preprocess
                    else self._act_scale(tag)
                )
                xq = x
            elif tag == "stem" and self.cfg.stem_preprocess:
                # stem_preprocess models feed `pixel - 255*mean` raw-scale
                # values: the range is FIXED by config constants
                # (|x| <= max(255*mean, 255*(1-mean)) ~ 151), so the stem
                # needs no calibration and its only activation error is the
                # +-sx/2 (~0.6 raw unit) rounding; the whole u8 -> x -> int8
                # chain is one fused elementwise pass writing the input at
                # int8 width instead of bf16
                sx = jnp.float32(self._stem_fixed_scale())
                xq = jnp.clip(
                    jnp.round(x.astype(jnp.float32) / sx), -127, 127
                ).astype(jnp.int8)
            else:
                sx = self._act_scale(tag)
                xq = jnp.clip(
                    jnp.round(x.astype(jnp.float32) / sx), -127, 127
                ).astype(jnp.int8)
            cap = getattr(self, "_cap_tag", None)
            if cap == tag or cap == "*":
                # adaround capture: this conv's quantized-net input + meta.
                # "*" captures every quantized conv in ONE traced forward
                # (per-tag sub-dicts) so quant.adaround can run the whole
                # collection under a single jit — per-tag eager forwards are
                # pathologically slow through the remote-TPU tunnel
                dst = (
                    self._cap_out.setdefault(tag, {})
                    if cap == "*"
                    else self._cap_out
                )
                dst.update(
                    xq=xq, sx=sx, stride=stride, groups=groups, act=act
                )
            # weights are trace constants: XLA folds this quantization at
            # compile time (do NOT cache — caching traced values leaks tracers)
            kq, sw = _quantize_weight(k, self.weight_scales.get(tag), self.wqmax)
            y = jax.lax.conv_general_dilated(
                xq,
                kq,
                (stride, stride),
                [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups,
                preferred_element_type=jnp.int32,
            )
            y = y.astype(jnp.float32) * (sx * sw) + b.astype(jnp.float32)
        else:
            # fakequant mode is a differentiable fine-tune path: keep the
            # non-quantized convs in f32 — a bf16-in/f32-out conv's VJP
            # builds a mixed-dtype transpose conv, which lax rejects
            cd = jnp.float32 if mode == "fakequant" else jnp.bfloat16
            y = jax.lax.conv_general_dilated(
                x.astype(cd),
                k.astype(cd),
                (stride, stride),
                [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups,
                preferred_element_type=jnp.float32,
            )
            y = y + b.astype(jnp.float32)
        bc = getattr(self, "_bc_collector", None)
        if bc is not None and mode in ("float", "quant"):
            # per-channel pre-activation means for QAT bias correction
            # (quant.qat.qat_finetune): traced into the jitted forward's
            # output, same pattern as the calibrate collector
            bc[tag] = jnp.mean(y.astype(jnp.float32), axis=(0, 1, 2))
        if act == "relu6":
            y = jnp.minimum(jnp.maximum(y, 0.0), 6.0)
        elif act == "relu":
            y = jnp.maximum(y, 0.0)
        if mode == "float":
            cap = getattr(self, "_cap_tag", None)
            if cap == tag or cap == "*":
                # adaround capture: the float net's post-activation target
                dst = (
                    self._cap_out.setdefault(tag, {})
                    if cap == "*"
                    else self._cap_out
                )
                dst["y"] = y.astype(jnp.float32)
        if mode == "quant" and out_int8_tag is not None:
            s_next = self._act_scale(out_int8_tag)
            return jnp.clip(
                jnp.round(y.astype(jnp.float32) / s_next), -127, 127
            ).astype(jnp.int8)
        if mode == "fakequant" and out_int8_tag is not None:
            # mirror the chained epilogue: quantize from the f32 epilogue
            # value (the real chain never sees a bf16 write here); returned
            # as f32 — the consumer's own fake_quant at the same scale is
            # the identity on these grid values
            return fake_quant(y, self._act_scale(out_int8_tag))
        return y.astype(out_dtype)

    def _act_scale(self, tag: str):
        """Calibrated activation scale for `tag`: scalar, or a per-channel
        vector for depthwise inputs under int8_dw (broadcasts over the
        trailing channel dim in both the quantize and epilogue positions)."""
        s = self.act_scales[tag]
        if isinstance(s, np.ndarray):
            return jnp.asarray(s, jnp.float32) / 127.0
        return jnp.float32(s / 127.0)

    # ------------------------------------------------------------------ #

    def _forward(
        self, x: jnp.ndarray, mode: str, params: Optional[Dict[str, Any]] = None
    ) -> Dict[str, jnp.ndarray]:
        p = self.p if params is None else params
        cfg = self.cfg
        bb = p["backbone"]
        act = "relu6" if cfg.relu6 else "relu"

        def cb(tag, node, z, stride=1, groups=1, a=act, out_int8=None):
            return self._conv(
                tag, mode, z, node["conv"]["kernel"], node["conv"]["bias"],
                stride=stride, groups=groups, act=a, out_int8_tag=out_int8,
            )

        y = cb("stem", bb["stem"], x, stride=2)
        feats: Dict[int, jnp.ndarray] = {}
        for i, (t, c, s, out_stride) in enumerate(self.plan):
            blk = bb[f"block_{i}"]
            z = y
            if t != 1:
                z = cb(f"b{i}.expand", blk["expand"], z,
                       out_int8=f"b{i}.dw" if self.int8_dw else None)
            ce = z.shape[-1]
            # dw emits int8 with the project's scale from its own epilogue:
            # kills the standalone quantize pass on the 6x-expanded tensor
            z = cb(f"b{i}.dw", blk["depthwise"], z, stride=s, groups=ce,
                   out_int8=f"b{i}.project")
            z = cb(f"b{i}.project", blk["project"], z, a="none")
            skip = s == 1 and y.shape[-1] == z.shape[-1]
            y = y + z if skip else z
            nxt = self.plan[i + 1] if i + 1 < len(self.plan) else None
            if out_stride >= 4 and (nxt is None or nxt[3] > out_stride):
                feats[out_stride] = y

        from tpucenterface.model.neck import _upsample2x

        nk = p["neck"]
        strides = sorted(feats.keys(), reverse=True)
        y = cb(f"lat{strides[0]}", nk[f"lateral_{strides[0]}"], feats[strides[0]])
        for s in strides[1:]:
            lat = cb(f"lat{s}", nk[f"lateral_{s}"], feats[s])
            y = _upsample2x(y) + lat
            y = cb(f"smooth{s}", nk[f"smooth_{s}"], y)

        hf = p["heads"]["fused"]
        z = self._conv("head.conv", mode, y, hf["conv"]["kernel"],
                       hf["conv"]["bias"], act="relu",
                       out_int8_tag="head.out")
        out_full = self._conv(
            "head.out", mode, z, hf["out"]["kernel"], hf["out"]["bias"],
            act="none", out_dtype=jnp.float32,
        )
        names = [("hm", cfg.num_classes), ("wh", 2), ("off", 2)]
        if cfg.with_landmarks:
            names.append(("lm", 10))
        out, c0 = {}, 0
        for name, n in names:
            out[name] = out_full[..., c0 : c0 + n]
            c0 += n
        # contiguous wh+off view for decode's single box-param gather
        out["whoff"] = out_full[..., cfg.num_classes : cfg.num_classes + 4]
        return out

    # ------------------------------------------------------------------ #

    def calibrate(
        self, batches: List[np.ndarray], percentile: Optional[float] = None
    ) -> Dict[str, float]:
        """Run bf16 forwards recording per-conv-input amax -> set act scales.

        batches: normalized NHWC float arrays (same distribution as serving).
        The forward runs jitted and returns the whole {tag: amax} pytree, so
        calibration costs one dispatch + one fetch per batch.

        percentile: e.g. 99.9 — clip-calibrate each activation scale at the
        q-th percentile of |x| (per-channel for depthwise under int8_dw)
        instead of the max; batches still aggregate by max of per-batch
        percentiles (conservative). None keeps exact amax calibration.
        """
        if percentile is not None and not 50.0 < percentile <= 100.0:
            raise ValueError(f"percentile must be in (50, 100], got {percentile}")
        self._calib_percentile = percentile
        self._amax = {}
        # fresh calibration = fresh quantization state (adaround re-freezes
        # weight scales AFTER calibrate when requested)
        self.weight_scales.clear()

        def fwd_amax(x):
            self._amax_collector = {}
            self._forward(x, "calibrate")
            return self._amax_collector

        jfwd = jax.jit(fwd_amax)
        for x in batches:
            amax = jax.device_get(jfwd(jnp.asarray(x)))
            for tag, v in amax.items():
                v = np.asarray(v, np.float64)
                if v.ndim:  # per-channel (depthwise under int8_dw)
                    prev = self._amax.get(tag, 0.0)
                    self._amax[tag] = np.maximum(np.maximum(v, prev), 1e-6)
                else:
                    self._amax[tag] = max(
                        self._amax.get(tag, 0.0), float(v), 1e-6
                    )
        self.act_scales = dict(self._amax)
        return self.act_scales

    def set_scales(self, scales: Dict[str, Any]) -> None:
        """Install persisted activation scales (skip calibration).

        Accepts the exact dict `calibrate`/`Detector.quantize` returned —
        floats for per-tensor entries, arrays/lists for the per-channel
        depthwise entries under int8_dw; "w:<tag>" entries are adaround's
        fixed per-output-channel weight scales (installed alongside the
        matching quant_params). Deployment contract: calibrate once,
        persist (weights.io.save_quant_scales), install everywhere.

        Replaces ALL quantization state: any previously-installed frozen
        weight scales are dropped first (a dict without "w:" entries must
        not inherit a prior install's — stale frozen scales would clip a
        re-loaded kernel's channels silently).
        """
        self.weight_scales.clear()
        out: Dict[str, Any] = {}
        for k, v in scales.items():
            if k == "cfg:weight_bits":
                # self-describing persisted dict: a W4 calibration installed
                # into a W8 engine (or vice versa) silently re-rounds every
                # kernel on the wrong grid — refuse loudly instead
                if int(v) != self.weight_bits:
                    raise ValueError(
                        f"persisted scales were calibrated at weight_bits="
                        f"{int(v)} but this engine is weight_bits="
                        f"{self.weight_bits}; pass the matching weight_bits"
                    )
                continue
            if k == "cfg:int8_dw":
                if bool(int(v)) != self.int8_dw:
                    raise ValueError(
                        f"persisted scales were calibrated with int8_dw="
                        f"{bool(int(v))} but this engine is int8_dw="
                        f"{self.int8_dw}; pass the matching int8_dw"
                    )
                continue
            if k.startswith("w:"):
                self.weight_scales[k[2:]] = np.asarray(v, np.float32)
                continue
            arr = np.asarray(v, np.float64)
            out[k] = arr if arr.ndim else max(float(arr), 1e-6)
        self.act_scales = out

    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        if self.act_scales is None:
            return self._forward(x, "float")
        return self._forward(x, "quant")

    def float_forward(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return self._forward(x, "float")
