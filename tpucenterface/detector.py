"""Detector API: `detect(image) -> (boxes, scores)` (SURVEY.md §2 C6, §3.1).

The product hot path, fully fused device-side per SURVEY.md §3.1 [B]:

    host: zero-pad frame to a shape bucket, device_put
    device (ONE jitted XLA program per (input-bucket, model-size) signature):
        letterbox+normalize -> backbone -> neck -> heads
        -> sigmoid/maxpool-NMS/top-k/gather decode -> inverse letterbox
    host: threshold filter of the fixed-K result

No host round trip between preprocess and boxes. Equivalent public surface to
the reference's Detector/CenterFace class (`detect(img, threshold)`), but
batched, bucketed, and jit-cached.
"""

from __future__ import annotations

import threading
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Detections(NamedTuple):
    """Typed detect() result (VERDICT r1 #8: no more 2-or-3 tuples).

    Tuple-compatible: `boxes, scores = det.detect(img)[:2]` keeps working;
    `landmarks` is None for models without the landmark head, else (N, 5, 2).
    """

    boxes: np.ndarray              # (N, 4) [x1,y1,x2,y2] original-image px
    scores: np.ndarray             # (N,) float32, descending
    landmarks: Optional[np.ndarray] = None  # (N, 5, 2) or None

from tpucenterface.config import DetectorConfig
from tpucenterface.decode.reference import boxes_to_original
from tpucenterface.model.centernet import CenterFaceNet, init_model
from tpucenterface.preprocess import (
    letterbox_normalize,
    letterbox_normalize_batch,
    pad_to_bucket,
)


def stage_inputs(fmts, imgs, hws):
    """Stage a (images, hws) launch into a `_batch_fn_auto` program's
    parameter formats — or default device placement when formats is None.

    The single point of truth for 'inputs staged exactly as ServingEngine
    launches them': ServingEngine._launch_inner, bench.py, and
    cli/bench_suite all stage through here, so the measured program and the
    production program cannot drift apart.
    """
    if fmts is None:
        return jnp.asarray(imgs), jnp.asarray(hws)
    return jax.device_put(imgs, fmts[0]), jax.device_put(hws, fmts[1])


def _export_scales(eng) -> Dict[str, Any]:
    """The FULL installable/persistable scales dict of a quantized engine:
    activation scales + any frozen "w:<tag>" adaround weight scales (a
    re-export must not drop the learned-rounding reconstruction) + the
    ALWAYS-present cfg:weight_bits/cfg:int8_dw self-description (the
    mismatch guard must be bidirectional). SINGLE definition — both
    quantize() return paths go through here so they cannot drift.
    """
    out = dict(eng.act_scales)
    out.update(
        {f"w:{t}": np.asarray(s) for t, s in eng.weight_scales.items()}
    )
    out["cfg:weight_bits"] = eng.weight_bits
    out["cfg:int8_dw"] = int(eng.int8_dw)
    return out


class Detector:
    """Face detector: model weights + fused preprocess->forward->decode programs."""

    def __init__(
        self,
        variables: Optional[Dict[str, Any]] = None,
        config: DetectorConfig = DetectorConfig(),
        rng: Optional[jax.Array] = None,
        fold_bn: bool = True,
    ):
        # pre-fold config kept for hot weight reloads (reload_weights
        # reconstructs through the same fold pipeline)
        self._init_config = config
        self._init_fold_bn = fold_bn
        self.config = config
        if variables is None:
            _, variables = init_model(config.model, rng=rng)
        if fold_bn and not config.model.folded and "batch_stats" in variables:
            # inference hot path: BN folded into conv weights + head branches
            # merged into one wide conv pair (weights.fold)
            from dataclasses import replace

            from tpucenterface.weights.fold import fold_variables

            fuse = config.model.head_conv > 0
            # s2d stem: measured SLOWER on v5e at bs32@640 (3.5ms vs 1.35ms:
            # XLA fuses the s2d transpose into the conv as a pathological
            # gather; split they cost 0.12+1.01ms, still no win because the
            # stem's N=32 output channels cap the MXU at 25%). Kept as a
            # tested, default-off option; see PERFORMANCE.md.
            s2d = config.model.s2d_stem and all(
                b % 2 == 0 for b in config.buckets
            ) and (config.default_size % 2 == 0)
            # A model INITIALIZED with s2d_stem=True already carries the 2x2
            # stem kernel — only 3x3 (standard-stem) weights need the remap.
            stem_kh = int(
                variables["params"]["backbone"]["stem"]["conv"]["kernel"].shape[0]
            )
            # bake the input normalize into the stem (lever: kills the
            # standalone normalize pass; exact int8 stem input) — needs the
            # 3-channel stem, so s2d-PREBUILT (2x2-stem) models skip it
            bake = config.preprocess.stem_bake and stem_kh == 3
            variables = fold_variables(
                variables,
                bn_eps=config.model.bn_eps,
                fuse_heads=fuse,
                s2d_stem=s2d and stem_kh == 3,
                bake_preprocess=config.preprocess if bake else None,
            )
            s2d = s2d or stem_kh == 2  # 2x2 stem: the model IS s2d-built
            config = replace(
                config,
                model=replace(
                    config.model,
                    folded=True,
                    fused_heads=fuse,
                    s2d_stem=s2d,
                    stem_preprocess=bake,
                ),
            )
            self.config = config
        self.model = CenterFaceNet(config.model)
        self.variables = variables
        # Optional PlanarEngine forward (ModelConfig.inference_engine): the
        # same math as the flax modules in a hand-rolled XLA graph. Measured
        # e2e-neutral on v5e bs32@640 (see config.py), so 'flax' stays the
        # default. s2d stems keep the flax path (the engine does not
        # implement the remapped stem).
        self._engine = None
        if (
            self.config.model.folded
            and self.config.model.inference_engine == "planar"
            and not self.config.model.s2d_stem
        ):
            from tpucenterface.model.planar_engine import PlanarEngine

            self._engine = PlanarEngine(self.variables, self.config.model)
        self._quant = None  # set by quantize(): opt-in W8A8 serving forward
        self._stem_lut = None  # lazy (256,3) LUT for int8-input staging
        self.last_qat_metrics = None  # quantize(qat_steps=) fine-tune metrics
        self.last_adaround_report = None  # quantize(adaround_steps=) ratios
        # bumped on every weights/forward swap (reload/quantize/dequantize);
        # external program caches (e.g. ServingEngine's DP wrapper cache)
        # key on it to drop stale compiled programs
        self.weights_version = 0
        self._fn_cache: Dict[Tuple, Any] = {}
        # get-or-build on the jit cache is check-then-insert; serialize it so
        # concurrent serving worker threads can't trace the same key twice
        self._fn_lock = threading.Lock()

    # ------------------------------------------------------------------ #
    # weights
    # ------------------------------------------------------------------ #

    @classmethod
    def from_safetensors(
        cls, path: str, config: DetectorConfig = DetectorConfig()
    ) -> "Detector":
        from tpucenterface.weights.io import load_safetensors

        return cls(variables=load_safetensors(path, config.model), config=config)

    @classmethod
    def from_torch_pth(
        cls, path: str, config: DetectorConfig = DetectorConfig()
    ) -> "Detector":
        """Port a torch `.pth` state_dict checkpoint (reference format)."""
        from tpucenterface.weights.port import load_torch_pth

        return cls(variables=load_torch_pth(path, config.model), config=config)

    # ------------------------------------------------------------------ #
    # fused programs
    # ------------------------------------------------------------------ #

    def _decode(self, feats: Dict[str, jnp.ndarray], max_dets: Optional[int] = None):
        """-> (boxes, scores, landmarks-or-None), all in model-input pixels.

        max_dets overrides DecodeConfig.max_dets for this program (serving
        profile: K=100 halves the top-k/gather cost vs the eval default 200
        — measured 1.31 -> 0.86 ms at bs128 @640)."""
        cfg = self.config.decode
        if max_dets is not None and max_dets != cfg.max_dets:
            from dataclasses import replace

            cfg = replace(cfg, max_dets=max_dets)
        if (
            cfg.use_pallas
            and "lm" not in feats
            and jax.default_backend() == "tpu"
        ):
            try:
                from tpucenterface.decode.pallas_decode import decode_feats_pallas

                boxes, scores = decode_feats_pallas(feats, cfg)
                return boxes, scores, None
            except ImportError:
                pass
        from tpucenterface.decode.reference import (
            decode_feats_with_idx,
            decode_landmarks,
        )

        boxes, scores, idx = decode_feats_with_idx(feats, cfg)
        lm = decode_landmarks(feats, idx, cfg) if "lm" in feats else None
        return boxes, scores, lm

    def _forward(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        if self._quant is not None:
            return self._quant(x)
        if self._engine is not None:
            return self._engine(x)
        return self.model.apply(self.variables, x, train=False)

    def quantize(
        self,
        calib_images: Optional[np.ndarray] = None,
        calib_batches: Optional[list] = None,
        size: Optional[int] = None,
        int8_dw: bool = False,
        scales: Optional[Dict[str, Any]] = None,
        calib_percentile: Optional[float] = None,
        qat_steps: int = 0,
        qat_lr: float = 1e-4,
        adaround_steps: int = 0,
        quant_params: Optional[Dict[str, Any]] = None,
        weight_bits: int = 8,
    ) -> Dict[str, float]:
        """Switch this Detector to the W8A8 int8 forward (opt-in PTQ).

        weight_bits: weight grid width — 8 (default, the TPU-speed W8A8
        path) down to 2. Sub-8-bit weights still ride int8 device arrays
        (the MXU's narrowest operand is int8), so W4A8 is an accuracy /
        packed-export-size option, not a speed lever; pair it with
        adaround_steps/qat_steps — at W4 nearest rounding alone degrades
        sharply and AdaRound's learned rounding is decisive (quant/
        adaround.py). The returned scales dict is self-describing
        ("cfg:weight_bits"); reinstalling persisted scales re-applies the
        recorded width automatically.

        Measured on v5e @640 (PERFORMANCE.md): the int8 forward LOSES at
        bs32 (the unfused q/dq chains add HBM passes to an occupancy-bound
        program) but WINS at bs>=128 (25.0 vs 27.0ms forward) where the MXU
        int8 rate dominates — use together with the dynamic-batching
        ServingEngine (runtime/serving.py). Depthwise convs stay bf16.

        NOT the parity path: head maps move by ~1% of their range
        (tests/test_quant.py pins the accuracy); keep the default bf16
        forward wherever reference-parity matters.

        Calibration: pass raw uint8 images (N, H, W, 3) — they run through
        the device-side letterbox into the serving distribution — or
        pre-normalized arrays via `calib_batches`. Returns the per-conv
        activation scales. For deployment, calibrate ONCE, persist the
        returned scales (weights.io.save_quant_scales), and pass them back
        via `scales=` on every serving process — no calibration pass, no
        run-to-run scale drift across a fleet. `calib_percentile` (e.g.
        99.9) clip-calibrates each activation scale at that percentile of
        |x| instead of the max — outlier-robust PTQ when rare activation
        spikes would stretch the int8 grid (QuantEngine.calibrate).

        AdaRound: `adaround_steps > 0` learns per-weight up/down rounding
        by layer-wise reconstruction on the calibration batches (quant.
        adaround, Nagel et al. 2020) — accepted per layer only when it
        beats round-to-nearest on the same reconstruction. The learned
        rounding is stored as on-grid kernels + frozen "w:<tag>" weight
        scales inside the RETURNED scales dict, so persistence is the
        usual pair: save the scales AND `self.quant_variables`, reinstall
        via quantize(scales=..., quant_params=...). Per-layer improvement
        ratios land in `self.last_adaround_report`.

        QAT: `qat_steps > 0` follows calibration with label-free
        quantization-aware fine-tuning (quant.qat.qat_finetune) on the same
        calibration batches: per-channel bias correction against the real
        int8 path, then `qat_steps` STE self-distillation steps, with the
        best real-path candidate selected — never worse than the PTQ point
        on the calibration set. Metrics land in `self.last_qat_metrics`
        (loss_first = the PTQ operating point, loss_bc after bias
        correction). The float/parity weights are untouched; dequantize()
        restores the exact pre-QAT model. For
        deployment, persist the fine-tuned serving params
        (`self.quant_variables`) next to the scales and install both via
        `quantize(scales=..., quant_params=...)`.

        Concurrency: quantize()/dequantize() swap the forward for
        SUBSEQUENT program builds; launches already in flight keep their
        compiled precision. Don't flip modes mid-stream on a Detector that
        live ServingEngines are using unless mixed-precision results across
        the transition are acceptable.
        """
        from tpucenterface.quant.engine import QuantEngine

        if not self.config.model.folded:
            raise ValueError("quantize() requires folded inference weights")
        if self.config.model.s2d_stem:
            raise ValueError(
                "quantize() does not support s2d stems (the int8 engine "
                "runs the standard 3x3/s2 stem); build with s2d_stem=False"
            )
        if self.config.model.head_conv <= 0:
            raise ValueError(
                "quantize() requires head_conv > 0 (the int8 engine runs "
                "the fused-head form, which needs the hidden head conv)"
            )
        if scales is not None and "cfg:weight_bits" in scales:
            # persisted dicts are self-describing — the recorded width wins
            weight_bits = int(scales["cfg:weight_bits"])
        if scales is not None and "cfg:int8_dw" in scales:
            int8_dw = bool(int(scales["cfg:int8_dw"]))
        eng = QuantEngine(
            self.variables,
            self.config.model,
            int8_dw=int8_dw,
            pp_cfg=self.config.preprocess,
            weight_bits=weight_bits,
        )
        if quant_params is not None:
            if scales is None:
                # mirror of the scales-without-fine-tune guard below: with
                # no scales, the flow would fall into calibrate(), which
                # clears the frozen "w:<tag>" weight scales these params
                # depend on, and would distill against the already
                # fine-tuned params as the "float" teacher
                raise ValueError(
                    "quant_params requires scales= (pass the persisted "
                    "pair exported by quantize(); recalibrating on top of "
                    "fine-tuned params would corrupt both the weight "
                    "scales and the distillation teacher)"
                )
            # persisted fine-tuned serving params (see quant_variables);
            # accept either the inner params tree or the {"params": ...}
            # wrapper quant_variables returns
            if "params" in quant_params and "backbone" not in quant_params:
                quant_params = quant_params["params"]
            eng.p = jax.tree.map(jnp.asarray, quant_params)
        if scales is not None:
            if qat_steps or adaround_steps:
                raise ValueError(
                    "qat_steps/adaround_steps need calibration batches (pass "
                    "calib_images/calib_batches); with persisted scales, "
                    "install the persisted fine-tuned params via "
                    "quant_params= instead"
                )
            eng.set_scales(scales)
            with self._fn_lock:
                self._quant = eng
                self.weights_version += 1
                self._fn_cache.clear()
            return _export_scales(eng)
        if calib_batches is not None:
            xs = [jnp.asarray(b) for b in calib_batches]
        elif calib_images is not None:
            size = size or self.config.default_size
            imgs = np.asarray(calib_images)
            hws = np.tile(
                np.array(imgs.shape[1:3], np.int32)[None], (imgs.shape[0], 1)
            )
            x, _, _ = letterbox_normalize_batch(
                jnp.asarray(imgs),
                jnp.asarray(hws),
                size,
                self.config.preprocess,
                raw=self.config.model.stem_preprocess,
            )
            xs = [x]
        else:
            raise ValueError(
                "pass calib_images (uint8), calib_batches, or scales"
            )
        scales = eng.calibrate(xs, percentile=calib_percentile)
        float_params = eng.p  # pre-fine-tune float reference (teacher)
        if adaround_steps:
            from tpucenterface.quant.adaround import adaround

            self.last_adaround_report = adaround(
                eng, xs, steps=adaround_steps
            )
        if qat_steps:
            from tpucenterface.quant.qat import qat_finetune

            self.last_qat_metrics = qat_finetune(
                eng, xs, steps=qat_steps, lr=qat_lr,
                teacher_params=float_params,
            )
        with self._fn_lock:
            self._quant = eng
            self.weights_version += 1
            self._fn_cache.clear()  # programs rebuild on the int8 forward
        return _export_scales(eng)

    def reload_weights(
        self,
        variables: Optional[Dict[str, Any]] = None,
        safetensors_path: Optional[str] = None,
        torch_pth_path: Optional[str] = None,
    ) -> None:
        """Hot-swap model weights (rolling update under live serving).

        New weights go through the SAME construction pipeline (BN fold, head
        fusion, engine build) as __init__, then swap in atomically under the
        jit-cache lock: launches already enqueued keep the compiled old
        weights; every subsequent program build uses the new ones (the jit
        cache is cleared). An active int8 forward is dropped — recalibrate
        via quantize() for the new weights.
        """
        if safetensors_path is not None:
            from tpucenterface.weights.io import load_safetensors

            variables = load_safetensors(
                safetensors_path, self._init_config.model
            )
        elif torch_pth_path is not None:
            from tpucenterface.weights.port import load_torch_pth

            variables = load_torch_pth(
                torch_pth_path, self._init_config.model
            )
        elif variables is None:
            raise ValueError(
                "pass variables, safetensors_path, or torch_pth_path"
            )
        fresh = Detector(
            variables=variables,
            config=self._init_config,
            fold_bn=self._init_fold_bn,
        )
        with self._fn_lock:
            self.variables = fresh.variables
            self.config = fresh.config
            self.model = fresh.model
            self._engine = fresh._engine
            self._quant = None
            self.weights_version += 1
            self._fn_cache.clear()

    @property
    def quant_variables(self) -> Dict[str, Any]:
        """{"params": ...} of the ACTIVE int8 serving forward — differs from
        `self.variables` after QAT (quantize(qat_steps=)). Persist with
        weights.io.save_safetensors and reinstall in a fresh process via
        quantize(scales=..., quant_params=loaded["params"])."""
        if self._quant is None:
            raise ValueError("quant_variables requires a quantize()d detector")
        return {"params": self._quant.p}

    def dequantize(self) -> None:
        """Return to the default bf16 forward."""
        if self._quant is not None:
            with self._fn_lock:
                self._quant = None
                self.weights_version += 1
                self._fn_cache.clear()

    def _get_or_build(self, key: Tuple, builder) -> Any:
        """Thread-safe jit-cache access: read under the lock, build outside
        (jit wrapper construction is cheap; tracing is deferred), insert
        with setdefault so concurrent builders converge on one program.

        The key carries weights_version: a builder racing with
        reload_weights()/quantize() would otherwise insert its wrapper
        AFTER the version bump's cache clear, leaving an entry from the
        old regime reachable in the new one. Versioned keys make any such
        straggler unreachable (and the clear() on version bump drops the
        old generation's entries outright)."""
        key = key + (self.weights_version,)
        with self._fn_lock:
            fn = self._fn_cache.get(key)
        if fn is None:
            run = builder()
            with self._fn_lock:
                fn = self._fn_cache.setdefault(key, run)
        return fn

    def stem_input_lut(self) -> np.ndarray:
        """(256, 3) int8 LUT for the int8-input staging path (host-side
        uint8 -> int8 quantization of pre-sized frames; see
        quant.engine.stem_input_lut for the exactness argument). Built once
        on the current backend and cached — it depends only on the
        preprocess config, not on the weights."""
        if self._quant is None or not self.config.model.stem_preprocess:
            raise ValueError(
                "stem_input_lut requires a quantize()d detector with the "
                "stem-baked preprocess"
            )
        if self._stem_lut is None:
            from tpucenterface.quant.engine import stem_input_lut

            self._stem_lut = stem_input_lut(self.config.preprocess)
        return self._stem_lut

    def _identity_for(self, padded_hw, size: int, hws) -> bool:
        """True when every image in the call is exactly the model size, so
        the identity-preprocess program applies (letterbox == scale 1/pad 0;
        PreprocessConfig.identity_fast_path). Single point of truth for the
        dispatch predicate used by detect/detect_batch/ServingEngine."""
        return (
            self.config.preprocess.identity_fast_path
            and tuple(padded_hw) == (size, size)
            and bool((np.asarray(hws) == size).all())
        )

    def results_to_detections(
        self, res, thresh: float, lo: int = 0, hi: Optional[int] = None
    ) -> List[Detections]:
        """Split a fused-program result tuple into per-image `Detections`
        (threshold applied); shared by detect_batch and the serving path."""
        boxes = np.asarray(res[0])
        scores = np.asarray(res[1])
        lms = np.asarray(res[2]) if len(res) == 3 else None
        hi = boxes.shape[0] if hi is None else hi
        out: List[Detections] = []
        for i in range(lo, hi):
            keep = scores[i] >= thresh
            out.append(
                Detections(
                    boxes[i][keep],
                    scores[i][keep],
                    lms[i][keep] if lms is not None else None,
                )
            )
        return out

    def _single_fn(self, padded_hw: Tuple[int, int], size: int, identity: bool = False):
        key = ("single", padded_hw, size, identity)
        def build():
            raw = self.config.model.stem_preprocess

            @jax.jit
            def run(img_u8: jnp.ndarray, hw: jnp.ndarray):
                if identity:
                    from tpucenterface.preprocess import normalize_images

                    x = normalize_images(img_u8, self.config.preprocess, raw=raw)
                    scale = jnp.float32(1.0)
                    pad = jnp.zeros((2,), jnp.float32)
                else:
                    x, scale, pad = letterbox_normalize(
                        img_u8, hw, size, self.config.preprocess, raw=raw
                    )
                feats = self._forward(x[None])
                boxes, scores, lm = self._decode(feats)
                boxes = boxes_to_original(boxes[0], scale, pad, hw)
                if lm is not None:
                    from tpucenterface.decode.reference import landmarks_to_original

                    return boxes, scores[0], landmarks_to_original(
                        lm[0], scale, pad, hw
                    )
                return boxes, scores[0]

            return run

        return self._get_or_build(key, build)

    def _batch_fn(
        self,
        batch: int,
        padded_hw: Tuple[int, int],
        size: int,
        identity: bool = False,
        max_dets: Optional[int] = None,
        int8_in: bool = False,
    ):
        """int8_in: the program takes HOST-QUANTIZED int8 images (the stem's
        LUT applied during staging — see stem_input_lut) instead of raw
        uint8, removing the on-device input quantize pass and shrinking the
        input retiling copy (measured 25.62 -> 25.12 ms at bs128 @640 int8_dw,
        PERFORMANCE.md r3b). Requires the int8 forward (quantize()), a
        stem_preprocess model, and the identity (pre-sized) path — the
        letterbox resize is a float op and cannot consume quantized pixels.
        """
        if int8_in:
            if not identity:
                raise ValueError("int8_in requires the identity path")
            if self._quant is None or not self.config.model.stem_preprocess:
                raise ValueError(
                    "int8_in requires a quantize()d detector with the "
                    "stem-baked preprocess (stem_preprocess=True)"
                )
        key = ("batch", batch, padded_hw, size, identity, max_dets, int8_in)
        def build():
            raw = self.config.model.stem_preprocess

            @jax.jit
            def run(imgs_u8: jnp.ndarray, hws: jnp.ndarray):
                if int8_in:
                    # already LUT-quantized on the host; the engine's stem
                    # consumes int8 directly (QuantEngine._conv)
                    x = imgs_u8
                    scales = jnp.ones((batch,), jnp.float32)
                    pads = jnp.zeros((batch, 2), jnp.float32)
                elif identity:
                    from tpucenterface.preprocess import normalize_images

                    x = normalize_images(imgs_u8, self.config.preprocess, raw=raw)
                    scales = jnp.ones((batch,), jnp.float32)
                    pads = jnp.zeros((batch, 2), jnp.float32)
                else:
                    x, scales, pads = letterbox_normalize_batch(
                        imgs_u8, hws, size, self.config.preprocess, raw=raw
                    )
                feats = self._forward(x)
                boxes, scores, lm = self._decode(feats, max_dets=max_dets)
                boxes = jax.vmap(boxes_to_original)(boxes, scales, pads, hws)
                if lm is not None:
                    from tpucenterface.decode.reference import landmarks_to_original

                    return boxes, scores, jax.vmap(landmarks_to_original)(
                        lm, scales, pads, hws
                    )
                return boxes, scores

            return run

        return self._get_or_build(key, build)

    def _batch_fn_auto(
        self,
        batch: int,
        padded_hw: Tuple[int, int],
        size: int,
        identity: bool = False,
        max_dets: Optional[int] = None,
        int8_in: bool = False,
    ):
        """Like `_batch_fn`, but compiled with XLA-chosen (AUTO) parameter
        layouts. Returns (callable, input_formats_or_None).

        The stem convolution prefers a (B, C, H, W)-tiled input layout; with
        default (row-major) parameter layouts the program relayouts the
        157MB/launch uint8 batch in-program (measured 0.4ms at bs128 @640).
        AUTO layouts move that relayout into the host->device transfer
        (jax.device_put with the returned format), off the compute-critical
        path of a pipelined serving loop. Falls back to the plain program
        (formats None) when the backend/API doesn't support it.
        """
        key = ("batch_auto", batch, padded_hw, size, identity, max_dets, int8_in)

        def build():
            fn = self._batch_fn(
                batch, padded_hw, size, identity=identity, max_dets=max_dets,
                int8_in=int8_in,
            )
            if int8_in:
                # measured (PERFORMANCE.md r3b): default layouts beat AUTO
                # for the int8-input program (25.12 vs 25.36 ms) — the input
                # retiling AUTO avoids for uint8 is cheaper from int8, and
                # AUTO's parameter-layout choice costs more than it saves
                return (fn, None)
            try:
                from jax.experimental.layout import Format, Layout

                auto = Format(Layout.AUTO)
                compiled = jax.jit(
                    lambda im, hw: fn(im, hw), in_shardings=(auto, auto)
                ).lower(
                    jax.ShapeDtypeStruct((batch, *padded_hw, 3), jnp.uint8),
                    jax.ShapeDtypeStruct((batch, 2), jnp.int32),
                ).compile()
                return (compiled, tuple(compiled.input_formats[0]))
            except Exception:  # pragma: no cover - backend without layouts
                return (fn, None)

        return self._get_or_build(key, build)

    def _batch_flip_fn(self, batch: int, padded_hw: Tuple[int, int], size: int):
        """Batched detect computing the image AND its horizontal mirror in ONE
        jitted program (flip-TTA without a second dispatch): the letterboxed
        square is mirrored device-side, both halves run through one 2B-batch
        forward, and the mirror's boxes are un-mirrored before the inverse
        letterbox. Requires a centered letterbox (pad_x symmetric), which is
        asserted at build time. Returns (boxes (B, 2K, 4), scores (B, 2K)[,
        landmarks (B, 2K, 5, 2)]) — the first K from the image, the second K
        from its mirror; the caller NMS-merges. Landmark models carry their
        points through: the mirror half's x is un-mirrored device-side and
        the left/right point pairs swapped (DecodeConfig.lm_flip_perm).
        SURVEY.md §3.3 hot loop #3 made TPU-shaped.
        """
        assert self.config.preprocess.center, "device flip needs centered letterbox"
        key = ("batch_flip", batch, padded_hw, size)
        def build():
            raw = self.config.model.stem_preprocess

            @jax.jit
            def run(imgs_u8: jnp.ndarray, hws: jnp.ndarray):
                x, scales, pads = letterbox_normalize_batch(
                    imgs_u8, hws, size, self.config.preprocess, raw=raw
                )
                x2 = jnp.concatenate([x, x[:, :, ::-1]], axis=0)
                feats = self._forward(x2)
                boxes, scores, lm = self._decode(feats)
                b_orig, b_mir = boxes[:batch], boxes[batch:]
                # mirror of the model-input square: pixel x -> (size-1) - x
                x1 = (size - 1.0) - b_mir[..., 2]
                x2_ = (size - 1.0) - b_mir[..., 0]
                b_mir = jnp.stack(
                    [x1, b_mir[..., 1], x2_, b_mir[..., 3]], axis=-1
                )
                all_boxes = jnp.concatenate([b_orig, b_mir], axis=1)  # (B,2K,4)
                all_scores = jnp.concatenate(
                    [scores[:batch], scores[batch:]], axis=1
                )
                all_boxes = jax.vmap(boxes_to_original)(
                    all_boxes, scales, pads, hws
                )
                if lm is None:
                    return all_boxes, all_scores
                from tpucenterface.decode.reference import landmarks_to_original

                lm_orig, lm_mir = lm[:batch], lm[batch:]
                # un-mirror point x, then swap left/right point pairs
                perm = list(self.config.decode.lm_flip_perm)
                lm_mir = jnp.stack(
                    [(size - 1.0) - lm_mir[..., 0], lm_mir[..., 1]], axis=-1
                )[:, :, perm, :]
                all_lm = jnp.concatenate([lm_orig, lm_mir], axis=1)
                all_lm = jax.vmap(landmarks_to_original)(
                    all_lm, scales, pads, hws
                )
                return all_boxes, all_scores, all_lm

            return run

        return self._get_or_build(key, build)

    # ------------------------------------------------------------------ #
    # public API
    # ------------------------------------------------------------------ #

    def detect(
        self,
        image: np.ndarray,
        score_thresh: Optional[float] = None,
        size: Optional[int] = None,
    ) -> Detections:
        """Detect faces in one HxWx3 uint8 (BGR by default) image.

        Returns a `Detections` (boxes[N,4] float32 [x1,y1,x2,y2] in original
        pixel coords, scores[N] float32 score-descending, landmarks or None),
        filtered at `score_thresh`.
        """
        if image.ndim != 3 or image.shape[2] != 3:
            raise ValueError(
                f"detect() expects an HxWx3 color image, got shape {image.shape}"
            )
        thresh = self.config.decode.score_thresh if score_thresh is None else score_thresh
        size = size or self.config.default_size
        h, w = image.shape[:2]
        padded = pad_to_bucket(image)
        # pre-sized input: the letterbox is scale=1/pad=0, dispatch to the
        # identity-preprocess program (PreprocessConfig.identity_fast_path)
        identity = self._identity_for(padded.shape[:2], size, (h, w))
        fn = self._single_fn(padded.shape[:2], size, identity=identity)
        out = fn(jnp.asarray(padded), jnp.array([h, w], jnp.int32))
        boxes = np.asarray(out[0])
        scores = np.asarray(out[1])
        keep = scores >= thresh
        lm = np.asarray(out[2])[keep] if len(out) == 3 else None
        return Detections(boxes[keep], scores[keep], lm)

    def detect_batch(
        self,
        images: np.ndarray,
        hws: Optional[np.ndarray] = None,
        score_thresh: Optional[float] = None,
        size: Optional[int] = None,
    ) -> List[Detections]:
        """Batched detect over images of one padded shape (B, Hp, Wp, 3) uint8.

        Returns a `Detections` per image, thresholded.
        """
        thresh = self.config.decode.score_thresh if score_thresh is None else score_thresh
        size = size or self.config.default_size
        b = images.shape[0]
        if hws is None:
            hws = np.tile(np.array(images.shape[1:3], np.int32), (b, 1))
        identity = self._identity_for(images.shape[1:3], size, hws)
        fn = self._batch_fn(b, images.shape[1:3], size, identity=identity)
        res = fn(jnp.asarray(images), jnp.asarray(hws))
        return self.results_to_detections(res, thresh)

    def warmup(self, shapes=((640, 640),), size: Optional[int] = None) -> None:
        """Pre-compile the jit programs for the given padded input shapes."""
        for h, w in shapes:
            img = np.zeros((h, w, 3), np.uint8)
            self.detect(img, size=size)
