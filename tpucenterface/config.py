"""Frozen configuration dataclasses for the whole framework.

Capability contract: SURVEY.md §0 [B] (BASELINE.json north-star). The reference
tree (`/root/reference`) has been an EMPTY mount every session, so constants
that would normally carry a reference `file:line` citation are instead tagged
``UNVERIFIED-vs-reference`` below. They are all centralized here so that a
future session with the real tree can fix them in one place (SURVEY.md §7
"Hard parts: parity without the reference tree").

Values chosen follow the canonical CenterNet/CenterFace family defaults
(SURVEY.md §2 [K]):
- ImageNet-ish mean/std used by CenterNet ctdet (mean/std below).
- stride 4 output, heatmap prior bias -log((1-0.01)/0.01).
- MobileNetV2 inverted-residual settings, FPN-lite to 24 channels.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture of backbone + neck + heads.

    UNVERIFIED-vs-reference: width_mult, fpn_channels, head_conv, relu6 —
    chosen per the CenterFace/MobileNetV2 family defaults (SURVEY.md §2 C1-C3).
    """

    # MobileNetV2 inverted-residual settings: (expand_t, channels, repeats, stride)
    inverted_residual_setting: Tuple[Tuple[int, int, int, int], ...] = (
        (1, 16, 1, 1),
        (6, 24, 2, 2),   # -> stride 4 skip
        (6, 32, 3, 2),   # -> stride 8 skip
        (6, 64, 4, 2),
        (6, 96, 3, 1),   # -> stride 16 skip
        (6, 160, 3, 2),
        (6, 320, 1, 1),  # -> stride 32 top
    )
    stem_channels: int = 32
    width_mult: float = 1.0
    fpn_channels: int = 24      # FPN-lite lateral width (CenterFace uses 24)
    head_conv: int = 24         # hidden width of each head's 3x3 conv; 0 = single 1x1
    num_classes: int = 1        # face
    with_landmarks: bool = False  # optional 5-point landmark head (10ch), stretch goal
    relu6: bool = True
    bn_eps: float = 1e-5
    bn_momentum: float = 0.9
    # Prior-probability init of the heatmap head bias: -log((1-p)/p), p=0.01.
    hm_bias_init: float = -4.59511985013459
    # Conv/matmul compute dtype on TPU; heads are always computed/cast to f32.
    compute_dtype: str = "bfloat16"
    # Dtype of the materialized BatchNorm tensors on the UNFOLDED (training)
    # path. flax computes the batch statistics in f32 internally either way;
    # this only sets the width of the normalized activations written between
    # convs — the measured dominant training cost (PERFORMANCE.md). f32 is
    # the safe default; 'bfloat16' is the measured-faster training option.
    bn_compute_dtype: str = "float32"
    # Inference hot path: BatchNorm pre-folded into conv kernel/bias
    # (weights.fold.fold_variables); False for training. The Detector folds
    # automatically.
    folded: bool = False
    # Inference hot path: head branches merged into one wide conv +
    # block-diagonal 1x1 (weights.fold.fuse_head_params). Requires folded
    # weights; the Detector applies it automatically when head_conv > 0.
    fused_heads: bool = False
    # Inference hot path: space-to-depth stem. The 3x3/stride-2 stem conv on
    # 3 channels is algebraically identical to a 2x2/stride-1 conv on the
    # 2x-space-to-depth input (12 channels, pad top/left) — same arithmetic,
    # but the MXU contraction goes K=27 im2col -> K=48 dense with no strided
    # 3-channel window (measured: the naive stem ran 6x off the HBM roofline
    # at bs32@640). Requires folded weights remapped by weights.fold
    # (s2d_stem=True) and an even input size; the Detector applies it
    # automatically.
    s2d_stem: bool = False
    # Inference input convention: True when the input normalization
    # (BGR->RGB flip and /std) has been baked into the folded stem conv
    # (weights.fold.bake_preprocess_into_stem), so programs feed the model
    # mean-centered raw pixels `u - 255*mean` instead of normalized
    # activations (the shared zero point makes the bake exact including the
    # stem conv's zero-padded borders). Set automatically by the Detector at
    # fold time (PreprocessConfig.stem_bake); False for training/unfolded.
    stem_preprocess: bool = False
    # Inference forward implementation once weights are folded:
    # 'flax' (default) = the flax modules; 'planar' =
    # model.planar_engine.PlanarEngine (hand-rolled XLA graph of the same
    # math). Measured on v5e bs32@640: the engine's bare forward is ~0.4ms
    # faster (fusion-boundary luck) but the FULL detect program is identical
    # to the flax path (2113 vs 2115 img/s) — attaching preprocess+decode
    # re-shuffles XLA's fusion boundaries and the gap vanishes. Kept as an
    # equal-speed alternative surface for future engine work.
    inference_engine: str = "flax"

    def width(self, c: int) -> int:
        """Apply width multiplier with the full MobileNet `_make_divisible`
        rule (round to nearest multiple of 8, floor 8, and the 90% rule:
        never round below 0.9x the scaled value) so width-variant presets
        match reference-family width-variant checkpoints at port time."""
        if self.width_mult == 1.0:
            return c
        scaled = c * self.width_mult
        v = max(8, int(scaled + 4) // 8 * 8)
        if v < 0.9 * scaled:
            v += 8
        return v


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DecodeConfig:
    """CenterNet decode: sigmoid -> 3x3 maxpool pseudo-NMS -> top-k -> gather.

    UNVERIFIED-vs-reference: max_dets (K), wh_log, score_thresh defaults.
    """

    stride: int = 4
    max_dets: int = 200          # K of the top-k peak extraction
    score_thresh: float = 0.35   # demo threshold; eval uses a much lower one
    # If True, box sizes are exp(wh) (CenterFace-style log-size head);
    # if False, raw wh at feature-map scale (canonical CenterNet ctdet).
    wh_log: bool = False
    # Fused Pallas decode kernel vs. the jnp decode. Default False: measured
    # on v5e, XLA's decode (channel-free maxpool + hardware top_k) runs
    # faster than the hand kernel's sequential top-K loop (~5ms) — the kernel
    # remains available for study/fallback (see decode/pallas_decode.py) and
    # is property-tested against the golden.
    use_pallas: bool = False
    # Left/right landmark index swap under horizontal mirror, for the
    # CenterFace-style 5-point layout [left_eye, right_eye, nose,
    # left_mouth_corner, right_mouth_corner]: eyes swap, nose stays, mouth
    # corners swap. UNVERIFIED-vs-reference (point ORDER is a checkpoint
    # convention; fix here if the real tree differs).
    lm_flip_perm: Tuple[int, ...] = (1, 0, 2, 4, 3)
    # Two-stage exact-by-value top-k (decode.reference.topk_2stage): measured
    # 0.79ms -> ~0.25ms at bs32 @640 K=200 on v5e. Identical values/indices
    # to lax.top_k except the ORDER of exactly-tied scores; set False for
    # bit-exact lax.top_k tie order.
    fast_topk: bool = True


# ---------------------------------------------------------------------------
# Preprocess
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PreprocessConfig:
    """Device-side letterbox + mean/std normalization.

    UNVERIFIED-vs-reference: mean/std constants (CenterNet ctdet's, in RGB
    order after BGR->RGB flip), centered letterbox, bilinear resampling.
    """

    mean: Tuple[float, float, float] = (0.408, 0.447, 0.470)
    std: Tuple[float, float, float] = (0.289, 0.274, 0.278)
    bgr_input: bool = True       # inputs are OpenCV BGR frames; flip to RGB
    center: bool = True          # center the letterboxed image (affine w/ center)
    method: str = "bilinear"
    # Resize engine: 'matmul' lowers the bilinear letterbox to two batched
    # MXU matmuls with per-image weight rows (6.5x faster than
    # jax.image.scale_and_translate on v5e, bf16); 'scale_translate' is the
    # f32 reference path used by strict-parity tests.
    resize_impl: str = "matmul"
    resize_dtype: str = "bfloat16"
    # Bake the normalize (BGR flip + std) into the folded stem conv at
    # Detector construction (weights.fold.bake_preprocess_into_stem):
    # programs then feed mean-centered raw pixels `u - 255*mean`. Exact in
    # real arithmetic (including conv borders — the zero point is shared);
    # kills the standalone normalize pass on the (B, H, W, 3) input and
    # gives the int8 engine's stem a fixed calibration-free input scale.
    # Requires a 3-channel stem at fold time (s2d-prebuilt models skip it).
    stem_bake: bool = True
    # Host-side dispatch to an identity-preprocess program (normalize only,
    # no resample) when every image in a call is exactly the model size —
    # the letterbox is scale=1/pad=0 there. MEASURED e2e-NEUTRAL on v5e
    # (2140 vs 2120 img/s bs32; 3769 vs 3847 bs128 — the resize matmuls'
    # 2.2ms op time hides under scheduling/layout effects when removed).
    # Kept default-on for exactness: pre-sized inputs skip the bf16
    # resample rounding entirely (tests/test_preprocess.py).
    identity_fast_path: bool = True


# ---------------------------------------------------------------------------
# Detector / runtime
# ---------------------------------------------------------------------------

# Padded resolution buckets for variable-shape inputs (WIDER TTA): each entry
# is a square model input size. XLA compiles one executable per bucket
# (SURVEY.md §5 "long-context N/A -> resolution buckets").
DEFAULT_BUCKETS: Tuple[int, ...] = (320, 416, 512, 640, 800, 1024)

# Host-side input images are padded up to multiples of this before device_put,
# bounding the number of distinct input shapes (and hence recompiles).
INPUT_PAD_MULTIPLE: int = 128


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    model: ModelConfig = ModelConfig()
    decode: DecodeConfig = DecodeConfig()
    preprocess: PreprocessConfig = PreprocessConfig()
    buckets: Tuple[int, ...] = DEFAULT_BUCKETS
    default_size: int = 640


def preset(name: str) -> DetectorConfig:
    """Named model-size presets (the reference family ships width variants).

    'default' (width 1.0) / 'small' (0.5) / 'large' (1.4, 48ch FPN).
    """
    if name == "default":
        return DetectorConfig()
    if name == "small":
        return DetectorConfig(model=ModelConfig(width_mult=0.5))
    if name == "large":
        return DetectorConfig(
            model=ModelConfig(width_mult=1.4, fpn_channels=48, head_conv=48)
        )
    raise KeyError(f"unknown preset '{name}' (default|small|large)")


# ---------------------------------------------------------------------------
# Training (L0/L1 of SURVEY.md §1; inference-first, built after parity)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """CenterNet training hyperparameters (SURVEY.md §2 C8/C9 [K]).

    UNVERIFIED-vs-reference: lr schedule, loss weights (canonical: hm=1,
    wh=0.1, off=1), augment ranges.
    """

    input_size: int = 640
    batch_size: int = 32
    lr: float = 5e-4
    lr_drops: Tuple[int, ...] = (90, 120)
    lr_drop_factor: float = 0.1
    epochs: int = 140
    weight_decay: float = 0.0
    hm_weight: float = 1.0
    wh_weight: float = 0.1
    off_weight: float = 1.0
    lm_weight: float = 0.1
    # render landmark regression targets from record GT (requires records
    # with a landmarks field, e.g. data.synth; pair with
    # ModelConfig.with_landmarks so the head exists to train). Records
    # without landmarks contribute lm_mask=0 rows — boxes still train.
    with_landmarks: bool = False
    focal_alpha: float = 2.0
    focal_beta: float = 4.0
    max_objs: int = 128          # per-image cap on rendered GT boxes
    # rematerialization: trade FLOPs for activation memory (jax.checkpoint
    # around the forward) — enables bigger per-chip batches at high res
    remat: bool = False
    # exponential moving average of params (0 = off): a second weight set
    # updated as ema = d*ema + (1-d)*params inside the jitted step (typical
    # d 0.999-0.9999); exported as model_ema.safetensors next to the live
    # weights — the standard detection-serving choice
    ema_decay: float = 0.0
    # global-norm gradient clipping (0 = off): optax.clip_by_global_norm
    # ahead of Adam — guards the occasional exploding focal-loss step on
    # hard batches without changing well-behaved updates
    grad_clip_norm: float = 0.0
    # FrozenBN warmup boundary (0 = off): after this many steps BatchNorm
    # switches to its running averages and stats stop updating — the
    # Detectron-style detection recipe. Why (measured, r5): on crowded
    # variable-statistics scenes the per-batch BN statistics at the deep
    # layers swing wildly batch-to-batch, the net learns to depend on
    # batch-level renormalization, and NO running average reproduces that
    # at eval (train-mode hm peaks ~0.3 vs eval-mode ~0.06 on the SAME
    # inputs/weights — the root cause of the r4 "loss falls, AP 0.0"
    # flagship failures). Freezing makes train and eval normalization
    # identical by construction for the rest of the run.
    freeze_bn_steps: int = 0
    # augmentation
    scale_range: Tuple[float, float] = (0.6, 1.4)
    shift_ratio: float = 0.1
    flip_prob: float = 0.5
    color_jitter: float = 0.4
