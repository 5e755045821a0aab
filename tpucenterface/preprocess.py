"""Device-side letterbox + mean-std normalization (SURVEY.md §2 C5, §3.1 [B]).

The reference family does preprocessing on the host with OpenCV
(`cv2.warpAffine` / letterbox + /255 + mean-std, HWC->CHW) — a per-image host
round trip. TPU-first replacement: the ONLY host work is zero-padding the raw
uint8 frame up to a shape bucket (bounding recompiles); everything else —
BGR->RGB, letterbox resample to the square model input, /255, mean-std —
happens inside the jitted program via `jax.image.scale_and_translate`, which
accepts *traced* scale/translation, so one compiled executable serves every
content size that fits the padded input bucket.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpucenterface.config import INPUT_PAD_MULTIPLE, PreprocessConfig


def pad_to_bucket(img: np.ndarray, multiple: int = INPUT_PAD_MULTIPLE) -> np.ndarray:
    """Host-side: zero-pad HxWx3 uint8 image up to the next shape bucket.

    Bounds the number of distinct jit signatures; the true content size is
    passed separately as a traced (h, w) scalar pair.
    """
    h, w = img.shape[:2]
    hp = -(-h // multiple) * multiple
    wp = -(-w // multiple) * multiple
    if hp == h and wp == w:
        return np.ascontiguousarray(img)
    out = np.zeros((hp, wp) + img.shape[2:], dtype=img.dtype)
    out[:h, :w] = img
    return out


def _letterbox_params(hw: jnp.ndarray, size: int, cfg: PreprocessConfig):
    h = hw[..., 0].astype(jnp.float32)
    w = hw[..., 1].astype(jnp.float32)
    s = jnp.minimum(size / h, size / w)
    if cfg.center:
        pad_x = (size - w * s) * 0.5
        pad_y = (size - h * s) * 0.5
    else:
        pad_x = jnp.zeros_like(s)
        pad_y = jnp.zeros_like(s)
    return s, pad_x, pad_y


def _bilinear_rows(n_in: int, size: int, pad, scale, dtype) -> jnp.ndarray:
    """Per-image bilinear resampling matrix (B, size, n_in), zero outside.

    Output pixel o samples input coordinate (o + 0.5 - pad)/scale - 0.5 with
    triangular (linear, no antialias) weights — cv2.INTER_LINEAR semantics.
    """
    o = jnp.arange(size, dtype=jnp.float32)[None, :, None]
    i = jnp.arange(n_in, dtype=jnp.float32)[None, None, :]
    u = (o + 0.5 - pad[:, None, None]) / scale[:, None, None] - 0.5
    return jnp.maximum(0.0, 1.0 - jnp.abs(u - i)).astype(dtype)


def letterbox_normalize_matmul(
    imgs_u8: jnp.ndarray,
    hws: jnp.ndarray,
    size: int,
    cfg: PreprocessConfig,
    raw: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched letterbox as two MXU matmuls (the TPU hot path).

    imgs_u8 (B, Hp, Wp, 3) uint8, hws (B, 2) -> (x (B,S,S,3), scales (B,),
    pads (B,2)). Bilinear weight rows are built per image on the VPU; the
    resample itself is einsum over rows then columns — measured 6.5x faster
    than per-image scale_and_translate at bs32 (see bench/timing.py for why
    naive timings lied about this).

    raw=True (stem_preprocess models): no BGR flip, no std division — emit
    `resampled - 255*mean` (mean-centered raw scale) in the original channel
    order; the stem conv carries the rest of the normalize
    (weights.fold.bake_preprocess_into_stem).
    """
    b, hp, wp, _ = imgs_u8.shape
    dtype = jnp.dtype(cfg.resize_dtype)
    s, pad_x, pad_y = _letterbox_params(hws, size, cfg)
    wy = _bilinear_rows(hp, size, pad_y, s, dtype)
    wx = _bilinear_rows(wp, size, pad_x, s, dtype)
    x = imgs_u8.astype(dtype)
    if cfg.bgr_input and not raw:
        x = x[..., ::-1]
    y = jnp.einsum("bsh,bhwc->bswc", wy, x, preferred_element_type=jnp.float32)
    # Emit the second contraction in (c, b, s, t) order and transpose back
    # LOGICALLY: XLA then lays the tensor out the way the stem convolution's
    # emitter wants and skips the (32,640,640,3) relayout copy it inserted
    # after a plain "->bstc" einsum (profiled: 0.85ms -> ~0.4ms of the
    # preprocess->stem boundary recovered at bs32 @640).
    y = jnp.einsum(
        "btw,bswc->cbst", wx, y.astype(dtype), preferred_element_type=jnp.float32
    )
    if raw:
        from tpucenterface.weights.fold import raw_pixel_offset

        off = jnp.asarray(raw_pixel_offset(cfg), jnp.float32).reshape(3, 1, 1, 1)
        x = (y - off).astype(dtype).transpose(1, 2, 3, 0)
    else:
        mean = (jnp.asarray(cfg.mean, jnp.float32) * 255.0).reshape(3, 1, 1, 1)
        std = (jnp.asarray(cfg.std, jnp.float32) * 255.0).reshape(3, 1, 1, 1)
        x = ((y - mean) / std).astype(dtype).transpose(1, 2, 3, 0)
    return x, s, jnp.stack([pad_x, pad_y], axis=-1)


def normalize_images(
    imgs_u8: jnp.ndarray, cfg: PreprocessConfig, raw: bool = False
) -> jnp.ndarray:
    """Exact preprocess for inputs already at the model size: BGR->RGB +
    mean/std normalize, NO resample. raw=True (stem_preprocess models):
    just `pixel - 255*mean` (input channel order) — one subtract XLA fuses
    into the consumer; the stem conv carries the flip and std.

    For an (..., size, size, 3) input the letterbox is scale=1 / pad=0 — a
    mathematical identity — so the two resize contractions (dense bilinear
    matmuls) are skippable. The Detector dispatches here host-side when
    every image in the call is exactly the model size (the common pre-sized
    serving case); boxes come back through the same inverse letterbox with
    scale 1 / pad 0. MEASURED e2e-neutral on v5e (the matmuls' 2.2ms op
    time hides under scheduling/layout effects once removed — see
    PERFORMANCE.md); the real benefit is exactness: no bf16 resample
    rounding on pre-sized inputs.
    """
    dtype = jnp.dtype(cfg.resize_dtype)
    if raw:
        from tpucenterface.weights.fold import raw_pixel_offset

        off = jnp.asarray(raw_pixel_offset(cfg), jnp.float32)
        return (imgs_u8.astype(jnp.float32) - off).astype(dtype)
    x = imgs_u8.astype(jnp.float32)
    if cfg.bgr_input:
        x = x[..., ::-1]
    mean = jnp.asarray(cfg.mean, jnp.float32) * 255.0
    std = jnp.asarray(cfg.std, jnp.float32) * 255.0
    return ((x - mean) / std).astype(dtype)


def letterbox_normalize(
    img_u8: jnp.ndarray,
    hw: jnp.ndarray,
    size: int,
    cfg: PreprocessConfig,
    raw: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Letterbox one padded uint8 image to (size, size) and normalize. Traceable.

    img_u8: (Hp, Wp, 3) uint8, content in the top-left (h, w) region, zeros
            elsewhere. Hp/Wp are static; hw=(h, w) int32 is traced.
    Returns (x, scale, pad_xy): x (size, size, 3) f32 normalized RGB;
    scale the letterbox scale; pad_xy (2,) the [pad_x, pad_y] offset —
    both needed by `decode.boxes_to_original`.

    Dispatches to the matmul implementation unless cfg.resize_impl says
    otherwise (the scale_and_translate path is the f32 parity reference).
    """
    if cfg.resize_impl == "matmul":
        x, s, pads = letterbox_normalize_matmul(
            img_u8[None], hw[None], size, cfg, raw=raw
        )
        return x[0], s[0], pads[0]
    s, pad_x, pad_y = _letterbox_params(hw, size, cfg)

    x = img_u8.astype(jnp.float32)
    if cfg.bgr_input and not raw:
        x = x[..., ::-1]
    # Letterbox: input pixel i maps to output i*s + pad. Outside samples are 0
    # (black borders), matching a host-side zero-fill letterbox.
    x = jax.image.scale_and_translate(
        x,
        shape=(size, size, 3),
        spatial_dims=(0, 1),
        scale=jnp.stack([s, s]),
        translation=jnp.stack([pad_y, pad_x]),
        method=cfg.method,
        antialias=False,  # match cv2.resize(INTER_LINEAR); UNVERIFIED-vs-reference
    )
    if raw:
        from tpucenterface.weights.fold import raw_pixel_offset

        x = x - jnp.asarray(raw_pixel_offset(cfg), jnp.float32)
    else:
        mean = jnp.asarray(cfg.mean, jnp.float32)
        std = jnp.asarray(cfg.std, jnp.float32)
        x = (x / 255.0 - mean) / std
    return x, s, jnp.stack([pad_x, pad_y])


def letterbox_normalize_batch(
    imgs_u8: jnp.ndarray,
    hws: jnp.ndarray,
    size: int,
    cfg: PreprocessConfig,
    raw: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """vmapped letterbox for a batch of same-padded-shape images.

    imgs_u8: (B, Hp, Wp, 3) uint8; hws: (B, 2) int32.
    Returns x (B, size, size, 3), scales (B,), pads (B, 2).
    """
    if cfg.resize_impl == "matmul":
        return letterbox_normalize_matmul(imgs_u8, hws, size, cfg, raw=raw)
    return jax.vmap(
        lambda im, hw: letterbox_normalize(im, hw, size, cfg, raw=raw)
    )(imgs_u8, hws)
