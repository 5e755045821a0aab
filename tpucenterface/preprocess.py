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


def letterbox_normalize(
    img_u8: jnp.ndarray,
    hw: jnp.ndarray,
    size: int,
    cfg: PreprocessConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Letterbox one padded uint8 image to (size, size) and normalize. Traceable.

    img_u8: (Hp, Wp, 3) uint8, content in the top-left (h, w) region, zeros
            elsewhere. Hp/Wp are static; hw=(h, w) int32 is traced.
    Returns (x, scale, pad_xy): x (size, size, 3) f32 normalized RGB;
    scale the letterbox scale; pad_xy (2,) the [pad_x, pad_y] offset —
    both needed by `decode.boxes_to_original`.
    """
    h = hw[0].astype(jnp.float32)
    w = hw[1].astype(jnp.float32)
    s = jnp.minimum(size / h, size / w)
    if cfg.center:
        pad_x = (size - w * s) * 0.5
        pad_y = (size - h * s) * 0.5
    else:
        pad_x = jnp.float32(0.0)
        pad_y = jnp.float32(0.0)

    x = img_u8.astype(jnp.float32)
    if cfg.bgr_input:
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
    mean = jnp.asarray(cfg.mean, jnp.float32)
    std = jnp.asarray(cfg.std, jnp.float32)
    x = (x / 255.0 - mean) / std
    return x, s, jnp.stack([pad_x, pad_y])


def letterbox_normalize_batch(
    imgs_u8: jnp.ndarray,
    hws: jnp.ndarray,
    size: int,
    cfg: PreprocessConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """vmapped letterbox for a batch of same-padded-shape images.

    imgs_u8: (B, Hp, Wp, 3) uint8; hws: (B, 2) int32.
    Returns x (B, size, size, 3), scales (B,), pads (B, 2).
    """
    return jax.vmap(lambda im, hw: letterbox_normalize(im, hw, size, cfg))(
        imgs_u8, hws
    )
