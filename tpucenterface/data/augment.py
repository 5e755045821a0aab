"""Training augmentation: random scale/shift affine, hflip, color jitter
(SURVEY.md §2 C7 [K]: the reference family augments per image with
cv2.warpAffine-based crops). Host-side; emits uint8 canvases — normalization
stays device-side like the inference path (TPU-first: one normalize codepath).
"""

from __future__ import annotations

from typing import Optional, Tuple

import cv2
import numpy as np

from tpucenterface.config import TrainConfig


def random_affine(
    img: np.ndarray,
    boxes_xyxy: np.ndarray,
    input_size: int,
    rng: np.random.RandomState,
    scale_range: Tuple[float, float] = (0.6, 1.4),
    shift_ratio: float = 0.1,
) -> Tuple[np.ndarray, np.ndarray]:
    """Random scale + center shift, mapped onto a square canvas.

    The source window (centered at a jittered image center, side =
    max_side / scale) maps to [0, input_size)^2 via one warpAffine call;
    boxes get the same affine.
    """
    h, w = img.shape[:2]
    s = rng.uniform(*scale_range)
    cx = w / 2 + rng.uniform(-shift_ratio, shift_ratio) * w
    cy = h / 2 + rng.uniform(-shift_ratio, shift_ratio) * h
    side = max(h, w) / s
    a = input_size / side
    # x' = a*(x - cx) + input_size/2
    m = np.array(
        [[a, 0, input_size / 2 - a * cx], [0, a, input_size / 2 - a * cy]],
        np.float32,
    )
    out = cv2.warpAffine(
        img, m, (input_size, input_size), flags=cv2.INTER_LINEAR, borderValue=0
    )
    if len(boxes_xyxy):
        b = boxes_xyxy.copy().astype(np.float32)
        b[:, [0, 2]] = a * (b[:, [0, 2]] - cx) + input_size / 2
        b[:, [1, 3]] = a * (b[:, [1, 3]] - cy) + input_size / 2
    else:
        b = boxes_xyxy
    return out, b


def hflip(img: np.ndarray, boxes_xyxy: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    w = img.shape[1]
    img = np.ascontiguousarray(img[:, ::-1])
    if len(boxes_xyxy):
        b = boxes_xyxy.copy()
        b[:, [0, 2]] = w - boxes_xyxy[:, [2, 0]]
    else:
        b = boxes_xyxy
    return img, b


def color_jitter(
    img: np.ndarray, rng: np.random.RandomState, strength: float = 0.4
) -> np.ndarray:
    """Brightness/contrast jitter on uint8 (cheap, reference-family style)."""
    f = img.astype(np.float32)
    f *= rng.uniform(1 - strength, 1 + strength)               # brightness
    mean = f.mean(axis=(0, 1), keepdims=True)
    f = (f - mean) * rng.uniform(1 - strength, 1 + strength) + mean  # contrast
    return np.clip(f, 0, 255).astype(np.uint8)


def filter_boxes(
    boxes_xyxy: np.ndarray, input_size: int, min_side: float = 2.0
) -> np.ndarray:
    """Clip to canvas and drop boxes that became too small."""
    if len(boxes_xyxy) == 0:
        return boxes_xyxy.reshape(0, 4)
    b = np.clip(boxes_xyxy, 0, input_size - 1)
    wh = b[:, 2:4] - b[:, 0:2]
    return b[(wh > min_side).all(axis=1)]


def augment_train(
    img: np.ndarray,
    boxes_xyxy: np.ndarray,
    cfg: TrainConfig,
    rng: Optional[np.random.RandomState] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Full train-time augmentation -> (uint8 canvas, surviving boxes)."""
    rng = rng or np.random.RandomState()
    img, boxes = random_affine(
        img, boxes_xyxy, cfg.input_size, rng, cfg.scale_range, cfg.shift_ratio
    )
    if rng.rand() < cfg.flip_prob:
        img, boxes = hflip(img, boxes)
    if cfg.color_jitter > 0:
        img = color_jitter(img, rng, cfg.color_jitter)
    return img, filter_boxes(boxes, cfg.input_size)
