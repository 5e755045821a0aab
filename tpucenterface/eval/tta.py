"""Flip + multi-scale test-time augmentation with detection merging
(SURVEY.md §3.3 [K][B]: TTA multiplies per-image cost by #scales x 2; variable
shapes are absorbed by the detector's padded resolution buckets).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def nms(dets: np.ndarray, thresh: float = 0.4) -> np.ndarray:
    """Greedy IoU NMS over (N, 5) xyxy+score; returns kept indices.

    Uses the C++ extension (native/nms_ext.cpp) when buildable; the numpy
    loop below is the reference implementation and fallback.
    """
    if len(dets) == 0:
        return np.zeros(0, np.int64)
    from tpucenterface import native

    order0 = np.argsort(-dets[:, 4], kind="stable")
    kept = native.nms(dets[order0], thresh)
    if kept is not None:
        return order0[kept]
    x1, y1, x2, y2, s = dets.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = np.argsort(-s, kind="stable")
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        iou = w * h / (areas[i] + areas[order[1:]] - w * h)
        order = order[1:][iou <= thresh]
    return np.asarray(keep, np.int64)


def flip_detect(detector, img: np.ndarray, **kw) -> "Detections":
    """Detect on the horizontally mirrored image; un-mirror the boxes (and
    landmarks, swapping left/right point pairs per DecodeConfig.lm_flip_perm).

    Returns a `Detections` (tuple-compatible: `boxes, scores = ...[:2]`)."""
    from tpucenterface.detector import Detections

    w = img.shape[1]
    det = detector.detect(img[:, ::-1], **kw)
    boxes, scores, lm = det.boxes, det.scores, det.landmarks
    if len(boxes):
        boxes = boxes.copy()
        # img[:, ::-1] maps pixel index x -> w-1-x, so the un-mirror must use
        # the same convention (w - x would shift every box 1px; the NMS/eval
        # code uses +1 pixel-index box extents).
        x1 = w - 1 - boxes[:, 2]
        x2 = w - 1 - boxes[:, 0]
        boxes[:, 0], boxes[:, 2] = x1, x2
        if lm is not None:
            lm = lm.copy()
            lm[..., 0] = w - 1 - lm[..., 0]
            lm = lm[:, list(detector.config.decode.lm_flip_perm), :]
    return Detections(boxes, scores, lm)


def pick_bucket(buckets: Sequence[int], target: float) -> int:
    """Smallest bucket >= target, else the largest bucket."""
    for b in sorted(buckets):
        if b >= target:
            return b
    return max(buckets)


def detect_tta(
    detector,
    img: np.ndarray,
    scales: Sequence[float] = (1.0,),
    flip: bool = True,
    score_thresh: float = 0.01,
    nms_thresh: float = 0.4,
    max_dets: Optional[int] = 750,
) -> "Detections":
    """Run flip/multi-scale TTA and merge with NMS.

    `scales` multiply the image's max side to choose the model-input bucket,
    so each (scale, image-shape) pair maps onto a bounded executable set.
    Returns a `Detections` (tuple-compatible; landmark models carry their
    points through the merge — each surviving detection keeps the landmarks
    of the variant it came from).
    """
    from tpucenterface.detector import Detections

    h, w = img.shape[:2]
    parts = []
    lm_parts = []
    for s in scales:
        size = pick_bucket(detector.config.buckets, max(h, w) * s)
        for flipped in ([False, True] if flip else [False]):
            if flipped:
                d = flip_detect(detector, img, score_thresh=score_thresh, size=size)
            else:
                d = detector.detect(img, score_thresh=score_thresh, size=size)
            if len(d.boxes):
                parts.append(
                    np.concatenate([d.boxes, d.scores[:, None]], axis=1)
                )
                lm_parts.append(d.landmarks)
    if not parts:
        return Detections(
            np.zeros((0, 4), np.float32), np.zeros(0, np.float32), None
        )
    dets = np.concatenate(parts, axis=0)
    has_lm = all(l is not None for l in lm_parts)
    lms = np.concatenate(lm_parts, axis=0) if has_lm else None
    keep = nms(dets, nms_thresh)
    dets_k = dets[keep]
    order = np.argsort(-dets_k[:, 4], kind="stable")
    sel = order[:max_dets] if max_dets else order
    idx = keep[sel]
    return Detections(
        dets[idx][:, :4].astype(np.float32),
        dets[idx][:, 4].astype(np.float32),
        lms[idx].astype(np.float32) if lms is not None else None,
    )
