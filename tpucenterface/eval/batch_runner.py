"""Bucketed batched inference over variable-shape image sets
(BASELINE config #3's padded-resolution-bucket design, SURVEY.md §5).

Per-image `detect()` on WIDER val pays a full dispatch per image. This runner
groups images by their padded input bucket, packs them into fixed-size
batches (one jit signature per (bucket, B)), and pads the final partial chunk
with dummies so no extra executables are compiled. Results come back in the
caller's original order.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from tpucenterface.preprocess import pad_to_bucket


def batched_detect(
    detector,
    images: Sequence[np.ndarray],
    score_thresh: Optional[float] = None,
    size: Optional[int] = None,
    batch_size: int = 16,
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Detect over a mixed-shape image list; returns per-image (boxes, scores).

    One compiled executable per (padded bucket shape, batch_size) pair.
    """
    thresh = (
        detector.config.decode.score_thresh if score_thresh is None else score_thresh
    )
    size = size or detector.config.default_size

    groups: Dict[Tuple[int, int], List[int]] = {}
    padded = []
    for i, img in enumerate(images):
        p = pad_to_bucket(img)
        padded.append(p)
        groups.setdefault(p.shape[:2], []).append(i)

    results: List = [None] * len(images)
    for shape, idxs in groups.items():
        for c0 in range(0, len(idxs), batch_size):
            chunk = idxs[c0 : c0 + batch_size]
            n = len(chunk)
            batch = np.zeros((batch_size,) + shape + (3,), np.uint8)
            hws = np.ones((batch_size, 2), np.int32)  # dummy rows: 1x1 content
            for j, i in enumerate(chunk):
                batch[j] = padded[i]
                hws[j] = images[i].shape[:2]
            out = detector.detect_batch(
                batch, hws=hws, score_thresh=thresh, size=size
            )
            for j, i in enumerate(chunk):
                results[i] = out[j][:2] if len(out[j]) > 2 else out[j]
    return results
