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
    batch_size: int = 64,
    inflight: int = 2,
) -> List["Detections"]:
    """Detect over a mixed-shape image list; returns per-image Detections.

    Same occupancy discipline as `batched_detect_tta`: 64-image chunks
    (the measured v5e knee region), a {batch_size//4, batch_size} ladder
    for ragged tails, and a depth-`inflight` pipeline of unfetched
    launches. One compiled executable per (padded shape, ladder rung).
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

    import jax.numpy as jnp

    results: List = [None] * len(images)
    ladder = sorted({max(1, batch_size // 4), batch_size})
    launched: List = []  # (chunk, out) pipeline of unfetched launches

    def drain_one():
        chunk, out = launched.pop(0)
        dets = detector.results_to_detections(out, thresh, hi=len(chunk))
        for j, i in enumerate(chunk):
            results[i] = dets[j]

    for shape, idxs in groups.items():
        for c0 in range(0, len(idxs), batch_size):
            chunk = idxs[c0 : c0 + batch_size]
            bs = min(r for r in ladder if r >= len(chunk))
            batch = np.zeros((bs,) + shape + (3,), np.uint8)
            real_hws = np.asarray(
                [images[i].shape[:2] for i in chunk], np.int32
            )
            # pre-sized chunks ride the identity program (as ServingEngine
            # does); its pad rows must carry hw=size so one signature fits
            identity = detector._identity_for(shape, size, real_hws)
            fill = size if identity else 1
            hws = np.full((bs, 2), fill, np.int32)
            for j, i in enumerate(chunk):
                batch[j] = padded[i]
                hws[j] = real_hws[j]
            fn = detector._batch_fn(bs, shape, size, identity=identity)
            launched.append((chunk, fn(jnp.asarray(batch), jnp.asarray(hws))))
            while len(launched) > inflight:
                drain_one()
    while launched:
        drain_one()
    return results


def batched_detect_tta(
    detector,
    images: Sequence[np.ndarray],
    scales: Sequence[float] = (1.0,),
    flip: bool = True,
    score_thresh: float = 0.01,
    nms_thresh: float = 0.4,
    max_dets: Optional[int] = 750,
    batch_size: int = 64,
    inflight: int = 2,
    launch_log: Optional[List[Tuple[int, Tuple[int, int], int, bool]]] = None,
) -> List["Detections"]:
    """TPU-shaped flip + multi-scale TTA over a mixed-shape image list
    (VERDICT r1 #4 / SURVEY.md §3.3 hot loop #3).

    launch_log (optional): appended with one (batch, padded_shape, size,
    flip) tuple per program launch — lets a bench harness replay the exact
    launch plan on staged arrays to separate device compute from the
    host->device transfer wall (the dominant eval cost through a relay).

    Per (scale) each image maps to a model-input bucket; work is grouped by
    (padded shape, bucket) and dispatched as fixed-size batches. The flip
    variant runs INSIDE the same jitted program (Detector._batch_flip_fn
    mirrors the letterboxed square device-side, un-mirroring boxes AND
    landmarks), so flip costs one batched forward, not a second dispatch.
    Host work is only the final per-image NMS merge. Returns a per-image
    `Detections` (tuple-compatible), score-descending; landmark models
    keep each surviving detection's points.

    Occupancy (VERDICT r2 #7, the serving engine's discipline applied to
    eval): batch_size defaults to 64 — with flip the program runs 2B=128
    images per forward, the measured v5e occupancy knee — and launches are
    PIPELINED with a depth-`inflight` deque of unfetched results, so device
    compute of launch N+1 overlaps the result fetch of launch N instead of
    stalling on a synchronous per-launch round trip. Ragged chunks ride a
    {batch_size//4, batch_size} ladder (the serving engine's batch_ladder
    idea): a 12-image tail pads to 16, not 64, bounding pad waste while
    keeping the compiled-executable set at 2 per (shape, size).
    """
    import jax.numpy as jnp

    from tpucenterface.detector import Detections
    from tpucenterface.eval.tta import nms, pick_bucket

    buckets = detector.config.buckets
    # group images by padded shape; each chunk uploads ONCE and is reused for
    # every scale bucket its images need (host->device transfer is the
    # dominant cost of eval through a relay; per-(image,scale) uploads would
    # double it for 2-scale TTA)
    padded = [pad_to_bucket(img) for img in images]
    sizes_per_img: List[Tuple[int, ...]] = []
    for img in images:
        h, w = img.shape[:2]
        sizes_per_img.append(
            tuple(pick_bucket(buckets, max(h, w) * s) for s in scales)
        )
    groups: Dict[Tuple[int, int], List[int]] = {}
    for i in range(len(images)):
        groups.setdefault(padded[i].shape[:2], []).append(i)

    parts: List[List[np.ndarray]] = [[] for _ in images]
    lm_parts: List[List] = [[] for _ in images]
    launched: List = []  # (chunk, out) pipeline of unfetched launches

    def drain_one():
        chunk, size, out = launched.pop(0)
        boxes = np.asarray(out[0])
        scores = np.asarray(out[1])
        lms = np.asarray(out[2]) if len(out) == 3 else None
        for j, i in enumerate(chunk):
            # count multiplicity: the same bucket can serve several
            # scales of one image (they'd produce identical dets)
            mult = sizes_per_img[i].count(size)
            if mult == 0:
                continue
            keep = scores[j] >= score_thresh
            if keep.any():
                d = np.concatenate(
                    [boxes[j][keep], scores[j][keep, None]], axis=1
                )
                parts[i].append(d)
                lm_parts[i].append(lms[j][keep] if lms is not None else None)

    ladder = sorted({max(1, batch_size // 4), batch_size})
    for shape, idxs in groups.items():
        for c0 in range(0, len(idxs), batch_size):
            chunk = idxs[c0 : c0 + batch_size]
            bs = min(r for r in ladder if r >= len(chunk))
            batch = np.zeros((bs,) + shape + (3,), np.uint8)
            hws = np.ones((bs, 2), np.int32)
            for j, i in enumerate(chunk):
                batch[j] = padded[i]
                hws[j] = images[i].shape[:2]
            dev_batch = jnp.asarray(batch)   # one upload per chunk
            dev_hws = jnp.asarray(hws)
            for size in sorted({s for i in chunk for s in sizes_per_img[i]}):
                if flip:
                    fn = detector._batch_flip_fn(bs, shape, size)
                else:
                    fn = detector._batch_fn(bs, shape, size)
                if launch_log is not None:
                    launch_log.append((bs, shape, size, flip))
                launched.append((chunk, size, fn(dev_batch, dev_hws)))
                while len(launched) > inflight:
                    drain_one()
    while launched:
        drain_one()

    results: List[Detections] = []
    for i in range(len(images)):
        if not parts[i]:
            results.append(
                Detections(
                    np.zeros((0, 4), np.float32), np.zeros(0, np.float32), None
                )
            )
            continue
        dets = np.concatenate(parts[i], axis=0)
        has_lm = all(l is not None for l in lm_parts[i])
        lms_i = np.concatenate(lm_parts[i], axis=0) if has_lm else None
        keep = nms(dets, nms_thresh)
        order = np.argsort(-dets[keep][:, 4], kind="stable")
        idx = keep[order[:max_dets] if max_dets else order]
        results.append(
            Detections(
                dets[idx][:, :4].astype(np.float32),
                dets[idx][:, 4].astype(np.float32),
                lms_i[idx].astype(np.float32) if lms_i is not None else None,
            )
        )
    return results
