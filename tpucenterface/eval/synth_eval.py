"""WIDER-protocol AP over in-memory records (synthetic flagship eval).

Shared by cli.train_flagship and the integration tests: runs the full
product path (device letterbox -> forward -> decode -> inverse transform)
per record and scores it with the official-protocol machinery in
eval.wider_eval. Difficulty splits follow WIDER's convention in spirit:
membership by face size, with out-of-split GT treated as ignore regions
(SURVEY.md §2 C11).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np

from tpucenterface.data.wider import WiderImage
from tpucenterface.eval.wider_eval import evaluate_detections

# (name, min face side in ORIGINAL pixels): easy = big faces only,
# hard = everything valid. A face outside the split (or flagged invalid)
# is an ignore region — detections covering it are neither TP nor FP.
DEFAULT_SPLITS: Tuple[Tuple[str, float], ...] = (
    ("easy", 50.0),
    ("medium", 25.0),
    ("hard", 0.0),
)


def _imread(path: str) -> np.ndarray:
    """Decode in STORED pixel orientation (EXIF orientation ignored).

    cv2.imread applies EXIF rotation by default, which would disagree with
    both the header-only shape pass below (PIL's im.size is the stored
    size) and WIDER-style GT boxes, which live in stored pixel space."""
    img = cv2.imread(path, cv2.IMREAD_IGNORE_ORIENTATION | cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return img


def _image_shape(path: str) -> Tuple[int, int]:
    """(h, w) of an image file WITHOUT decoding pixels where possible.

    PIL's lazy open reads only the header (microseconds/file); the cv2
    fallback decodes once and discards — still bounded memory, just slower.
    Both report the STORED dimensions (see _imread)."""
    try:
        from PIL import Image

        with Image.open(path) as im:
            w, h = im.size
        return int(h), int(w)
    except Exception:
        img = _imread(path)
        return int(img.shape[0]), int(img.shape[1])


def ap_on_records(
    det,
    records: Sequence[WiderImage],
    size: Optional[int] = None,
    score_thresh: float = 0.02,
    splits: Tuple[Tuple[str, float], ...] = DEFAULT_SPLITS,
    batch: int = 16,
) -> Dict[str, float]:
    """AP per difficulty split for `det` (a Detector) over `records`.

    Images are loaded from record paths, letterboxed device-side at `size`
    (det.config.default_size when None). Batched via detect_batch over
    host-padded images of one shape per call for device efficiency.
    """
    # ONE canvas shape for the whole eval: every image zero-padded to the
    # global max padded (H, W). The device letterbox scales from the true
    # per-image (h, w), so results match per-image dispatch exactly while
    # the TPU compiles exactly one batched program (mixed raw shapes would
    # otherwise cost one multi-minute compile per (batch, Hp, Wp)).
    #
    # Memory discipline (VERDICT r4 weakness #7): images are STREAMED —
    # a cheap header-only pass collects the per-image (h, w) up front (PIL
    # reads jpg dims without decoding pixels), then each batch decodes just
    # its own images, so peak host RSS is one padded batch, not the whole
    # set. At WIDER-val scale (3,226 mixed-size images) holding every
    # decoded frame was ~3+ GB.
    dets: List[np.ndarray] = []
    for d in _detect_records(det, records, size, score_thresh, batch):
        dets.append(np.concatenate(
            [d.boxes.reshape(-1, 4), d.scores.reshape(-1, 1)], axis=1
        ))
    return score_detections(dets, records, splits)


def _detect_records(det, records, size, score_thresh, batch):
    """Yield one Detections per record, streaming decoded images in
    batch-sized chunks (the shared product-path eval loop)."""
    from tpucenterface.config import INPUT_PAD_MULTIPLE

    hws: List[Tuple[int, int]] = [_image_shape(rec.path) for rec in records]
    m = INPUT_PAD_MULTIPLE
    hp = max(-(-h // m) * m for h, _ in hws)
    wp = max(-(-w // m) * m for _, w in hws)

    for s in range(0, len(records), batch):
        chunk = list(range(s, min(s + batch, len(records))))
        stack = np.zeros((batch, hp, wp, 3), np.uint8)
        chw = np.full((batch, 2), (hp, wp), np.int32)
        for j, i in enumerate(chunk):
            img = _imread(records[i].path)
            h, w = img.shape[:2]
            assert (h, w) == tuple(hws[i]), (records[i].path, (h, w), hws[i])
            stack[j, :h, :w] = img
            chw[j] = (h, w)
        outs = det.detect_batch(
            stack, hws=chw, score_thresh=score_thresh, size=size
        )
        for j, _ in enumerate(chunk):  # dummy pad rows beyond chunk dropped
            yield outs[j]


def score_detections(
    dets: Sequence[np.ndarray],
    records: Sequence[WiderImage],
    splits: Tuple[Tuple[str, float], ...] = DEFAULT_SPLITS,
) -> Dict[str, float]:
    """Score per-record (N,5) xyxy+score arrays against the records' GT with
    the WIDER-protocol machinery + size-based difficulty splits."""
    gts: List[np.ndarray] = []
    sides: List[np.ndarray] = []
    valid: List[np.ndarray] = []
    for rec in records:
        gts.append(rec.xyxy.astype(np.float64))
        sides.append(rec.boxes[:, 2:4].min(axis=1))
        valid.append(~rec.invalid)
    out: Dict[str, float] = {}
    for name, min_side in splits:
        keeps = [v & (s >= min_side) for v, s in zip(valid, sides)]
        out[name] = evaluate_detections(list(dets), gts, keeps)
    return out


def ap_on_records_tta(
    det,
    records: Sequence[WiderImage],
    scales: Sequence[float] = (1.0,),
    flip: bool = True,
    score_thresh: float = 0.02,
    splits: Tuple[Tuple[str, float], ...] = DEFAULT_SPLITS,
    batch: int = 64,
) -> Dict[str, float]:
    """AP per difficulty split using the production TTA path
    (eval/batch_runner.batched_detect_tta: bucketed batches, device-side
    flip, host NMS merge) — the accuracy-value measurement for SURVEY §3.3
    config #3 on the flagship model (VERDICT r4 task 7).

    Memory discipline matches ap_on_records: records are decoded in
    bounded chunks (a few TTA batches at a time), not all at once — this
    path faces WIDER-val scale (3,226 mixed-size images, ~3+ GB decoded).
    Chunking is per-image-independent, so results are identical to one
    whole-set call; only the bucket packing granularity changes."""
    dets = [
        np.concatenate(
            [d.boxes.reshape(-1, 4), d.scores.reshape(-1, 1)], axis=1
        )
        for d in _detect_records_tta(
            det, records, scales, flip, score_thresh, batch
        )
    ]
    return score_detections(dets, records, splits)


def _detect_records_tta(det, records, scales, flip, score_thresh, batch):
    """Yield one TTA-merged Detections per record, streaming decoded images
    in bounded chunks (shared by ap_on_records_tta and landmark_nme)."""
    from tpucenterface.eval.batch_runner import batched_detect_tta

    chunk_imgs = max(4 * batch, 256)
    for s in range(0, len(records), chunk_imgs):
        imgs = [_imread(rec.path) for rec in records[s:s + chunk_imgs]]
        yield from batched_detect_tta(
            det, imgs, scales=scales, flip=flip,
            score_thresh=score_thresh, batch_size=batch,
        )


def landmark_nme(
    det,
    records: Sequence[WiderImage],
    size: Optional[int] = None,
    score_thresh: float = 0.3,
    iou_thresh: float = 0.5,
    min_side: float = 0.0,
    batch: int = 16,
    tta: bool = False,
    scales: Sequence[float] = (1.0,),
    flip: bool = True,
) -> Dict[str, float]:
    """Normalized mean landmark error over IoU-matched faces.

    With tta=True, detections come from the production TTA path
    (batched_detect_tta merges flips/scales; flipped landmarks are
    un-mirrored and pair-swapped device-side), so this measures the TTA
    value for landmarks just as ap_on_records_tta does for boxes; `size`
    is then unused (TTA sizes come from scales x the image's bucket).

    The standard 5-point detector metric (RetinaFace-style): for every
    VALID GT face with known landmarks (and min box side >= min_side in
    original pixels), take the highest-scoring detection with IoU >=
    iou_thresh and average the 5 point distances, normalized by
    sqrt(gt_w * gt_h) (bbox-size normalization — robust where interocular
    distance degenerates on rotated/profile faces). Unmatched faces are
    excluded from the NME mean but reported via match_rate, so a detector
    cannot improve its NME by missing hard faces silently.

    Returns {"nme": mean normalized error, "match_rate": matched/eligible,
    "faces": eligible face count}. NaN nme when nothing matched.
    """
    errs: List[float] = []
    eligible = matched = 0
    provider = (
        _detect_records_tta(det, records, scales, flip, score_thresh, batch)
        if tta
        else _detect_records(det, records, size, score_thresh, batch)
    )
    for rec, d in zip(records, provider):
        if rec.landmarks is None or not len(rec.boxes):
            continue
        gt = rec.xyxy.astype(np.float64)
        keep = ~rec.invalid & ~np.isnan(rec.landmarks).any(axis=1)
        if min_side > 0:
            keep &= rec.boxes[:, 2:4].min(axis=1) >= min_side
        if not keep.any():
            continue
        boxes = d.boxes.reshape(-1, 4).astype(np.float64)
        lms = (
            None if d.landmarks is None
            else d.landmarks.reshape(-1, 5, 2).astype(np.float64)
        )
        for gi in np.flatnonzero(keep):
            eligible += 1
            if lms is None or not len(boxes):
                continue
            g = gt[gi]
            ix1 = np.maximum(boxes[:, 0], g[0])
            iy1 = np.maximum(boxes[:, 1], g[1])
            ix2 = np.minimum(boxes[:, 2], g[2])
            iy2 = np.minimum(boxes[:, 3], g[3])
            inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
            area_d = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
            area_g = (g[2] - g[0]) * (g[3] - g[1])
            iou = inter / np.maximum(area_d + area_g - inter, 1e-9)
            cand = np.flatnonzero(iou >= iou_thresh)
            if not len(cand):
                continue
            # detections come score-descending: first candidate wins
            di = int(cand[0])
            matched += 1
            gpts = rec.landmarks[gi].reshape(5, 2).astype(np.float64)
            dist = np.linalg.norm(lms[di] - gpts, axis=1).mean()
            errs.append(float(dist / np.sqrt(max(area_g, 1e-9))))
    return {
        "nme": float(np.mean(errs)) if errs else float("nan"),
        "match_rate": matched / eligible if eligible else 0.0,
        "faces": eligible,
    }
