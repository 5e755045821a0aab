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


def _image_shape(path: str) -> Tuple[int, int]:
    """(h, w) of an image file WITHOUT decoding pixels where possible.

    PIL's lazy open reads only the header (microseconds/file); the cv2
    fallback decodes once and discards — still bounded memory, just slower.
    """
    try:
        from PIL import Image

        with Image.open(path) as im:
            w, h = im.size
        return int(h), int(w)
    except Exception:
        img = cv2.imread(path)
        if img is None:
            raise FileNotFoundError(path)
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
    dets: List[np.ndarray] = []
    gts: List[np.ndarray] = []
    sides: List[np.ndarray] = []
    valid: List[np.ndarray] = []

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
    from tpucenterface.config import INPUT_PAD_MULTIPLE

    hws: List[Tuple[int, int]] = [_image_shape(rec.path) for rec in records]
    m = INPUT_PAD_MULTIPLE
    hp = max(-(-h // m) * m for h, _ in hws)
    wp = max(-(-w // m) * m for _, w in hws)

    results: Dict[int, np.ndarray] = {}
    for s in range(0, len(records), batch):
        chunk = list(range(s, min(s + batch, len(records))))
        stack = np.zeros((batch, hp, wp, 3), np.uint8)
        chw = np.full((batch, 2), (hp, wp), np.int32)
        for j, i in enumerate(chunk):
            img = cv2.imread(records[i].path)
            if img is None:
                raise FileNotFoundError(records[i].path)
            h, w = img.shape[:2]
            assert (h, w) == tuple(hws[i]), (records[i].path, (h, w), hws[i])
            stack[j, :h, :w] = img
            chw[j] = (h, w)
        outs = det.detect_batch(
            stack, hws=chw, score_thresh=score_thresh, size=size
        )
        for j, i in enumerate(chunk):  # dummy pad rows beyond chunk dropped
            d = outs[j]
            results[i] = np.concatenate(
                [d.boxes.reshape(-1, 4), d.scores.reshape(-1, 1)], axis=1
            )

    for i in range(len(records)):
        dets.append(results[i])
    return score_detections(dets, records, splits)


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
    config #3 on the flagship model (VERDICT r4 task 7)."""
    imgs = [cv2.imread(rec.path) for rec in records]
    for rec, img in zip(records, imgs):
        if img is None:
            raise FileNotFoundError(rec.path)

    from tpucenterface.eval.batch_runner import batched_detect_tta

    outs = batched_detect_tta(
        det, imgs, scales=scales, flip=flip,
        score_thresh=score_thresh, batch_size=batch,
    )
    dets = [
        np.concatenate(
            [d.boxes.reshape(-1, 4), d.scores.reshape(-1, 1)], axis=1
        )
        for d in outs
    ]
    return score_detections(dets, records, splits)
