"""WIDER FACE AP evaluation protocol (SURVEY.md §2 C11, §3.3 [K][B]).

Vectorized-numpy reimplementation of the standard WIDER eval-tools protocol
(the reference family vendors the Python/Cython port of the official MATLAB
tool; here the IoU matching is vectorized numpy — the TPU-native equivalent
of its `bbox_overlaps` Cython kernel per SURVEY.md §2's native-component
obligation):

  per image: greedy score-descending IoU(>=0.5) match of detections to GT,
  honoring the per-difficulty keep list (non-kept GT are "ignored": matching
  them voids the detection rather than scoring it);
  dataset: 1000 score thresholds -> PR curve -> all-point AP.

Ground truth comes either from the official `.mat` files (scipy.io) or from
in-memory box lists (unit tests, synthetic data).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

NUM_THRESH = 1000


def bbox_overlaps(boxes: np.ndarray, query: np.ndarray) -> np.ndarray:
    """IoU matrix (N, M) for xyxy boxes (+1 pixel convention).

    C++ extension when available (native/); vectorized numpy fallback below
    doubles as the reference implementation.
    """
    if len(boxes) == 0 or len(query) == 0:
        return np.zeros((len(boxes), len(query)), np.float64)
    from tpucenterface import native

    out = native.bbox_overlaps(boxes, query)
    if out is not None:
        return out
    b = boxes[:, None, :]  # (N,1,4)
    q = query[None, :, :]  # (1,M,4)
    ix = np.maximum(
        0.0,
        np.minimum(b[..., 2], q[..., 2]) - np.maximum(b[..., 0], q[..., 0]) + 1,
    )
    iy = np.maximum(
        0.0,
        np.minimum(b[..., 3], q[..., 3]) - np.maximum(b[..., 1], q[..., 1]) + 1,
    )
    inter = ix * iy
    area_b = (b[..., 2] - b[..., 0] + 1) * (b[..., 3] - b[..., 1] + 1)
    area_q = (q[..., 2] - q[..., 0] + 1) * (q[..., 3] - q[..., 1] + 1)
    return inter / np.maximum(area_b + area_q - inter, 1e-10)


def image_eval(
    pred: np.ndarray,
    gt: np.ndarray,
    keep_mask: np.ndarray,
    iou_thresh: float = 0.5,
) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy per-image matching (score-descending pred order assumed).

    pred: (N, 5) xyxy+score. gt: (M, 4) xyxy. keep_mask: (M,) bool — GT in
    the current difficulty subset; others are ignore regions.
    Returns (pred_recall (N,), proposal (N,)): pred_recall[i] = #kept GT
    matched within the first i+1 detections; proposal[i] = 1 if detection i
    counts as a proposal (it didn't cover an ignored GT), else 0.
    """
    n = len(pred)
    pred_recall = np.zeros(n, np.int32)
    proposal = np.ones(n, np.int32)
    if n == 0:
        return pred_recall, proposal
    if len(gt) == 0:
        return pred_recall, proposal

    overlaps = bbox_overlaps(pred[:, :4].astype(np.float64), gt.astype(np.float64))
    matched = np.zeros(len(gt), np.int32)  # 0 unmatched, 1 matched, -1 ignored-hit
    recall_count = 0
    for h in range(n):
        mi = int(np.argmax(overlaps[h]))
        if overlaps[h, mi] >= iou_thresh:
            if not keep_mask[mi]:
                proposal[h] = 0
            elif matched[mi] == 0:
                matched[mi] = 1
                recall_count += 1
        pred_recall[h] = recall_count
    return pred_recall, proposal


def img_pr_info(
    thresholds: np.ndarray,
    pred_scores: np.ndarray,
    proposal: np.ndarray,
    pred_recall: np.ndarray,
) -> np.ndarray:
    """Per-image PR contributions at each score threshold: (T, 2) = (#proposals, recall)."""
    t_count = len(thresholds)
    info = np.zeros((t_count, 2), np.int64)
    if len(pred_scores) == 0:
        return info
    # detections sorted score-descending: index of last det >= threshold
    counts = np.searchsorted(-pred_scores, -thresholds, side="right")
    cum_prop = np.cumsum(proposal)
    for t in range(t_count):
        k = counts[t]
        if k == 0:
            continue
        info[t, 0] = cum_prop[k - 1]
        info[t, 1] = pred_recall[k - 1]
    return info


def voc_ap(recall: np.ndarray, precision: np.ndarray) -> float:
    """All-point interpolated AP (the WIDER eval-tools integration)."""
    mrec = np.concatenate(([0.0], recall, [1.0]))
    mpre = np.concatenate(([0.0], precision, [0.0]))
    for i in range(len(mpre) - 2, -1, -1):
        mpre[i] = max(mpre[i], mpre[i + 1])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def evaluate_detections(
    detections: Sequence[np.ndarray],
    gts: Sequence[np.ndarray],
    keep_masks: Sequence[np.ndarray],
    iou_thresh: float = 0.5,
) -> float:
    """Compute one difficulty's AP from per-image arrays.

    detections[i]: (N_i, 5) xyxy+score; gts[i]: (M_i, 4) xyxy;
    keep_masks[i]: (M_i,) bool.
    """
    # global score normalization to [0,1] (official norm_score step)
    all_scores = np.concatenate([d[:, 4] for d in detections if len(d)]) if any(
        len(d) for d in detections
    ) else np.zeros(1)
    smin, smax = float(all_scores.min()), float(all_scores.max())
    srange = max(smax - smin, 1e-12)

    thresholds = 1.0 - (np.arange(NUM_THRESH, dtype=np.float64) + 1) / NUM_THRESH
    pr_curve = np.zeros((NUM_THRESH, 2), np.int64)
    count_face = 0
    for det, gt, keep in zip(detections, gts, keep_masks):
        count_face += int(np.sum(keep))
        det = np.asarray(det, np.float64).reshape(-1, 5)
        if len(det):
            order = np.argsort(-det[:, 4], kind="stable")
            det = det[order]
            det[:, 4] = (det[:, 4] - smin) / srange
        pred_recall, proposal = image_eval(det, gt, keep, iou_thresh)
        pr_curve += img_pr_info(thresholds, det[:, 4], proposal, pred_recall)

    with np.errstate(divide="ignore", invalid="ignore"):
        precision = np.where(
            pr_curve[:, 0] > 0, pr_curve[:, 1] / np.maximum(pr_curve[:, 0], 1), 0.0
        )
        recall = pr_curve[:, 1] / max(count_face, 1)
    return voc_ap(recall, precision)


# --------------------------------------------------------------------------- #
# Official .mat ground truth
# --------------------------------------------------------------------------- #


def load_wider_gt(gt_dir: str) -> Dict[str, dict]:
    """Load the official eval-tools ground truth .mat files.

    Returns {'easy'|'medium'|'hard': {'events', 'files', 'boxes', 'keep'}}
    with per-event per-image GT boxes (xywh -> converted to xyxy) and keep
    lists.
    """
    from scipy.io import loadmat

    base = loadmat(os.path.join(gt_dir, "wider_face_val.mat"))
    sets = {
        "easy": loadmat(os.path.join(gt_dir, "wider_easy_val.mat")),
        "medium": loadmat(os.path.join(gt_dir, "wider_medium_val.mat")),
        "hard": loadmat(os.path.join(gt_dir, "wider_hard_val.mat")),
    }
    events = [str(e[0][0]) for e in base["event_list"]]
    out: Dict[str, dict] = {}
    for name, m in sets.items():
        per = {"events": events, "files": [], "boxes": [], "keep": []}
        for ei in range(len(events)):
            files = [str(f[0][0]) for f in base["file_list"][ei][0]]
            gt_boxes = base["face_bbx_list"][ei][0]
            keep_lists = m["gt_list"][ei][0]
            per["files"].append(files)
            bx, kp = [], []
            for fi in range(len(files)):
                b = np.asarray(gt_boxes[fi][0], np.float64).reshape(-1, 4)
                b = np.concatenate([b[:, :2], b[:, :2] + b[:, 2:4]], axis=1)
                k = np.zeros(len(b), bool)
                kl = np.asarray(keep_lists[fi][0]).reshape(-1)
                if kl.size:
                    k[kl.astype(int) - 1] = True  # MATLAB 1-based
                bx.append(b)
                kp.append(k)
            per["boxes"].append(bx)
            per["keep"].append(kp)
        out[name] = per
    return out


def evaluate_wider(
    det_fn,
    gt_dir: str,
    images_root: str,
    subsets: Sequence[str] = ("easy", "medium", "hard"),
    max_images: Optional[int] = None,
    on_detection=None,
    batch_det_fn=None,
    batch_chunk: int = 64,
) -> Dict[str, float]:
    """Full WIDER val evaluation against the official .mat GT.

    Either `det_fn(img_bgr) -> (boxes, scores)` runs per image, or — the
    TPU-shaped path (VERDICT r1 #2) — `batch_det_fn(images) -> [(boxes,
    scores), ...]` runs over chunks of `batch_chunk` loaded images at once
    (e.g. eval.batch_runner.batched_detect_tta with flip + scales), so the
    3,226-image val set dispatches as bucketed batches instead of per-image
    calls.

    `on_detection(rel_path, boxes, scores)` is called per image if given
    (e.g. to dump WIDER-format detection txts)."""
    import cv2

    gt = load_wider_gt(gt_dir)
    any_set = gt[subsets[0]]
    dets_cache: Dict[str, np.ndarray] = {}

    # collect the evaluation image list (bounded by max_images)
    rels: List[str] = []
    for ei, event in enumerate(any_set["events"]):
        for fi, fname in enumerate(any_set["files"][ei]):
            if max_images is not None and len(rels) >= max_images:
                break
            rels.append(os.path.join(event, fname + ".jpg"))
        if max_images is not None and len(rels) >= max_images:
            break

    def record(rel, boxes, scores):
        if on_detection is not None:
            on_detection(rel, boxes, scores)
        dets_cache[rel] = np.concatenate(
            [boxes.reshape(-1, 4), scores.reshape(-1, 1)], axis=1
        )

    if batch_det_fn is not None:
        for c0 in range(0, len(rels), batch_chunk):
            chunk = rels[c0 : c0 + batch_chunk]
            imgs, oks = [], []
            for rel in chunk:
                img = cv2.imread(os.path.join(images_root, rel))
                if img is None:
                    dets_cache[rel] = np.zeros((0, 5), np.float64)
                else:
                    imgs.append(img)
                    oks.append(rel)
            if imgs:
                for rel, d in zip(oks, batch_det_fn(imgs)):
                    record(rel, d[0], d[1])
    else:
        for rel in rels:
            img = cv2.imread(os.path.join(images_root, rel))
            if img is None:
                dets_cache[rel] = np.zeros((0, 5), np.float64)
                continue
            boxes, scores = det_fn(img)[:2]
            record(rel, boxes, scores)

    results = {}
    for name in subsets:
        per = gt[name]
        d_list, g_list, k_list = [], [], []
        for ei, event in enumerate(per["events"]):
            for fi, fname in enumerate(per["files"][ei]):
                rel = os.path.join(event, fname + ".jpg")
                if rel not in dets_cache:
                    continue
                d_list.append(dets_cache[rel])
                g_list.append(per["boxes"][ei][fi])
                k_list.append(per["keep"][ei][fi])
        results[name] = evaluate_detections(d_list, g_list, k_list)
    return results
