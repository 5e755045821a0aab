"""WIDER AP protocol + TTA merge tests (SURVEY.md §2 C11, §4 item 3)."""

import numpy as np

from tpucenterface.data.wider import parse_bbx_gt, write_wider_detections
from tpucenterface.eval.tta import nms, pick_bucket
from tpucenterface.eval.wider_eval import (
    bbox_overlaps,
    evaluate_detections,
    image_eval,
    voc_ap,
)


def _det(boxes, scores):
    return np.concatenate(
        [np.asarray(boxes, np.float64), np.asarray(scores, np.float64)[:, None]], 1
    )


def test_bbox_overlaps_identity():
    b = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float64)
    iou = bbox_overlaps(b, b)
    np.testing.assert_allclose(np.diag(iou), 1.0)
    assert iou[0, 1] == 0.0


def test_image_eval_greedy_match():
    gt = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float64)
    keep = np.array([True, True])
    pred = _det([[0, 0, 10, 10], [20, 20, 30, 30], [50, 50, 60, 60]], [0.9, 0.8, 0.7])
    pr, prop = image_eval(pred, gt, keep)
    np.testing.assert_array_equal(pr, [1, 2, 2])
    np.testing.assert_array_equal(prop, [1, 1, 1])


def test_image_eval_ignored_gt_voids_proposal():
    gt = np.array([[0, 0, 10, 10]], np.float64)
    keep = np.array([False])  # not in this difficulty subset
    pred = _det([[0, 0, 10, 10]], [0.9])
    pr, prop = image_eval(pred, gt, keep)
    assert pr[0] == 0 and prop[0] == 0


def test_perfect_detections_ap_one():
    gts = [np.array([[0, 0, 10, 10], [30, 30, 50, 55]], np.float64) for _ in range(5)]
    keeps = [np.ones(2, bool) for _ in range(5)]
    dets = [_det(g, [0.9, 0.8]) for g in gts]
    ap = evaluate_detections(dets, gts, keeps)
    assert ap > 0.95, ap


def test_half_recall_ap():
    gts = [np.array([[0, 0, 10, 10], [30, 30, 50, 55]], np.float64) for _ in range(8)]
    keeps = [np.ones(2, bool) for _ in range(8)]
    dets = [_det(g[:1], [0.9]) for g in gts]  # only first GT found
    ap = evaluate_detections(dets, gts, keeps)
    assert 0.3 < ap < 0.6, ap


def test_false_positives_lower_ap():
    gts = [np.array([[0, 0, 10, 10]], np.float64) for _ in range(4)]
    keeps = [np.ones(1, bool) for _ in range(4)]
    clean = [_det(g, [0.9]) for g in gts]
    noisy = [
        np.concatenate([d, _det([[100, 100, 120, 120]], [0.95])]) for d in clean
    ]
    assert evaluate_detections(noisy, gts, keeps) < evaluate_detections(
        clean, gts, keeps
    )


def test_voc_ap_simple():
    r = np.array([0.5, 1.0])
    p = np.array([1.0, 0.5])
    assert abs(voc_ap(r, p) - 0.75) < 1e-9


def test_nms_merges_duplicates():
    dets = np.array(
        [[0, 0, 10, 10, 0.9], [1, 1, 11, 11, 0.8], [50, 50, 60, 60, 0.7]], np.float64
    )
    keep = nms(dets, 0.4)
    assert list(keep) == [0, 2]


def test_pick_bucket():
    assert pick_bucket((320, 640, 1024), 500) == 640
    assert pick_bucket((320, 640, 1024), 2000) == 1024


def test_parse_and_write_roundtrip(tmp_path):
    gt_txt = tmp_path / "gt.txt"
    gt_txt.write_text(
        "ev/a.jpg\n2\n10 20 30 40 0 0 0 0 0 0\n50 60 20 20 0 0 0 1 0 0\n"
        "ev/b.jpg\n0\n0 0 0 0 0 0 0 0 0 0\n"
    )
    recs = parse_bbx_gt(str(gt_txt), str(tmp_path))
    assert len(recs) == 2
    assert recs[0].boxes.shape == (2, 4)
    assert recs[0].invalid.tolist() == [False, True]
    np.testing.assert_allclose(recs[0].xyxy[0], [10, 20, 40, 60])
    assert recs[1].boxes.shape == (0, 4)

    write_wider_detections(
        str(tmp_path / "out"),
        "ev/a.jpg",
        np.array([[10.0, 20.0, 40.0, 60.0]]),
        np.array([0.9]),
    )
    lines = (tmp_path / "out/ev/a.txt").read_text().splitlines()
    assert lines[0] == "a" and lines[1] == "1"
    assert lines[2].startswith("10.0 20.0 30.0 40.0")
