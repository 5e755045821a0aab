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


# --------------------------------------------------------------------------- #
# Official .mat ground-truth loader (VERDICT r2 #2): synthetic fixture built
# with scipy.io.savemat replicating the eval-tools structure — event_list /
# file_list / face_bbx_list nested object cells, per-difficulty gt_list with
# MATLAB 1-based keep indices, xywh boxes.
# --------------------------------------------------------------------------- #


def _write_synthetic_mat_gt(gt_dir, keep_by_set=None):
    """2 events, 3 images. GT (xywh):
    ev_a/img1: [10,20,30,40], [50,60,10,10]; ev_a/img2: none;
    ev_b/img3: [5,5,20,20]. Default keep: all (easy/hard), medium keeps
    only img1's FIRST face (+ img3's), exercising ignore-void semantics."""
    import os

    from scipy.io import savemat

    ev = np.empty((2, 1), object)
    ev[0, 0], ev[1, 0] = "ev_a", "ev_b"
    fl = np.empty((2, 1), object)
    f0 = np.empty((2, 1), object)
    f0[0, 0], f0[1, 0] = "img1", "img2"
    f1 = np.empty((1, 1), object)
    f1[0, 0] = "img3"
    fl[0, 0], fl[1, 0] = f0, f1
    bb = np.empty((2, 1), object)
    b0 = np.empty((2, 1), object)
    b0[0, 0] = np.array([[10.0, 20.0, 30.0, 40.0], [50.0, 60.0, 10.0, 10.0]])
    b0[1, 0] = np.zeros((0, 4))
    b1 = np.empty((1, 1), object)
    b1[0, 0] = np.array([[5.0, 5.0, 20.0, 20.0]])
    bb[0, 0], bb[1, 0] = b0, b1
    savemat(
        os.path.join(gt_dir, "wider_face_val.mat"),
        {"event_list": ev, "file_list": fl, "face_bbx_list": bb},
    )

    def gt_list(img1_keep):
        gl = np.empty((2, 1), object)
        g0 = np.empty((2, 1), object)
        g0[0, 0] = np.asarray(img1_keep, np.float64).reshape(-1, 1)
        g0[1, 0] = np.zeros((0, 0))
        g1 = np.empty((1, 1), object)
        g1[0, 0] = np.array([[1.0]])
        gl[0, 0], gl[1, 0] = g0, g1
        return gl

    keep_by_set = keep_by_set or {
        "easy": [1, 2],
        "medium": [1],
        "hard": [1, 2],
    }
    for name, img1_keep in keep_by_set.items():
        savemat(
            os.path.join(gt_dir, f"wider_{name}_val.mat"),
            {"gt_list": gt_list(img1_keep)},
        )


def test_load_wider_gt_structure_and_indexing(tmp_path):
    """Loader parses the nested object cells, converts xywh -> xyxy, and
    converts MATLAB 1-based keep indices (the one untested link to a real
    AP number — VERDICT r2 #2)."""
    from tpucenterface.eval.wider_eval import load_wider_gt

    _write_synthetic_mat_gt(str(tmp_path))
    gt = load_wider_gt(str(tmp_path))
    assert set(gt) == {"easy", "medium", "hard"}
    easy = gt["easy"]
    assert easy["events"] == ["ev_a", "ev_b"]
    assert easy["files"] == [["img1", "img2"], ["img3"]]
    np.testing.assert_allclose(
        easy["boxes"][0][0],
        [[10, 20, 40, 60], [50, 60, 60, 70]],  # x2=x+w, y2=y+h
    )
    assert easy["boxes"][0][1].shape == (0, 4)
    np.testing.assert_allclose(easy["boxes"][1][0], [[5, 5, 25, 25]])
    # keep masks: easy keeps both img1 faces; medium only the FIRST
    # (1-based index 1 -> 0-based 0)
    np.testing.assert_array_equal(easy["keep"][0][0], [True, True])
    np.testing.assert_array_equal(gt["medium"]["keep"][0][0], [True, False])
    assert easy["keep"][0][1].shape == (0,)
    np.testing.assert_array_equal(easy["keep"][1][0], [True])


def _fake_image_dataset(root):
    """Write the 3 synthetic jpgs; pixel (0,0) encodes the image id so the
    fake detector knows which boxes to return after cv2 round-trips."""
    import os

    import cv2

    for event, fname, iid in (
        ("ev_a", "img1", 10),
        ("ev_a", "img2", 20),
        ("ev_b", "img3", 30),
    ):
        os.makedirs(os.path.join(root, event), exist_ok=True)
        img = np.full((100, 100, 3), iid, np.uint8)
        assert cv2.imwrite(os.path.join(root, event, fname + ".jpg"), img)


def _img_id(img):
    v = int(img[0, 0, 0])
    return min((10, 20, 30), key=lambda t: abs(t - v))  # jpeg-tolerant


def test_evaluate_wider_mat_path_perfect_detector(tmp_path):
    """End-to-end AP through load_wider_gt + evaluate_wider: a detector
    returning exactly the GT boxes scores AP 1.0 on every subset — medium's
    extra img1 detection hits an IGNORED (non-kept) GT and must be voided,
    not counted as a false positive."""
    import os

    from tpucenterface.eval.wider_eval import evaluate_wider

    gt_dir, img_root = str(tmp_path / "gt"), str(tmp_path / "imgs")
    os.makedirs(gt_dir)
    _write_synthetic_mat_gt(gt_dir)
    _fake_image_dataset(img_root)

    dets = {
        10: (np.array([[10.0, 20, 40, 60], [50, 60, 60, 70]]), np.array([0.9, 0.8])),
        20: (np.zeros((0, 4)), np.zeros((0,))),
        30: (np.array([[5.0, 5, 25, 25]]), np.array([0.7])),
    }

    def det_fn(img):
        return dets[_img_id(img)]

    res = evaluate_wider(det_fn, gt_dir, img_root)
    assert res["easy"] == 1.0 and res["hard"] == 1.0
    # ignore-void semantics through the .mat keep lists:
    assert res["medium"] == 1.0


def test_evaluate_wider_mat_path_hand_computed_ap(tmp_path):
    """Hand-computed partial AP through the .mat path: 3 TPs plus one
    HIGHER-scoring FP on the empty image. Normalized scores put the FP
    first, so precision at the recall steps 1/3, 2/3, 1 is 1/2, 2/3, 3/4;
    all-point interpolation lifts every step to 3/4 -> AP = 0.75."""
    import os

    from tpucenterface.eval.wider_eval import evaluate_wider

    gt_dir, img_root = str(tmp_path / "gt"), str(tmp_path / "imgs")
    os.makedirs(gt_dir)
    _write_synthetic_mat_gt(gt_dir)
    _fake_image_dataset(img_root)

    dets = {
        10: (np.array([[10.0, 20, 40, 60], [50, 60, 60, 70]]), np.array([0.9, 0.8])),
        20: (np.array([[1.0, 1, 90, 90]]), np.array([0.95])),  # FP, top score
        30: (np.array([[5.0, 5, 25, 25]]), np.array([0.7])),
    }

    def det_fn(img):
        return dets[_img_id(img)]

    res = evaluate_wider(det_fn, gt_dir, img_root, subsets=("easy",))
    np.testing.assert_allclose(res["easy"], 0.75, atol=1e-9)


def test_evaluate_wider_mat_path_batched(tmp_path):
    """The batched (batch_det_fn) route through the .mat path matches the
    per-image route."""
    import os

    from tpucenterface.eval.wider_eval import evaluate_wider

    gt_dir, img_root = str(tmp_path / "gt"), str(tmp_path / "imgs")
    os.makedirs(gt_dir)
    _write_synthetic_mat_gt(gt_dir)
    _fake_image_dataset(img_root)

    dets = {
        10: (np.array([[10.0, 20, 40, 60]]), np.array([0.9])),  # misses face 2
        20: (np.zeros((0, 4)), np.zeros((0,))),
        30: (np.array([[5.0, 5, 25, 25]]), np.array([0.7])),
    }

    def det_fn(img):
        return dets[_img_id(img)]

    def batch_det_fn(imgs):
        return [det_fn(im) for im in imgs]

    a = evaluate_wider(det_fn, gt_dir, img_root)
    b = evaluate_wider(None, gt_dir, img_root, batch_det_fn=batch_det_fn,
                       batch_chunk=2)
    assert a == b
    # easy: 2/3 recall at full precision -> AP = 2/3
    np.testing.assert_allclose(a["easy"], 2.0 / 3.0, atol=1e-9)
    # medium keeps only the detected img1 face -> perfect
    np.testing.assert_allclose(a["medium"], 1.0, atol=1e-9)
