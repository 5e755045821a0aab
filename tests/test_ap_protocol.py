"""Adversarial golden fixtures for the WIDER AP protocol (VERDICT r1 #3).

Real WIDER data cannot exist in this container, so the official eval_tools
edge semantics are encoded as hand-computed cases against
eval.wider_eval.{image_eval, img_pr_info, evaluate_detections}. Every
expected AP below is derived by hand in the comment above the assert.

Conventions under test (the official MATLAB/Python eval_tools behavior):
- greedy score-descending matching, argmax-IoU ONLY (a detection is judged
  against its single best-overlapping GT);
- matching an ignored GT (keep_mask False) VOIDS the detection (it is not a
  proposal, not an FP, and gives no recall);
- a second detection on an already-matched GT stays a proposal (an FP);
- norm_score: global min-max normalization of all scores to [0,1];
- 1000-threshold PR sweep, all-point interpolated AP;
- IoU uses the +1 pixel-index convention.
"""

import numpy as np
import pytest

from tpucenterface.eval.wider_eval import (
    bbox_overlaps,
    evaluate_detections,
    image_eval,
    img_pr_info,
    voc_ap,
)


def det(*rows):
    return np.asarray(rows, np.float64).reshape(-1, 5)


def gt(*rows):
    return np.asarray(rows, np.float64).reshape(-1, 4)


def keep(*vals):
    return np.asarray(vals, bool)


G = [0.0, 0.0, 9.0, 9.0]          # a 10x10 GT box at origin (+1 convention)
G2 = [100.0, 100.0, 109.0, 109.0]  # disjoint 10x10 GT


def test_det_on_ignored_gt_is_voided_not_fp():
    """Image A: perfect detection of a kept GT. Image B: a detection covering
    ONLY an ignored GT. The voided detection must not cost precision:
    PR = (1 proposal, 1 recall) at every threshold that includes A's det ->
    AP = 1.0 exactly."""
    ap = evaluate_detections(
        [det(G + [0.9]), det(G + [0.8])],
        [gt(G), gt(G)],
        [keep(True), keep(False)],
    )
    assert ap == pytest.approx(1.0, abs=1e-9)


def test_second_det_on_same_gt_is_fp_not_recall():
    """One GT, two detections on it (0.9 then 0.8). The duplicate is a
    proposal with no recall gain: precision falls to 1/2 at the lower
    threshold but recall is already 1 at precision 1, so all-point AP = 1.0;
    a double-counting bug would yield recall 2 and a nonsense AP."""
    ap = evaluate_detections([det(G + [0.9], G + [0.8])], [gt(G)], [keep(True)])
    assert ap == pytest.approx(1.0, abs=1e-9)
    # and the internals: second det keeps proposal=1 but recall stays 1
    pr, prop = image_eval(det(G + [0.9], G + [0.8]), gt(G), keep(True))
    assert list(pr) == [1, 1] and list(prop) == [1, 1]


def test_det_overlapping_ignored_more_than_kept_is_voided():
    """Official semantics judge a detection ONLY against its argmax-IoU GT:
    if that one is ignored, the detection is voided even though it also
    overlaps a kept GT above threshold. Kept GT stays unmatched -> AP 0."""
    ignored = [0.0, 0.0, 9.0, 9.0]
    kept_gt = [2.0, 0.0, 11.0, 9.0]  # IoU(det, kept) ~ 0.667 < IoU(det, ignored)=1
    d = det(ignored + [0.9])
    pr, prop = image_eval(d, gt(ignored, kept_gt), keep(False, True))
    assert list(prop) == [0] and list(pr) == [0]
    ap = evaluate_detections([d], [gt(ignored, kept_gt)], [keep(False, True)])
    assert ap == pytest.approx(0.0, abs=1e-9)


def test_all_ignored_image_contributes_nothing():
    """An image whose every GT is ignored adds no recall denominator and its
    (voided) detections no proposals; a perfect second image gives AP 1."""
    ap = evaluate_detections(
        [det(G + [0.7], G2 + [0.6]), det(G + [0.9])],
        [gt(G, G2), gt(G)],
        [keep(False, False), keep(True)],
    )
    assert ap == pytest.approx(1.0, abs=1e-9)


def test_norm_score_shift_and_negative_invariance():
    """AP must be invariant to affine score shifts (incl. negative scores) —
    the official norm_score step min-max normalizes globally."""
    dets = [det(G + [0.9], G2 + [0.2]), det(G + [0.5])]
    gts = [gt(G, G2), gt(G)]
    keeps = [keep(True, True), keep(True)]
    ap1 = evaluate_detections(dets, gts, keeps)
    shifted = [d.copy() for d in dets]
    for d in shifted:
        d[:, 4] = d[:, 4] * 3.0 - 7.0   # scores in [-6.4, -4.3]
    ap2 = evaluate_detections(shifted, gts, keeps)
    assert ap1 == pytest.approx(ap2, abs=1e-9)


def test_constant_scores_degenerate_norm():
    """All-equal scores normalize to 0; only the final threshold (0.0)
    captures them: one PR point with precision 1, recall 1 -> AP 1."""
    ap = evaluate_detections(
        [det(G + [0.5]), det(G + [0.5])],
        [gt(G), gt(G)],
        [keep(True), keep(True)],
    )
    assert ap == pytest.approx(1.0, abs=1e-9)


def test_fp_above_tp_halves_ap():
    """Image A: TP at norm-high score. Image B (no GT): FP at mid score.
    Image A2: TP at norm-low score. Sweep: {TP}: P=1 R=1/2; {TP,FP}: P=1/2
    R=1/2; {TP,FP,TP}: P=2/3 R=1. All-point AP = 0.5*1 + 0.5*(2/3) = 5/6."""
    ap = evaluate_detections(
        [det(G + [10.0]), det(G + [5.0]), det(G + [0.1])],
        [gt(G), np.zeros((0, 4)), gt(G)],
        [keep(True), keep(), keep(True)],
    )
    assert ap == pytest.approx(5.0 / 6.0, abs=1e-3)


def test_iou_boundary_at_exactly_half():
    """+1 convention: det [0,0,9,4] vs GT [0,0,9,9]: inter 10*5=50, union
    100+50-50=100 -> IoU exactly 0.5 -> MATCH; det [0,0,9,3] -> 0.4 -> miss."""
    at_half = det([0.0, 0.0, 9.0, 4.0, 0.9])
    below = det([0.0, 0.0, 9.0, 3.0, 0.9])
    iou = bbox_overlaps(at_half[:, :4], gt(G))
    assert iou[0, 0] == pytest.approx(0.5, abs=1e-12)
    pr, _ = image_eval(at_half, gt(G), keep(True))
    assert pr[-1] == 1
    pr, _ = image_eval(below, gt(G), keep(True))
    assert pr[-1] == 0


def test_ignored_gt_not_in_recall_denominator():
    """1 kept + 1 ignored GT, a single TP on the kept one: recall denominator
    must be 1 (not 2) -> AP 1."""
    ap = evaluate_detections(
        [det(G + [0.9])], [gt(G, G2)], [keep(True, False)]
    )
    assert ap == pytest.approx(1.0, abs=1e-9)


def test_cross_image_norm_score_interleaving():
    """norm_score is GLOBAL: an FP whose raw score sits between two images'
    TP scores must interleave after normalization (same 5/6 geometry as
    test_fp_above_tp_halves_ap but across images with wild raw scales)."""
    ap = evaluate_detections(
        [det(G + [1000.0]), det(G + [50.0]), det(G + [0.001])],
        [gt(G), np.zeros((0, 4)), gt(G)],
        [keep(True), keep(), keep(True)],
    )
    assert ap == pytest.approx(5.0 / 6.0, abs=1e-3)


def test_pr_sweep_monotone_counts():
    """img_pr_info: as the threshold loosens, both the proposal count and
    recall column must be non-decreasing (PR curve integrity)."""
    rng = np.random.RandomState(0)
    scores = np.sort(rng.rand(50))[::-1]
    proposal = (rng.rand(50) > 0.3).astype(np.int32)
    pred_recall = np.cumsum(rng.rand(50) > 0.5).astype(np.int32)
    thresholds = 1.0 - (np.arange(1000) + 1) / 1000.0
    info = img_pr_info(thresholds, scores, proposal, pred_recall)
    assert (np.diff(info[:, 0]) >= 0).all()
    assert (np.diff(info[:, 1]) >= 0).all()


def test_voc_ap_handcomputed_staircase():
    """voc_ap on an explicit staircase: recall [.2,.2,.5,1], precision
    [1,.8,.6,.5] -> envelope [1,.8,.6,.5]; AP = .2*1 + .3*.6 + .5*.5 = 0.63."""
    ap = voc_ap(np.array([0.2, 0.2, 0.5, 1.0]), np.array([1.0, 0.8, 0.6, 0.5]))
    assert ap == pytest.approx(0.63, abs=1e-12)


def test_empty_detections_and_empty_gt():
    """No detections anywhere -> AP 0; empty-GT images don't crash."""
    ap = evaluate_detections(
        [np.zeros((0, 5)), np.zeros((0, 5))],
        [gt(G), np.zeros((0, 4))],
        [keep(True), keep()],
    )
    assert ap == 0.0
