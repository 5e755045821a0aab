"""Target rendering tests (SURVEY.md §2 C7)."""

import numpy as np

from tpucenterface.data.targets import draw_gaussian, gaussian_radius, make_targets


def test_gaussian_radius_monotone():
    assert gaussian_radius(10, 10) < gaussian_radius(40, 40)
    assert gaussian_radius(4, 4) >= 0.0


def test_draw_gaussian_peak_and_clip():
    hm = np.zeros((16, 16), np.float32)
    draw_gaussian(hm, (8, 8), 3)
    assert hm[8, 8] == 1.0
    assert hm[8, 9] < 1.0
    # near-border splat must not crash and keeps peak
    draw_gaussian(hm, (0, 0), 3)
    assert hm[0, 0] == 1.0


def test_make_targets_layout():
    boxes = np.array([[8, 16, 40, 56], [100, 100, 140, 130]], np.float32)
    t = make_targets(boxes, input_size=160, stride=4, max_objs=8)
    assert t["hm"].shape == (40, 40, 1)
    assert t["mask"].sum() == 2.0
    # first box: center (24, 36) px -> (6.0, 9.0) feature -> cell (6, 9)
    assert t["ind"][0] == 9 * 40 + 6
    np.testing.assert_allclose(t["wh"][0], [8.0, 10.0])  # (40-8)/4, (56-16)/4
    np.testing.assert_allclose(t["off"][0], [0.0, 0.0])
    assert t["hm"][9, 6, 0] == 1.0


def test_make_targets_subpixel_offset():
    boxes = np.array([[10, 10, 21, 23]], np.float32)  # center (15.5, 16.5)px
    t = make_targets(boxes, input_size=64, stride=4, max_objs=4)
    cx, cy = 15.5 / 4, 16.5 / 4  # 3.875, 4.125 -> cell (3, 4)
    assert t["ind"][0] == 4 * 16 + 3
    np.testing.assert_allclose(t["off"][0], [cx - 3, cy - 4], atol=1e-6)


def test_make_targets_wh_log():
    boxes = np.array([[0, 0, 40, 80]], np.float32)
    t = make_targets(boxes, input_size=160, stride=4, wh_log=True)
    np.testing.assert_allclose(t["wh"][0], [np.log(10.0), np.log(20.0)], atol=1e-5)


def test_make_targets_degenerate_boxes_skipped():
    # zero-area and fully out-of-bounds boxes render nothing
    boxes = np.array([[5, 5, 5, 5], [200, 200, 300, 300]], np.float32)
    t = make_targets(boxes, input_size=160, stride=4)
    assert t["mask"].sum() == 0.0
    # a partially out-of-bounds box survives via clipping
    t2 = make_targets(np.array([[120, 120, 220, 220]], np.float32), 160, stride=4)
    assert t2["mask"].sum() == 1.0
