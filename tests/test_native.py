"""C++ eval kernels vs numpy reference (SURVEY.md §2 native-component
obligation: the Cython bbox_overlaps equivalent)."""

import numpy as np
import pytest

from tpucenterface import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain to build the extension"
)


def _np_overlaps(b, q):
    bb = b[:, None, :]
    qq = q[None, :, :]
    ix = np.maximum(
        0.0, np.minimum(bb[..., 2], qq[..., 2]) - np.maximum(bb[..., 0], qq[..., 0]) + 1
    )
    iy = np.maximum(
        0.0, np.minimum(bb[..., 3], qq[..., 3]) - np.maximum(bb[..., 1], qq[..., 1]) + 1
    )
    inter = ix * iy
    ab = (bb[..., 2] - bb[..., 0] + 1) * (bb[..., 3] - bb[..., 1] + 1)
    aq = (qq[..., 2] - qq[..., 0] + 1) * (qq[..., 3] - qq[..., 1] + 1)
    return inter / np.maximum(ab + aq - inter, 1e-10)


def _rand_boxes(rng, n):
    xy = rng.rand(n, 2) * 200
    wh = rng.rand(n, 2) * 80 + 1
    return np.concatenate([xy, xy + wh], axis=1)


def test_bbox_overlaps_matches_numpy():
    rng = np.random.RandomState(0)
    b = _rand_boxes(rng, 40)
    q = _rand_boxes(rng, 25)
    got = native.bbox_overlaps(b, q)
    np.testing.assert_allclose(got, _np_overlaps(b, q), atol=1e-12)


def test_native_nms_matches_numpy_reference():
    from tpucenterface.eval import tta

    rng = np.random.RandomState(1)
    for trial in range(5):
        b = _rand_boxes(rng, 60)
        s = rng.rand(60)
        dets = np.concatenate([b, s[:, None]], axis=1)
        got = tta.nms(dets, 0.4)  # native path
        # numpy reference: force fallback by calling the python loop directly
        import tpucenterface.native as nat

        real_nms = nat.nms
        try:
            nat.nms = lambda *a, **k: None
            ref = tta.nms(dets, 0.4)
        finally:
            nat.nms = real_nms
        np.testing.assert_array_equal(np.sort(got), np.sort(ref))


def test_eval_protocol_uses_native_consistently():
    from tpucenterface.eval.wider_eval import bbox_overlaps

    rng = np.random.RandomState(2)
    b = _rand_boxes(rng, 10)
    np.testing.assert_allclose(bbox_overlaps(b, b).diagonal(), 1.0)


# --------------------------------------------------------------------- #
# host staging kernel (stage_ext.cpp): stem LUT apply
# --------------------------------------------------------------------- #


def _np_lut(imgs, lut):
    out = np.empty(imgs.shape, np.int8)
    for c in range(3):
        out[..., c] = lut[:, c][imgs[..., c]]
    return out


def test_stem_lut_apply_matches_numpy():
    if not native.stage_available():
        pytest.skip("no C++ toolchain for the staging kernel")
    rng = np.random.RandomState(3)
    lut = rng.randint(-127, 128, (256, 3)).astype(np.int8)
    # cover the threaded path (npix >= 1<<16) and the inline small path
    for shape in ((4, 96, 96, 3), (2, 5, 7, 3), (0, 8, 8, 3)):
        imgs = rng.randint(0, 256, shape, np.uint8)
        got = native.stem_lut_apply(imgs, lut, nthreads=4)
        np.testing.assert_array_equal(got, _np_lut(imgs, lut))


def test_stem_lut_apply_out_buffer_slice():
    """`out=` writes straight into a leading-axis slice of a batch buffer
    (the ServingEngine assembly pattern) with no second copy."""
    if not native.stage_available():
        pytest.skip("no C++ toolchain for the staging kernel")
    rng = np.random.RandomState(4)
    lut = rng.randint(-127, 128, (256, 3)).astype(np.int8)
    imgs = rng.randint(0, 256, (3, 16, 16, 3), np.uint8)
    buf = np.full((8, 16, 16, 3), 55, np.int8)
    ret = native.stem_lut_apply(imgs, lut, out=buf[2:5])
    assert np.shares_memory(ret, buf)  # wrote in place, no copy
    np.testing.assert_array_equal(buf[2:5], _np_lut(imgs, lut))
    assert (buf[:2] == 55).all() and (buf[5:] == 55).all()


def test_stem_lut_apply_validates():
    if not native.stage_available():
        pytest.skip("no C++ toolchain for the staging kernel")
    rng = np.random.RandomState(5)
    lut = rng.randint(-127, 128, (256, 3)).astype(np.int8)
    imgs = rng.randint(0, 256, (2, 8, 8, 3), np.uint8)
    with pytest.raises(ValueError):
        native.stem_lut_apply(imgs[..., :2], lut)
    with pytest.raises(ValueError):
        native.stem_lut_apply(imgs, lut[:128])
    with pytest.raises(ValueError):
        native.stem_lut_apply(imgs, lut, out=np.empty((2, 8, 8, 3), np.uint8))
    with pytest.raises(ValueError):
        native.stem_lut_apply(imgs, lut, out=np.empty((3, 8, 8, 3), np.int8))
