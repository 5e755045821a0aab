"""Golden decode unit/property tests (SURVEY.md §2 C4, §4 item 2)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpucenterface.config import DecodeConfig
from tpucenterface.decode.reference import (
    boxes_to_original,
    decode_feats,
    pseudo_nms,
)


def _logit(p):
    return float(np.log(p / (1 - p)))


def _feats(hm, wh, off):
    return {
        "hm": jnp.asarray(hm)[None, ..., None],
        "wh": jnp.asarray(wh)[None],
        "off": jnp.asarray(off)[None],
    }


def test_pseudo_nms_suppresses_neighbors():
    s = np.zeros((1, 8, 8), np.float32)
    s[0, 3, 3] = 0.9
    s[0, 3, 4] = 0.8  # adjacent, lower -> suppressed
    s[0, 6, 6] = 0.7  # far -> kept
    out = np.asarray(pseudo_nms(jnp.asarray(s)))
    np.testing.assert_allclose(out[0, 3, 3], 0.9, atol=1e-6)
    assert out[0, 3, 4] == 0.0
    np.testing.assert_allclose(out[0, 6, 6], 0.7, atol=1e-6)


def test_decode_single_peak_box():
    h = w = 16
    hm = np.full((h, w), -10.0, np.float32)
    hm[5, 7] = _logit(0.9)
    wh = np.zeros((h, w, 2), np.float32)
    off = np.zeros((h, w, 2), np.float32)
    wh[5, 7] = (4.0, 6.0)       # box 4 wide, 6 tall in feature units
    off[5, 7] = (0.25, -0.25)   # subpixel center shift
    cfg = DecodeConfig(max_dets=10, stride=4)
    boxes, scores = decode_feats(_feats(hm, wh, off), cfg)
    np.testing.assert_allclose(float(scores[0, 0]), 0.9, atol=1e-5)
    cx, cy = (7 + 0.25) * 4, (5 - 0.25) * 4
    np.testing.assert_allclose(
        np.asarray(boxes[0, 0]),
        [cx - 8, cy - 12, cx + 8, cy + 12],
        atol=1e-4,
    )


def test_decode_topk_ordering_and_count():
    rng = np.random.RandomState(0)
    hm = rng.randn(32, 32).astype(np.float32) * 3
    wh = rng.rand(32, 32, 2).astype(np.float32) * 5
    off = rng.rand(32, 32, 2).astype(np.float32)
    cfg = DecodeConfig(max_dets=50)
    boxes, scores = decode_feats(_feats(hm, wh, off), cfg)
    assert boxes.shape == (1, 50, 4) and scores.shape == (1, 50)
    s = np.asarray(scores[0])
    assert np.all(np.diff(s) <= 1e-7)  # descending


def test_decode_wh_log_mode():
    hm = np.full((8, 8), -10.0, np.float32)
    hm[4, 4] = _logit(0.8)
    wh = np.zeros((8, 8, 2), np.float32)
    wh[4, 4] = (np.log(3.0), np.log(5.0))
    off = np.zeros((8, 8, 2), np.float32)
    cfg = DecodeConfig(max_dets=5, wh_log=True)
    boxes, _ = decode_feats(_feats(hm, wh, off), cfg)
    b = np.asarray(boxes[0, 0])
    np.testing.assert_allclose(b[2] - b[0], 3.0 * 4, rtol=1e-5)
    np.testing.assert_allclose(b[3] - b[1], 5.0 * 4, rtol=1e-5)


def test_boxes_to_original_inverts_letterbox():
    # image 100x200 letterboxed into 320 with center padding
    h, w, size = 100, 200, 320
    s = min(size / h, size / w)  # 1.6
    pad_x, pad_y = (size - w * s) / 2, (size - h * s) / 2
    orig_box = np.array([10.0, 20.0, 150.0, 80.0])
    model_box = orig_box * s + np.array([pad_x, pad_y, pad_x, pad_y])
    back = boxes_to_original(
        jnp.asarray(model_box),
        jnp.float32(s),
        jnp.asarray([pad_x, pad_y], jnp.float32),
        jnp.asarray([h, w], jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(back), orig_box, atol=1e-4)


def test_boxes_to_original_clips():
    back = boxes_to_original(
        jnp.asarray([-50.0, -50.0, 1e4, 1e4]),
        jnp.float32(1.0),
        jnp.zeros(2, jnp.float32),
        jnp.asarray([100, 200], jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(back), [0, 0, 200, 100])


def test_topk_2stage_matches_lax_topk():
    """Exact values + indices vs lax.top_k on tie-free data, several shapes."""
    import jax
    import jax.numpy as jnp

    from tpucenterface.decode.reference import topk_2stage

    rng = np.random.RandomState(7)
    for b, n, k in [(3, 25600, 200), (2, 6400, 100), (1, 1024, 64), (2, 100, 20)]:
        x = jnp.asarray(rng.rand(b, n).astype(np.float32))
        v1, i1 = jax.jit(lambda x: jax.lax.top_k(x, k))(x)
        v2, i2 = jax.jit(lambda x: topk_2stage(x, k))(x)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_topk_2stage_sparse_peaks():
    """Post-NMS-like sparse maps (mostly zeros) keep exact behavior."""
    import jax
    import jax.numpy as jnp

    from tpucenterface.decode.reference import topk_2stage

    rng = np.random.RandomState(8)
    x = np.zeros((2, 25600), np.float32)
    for bi in range(2):
        pos = rng.choice(25600, 300, replace=False)
        x[bi, pos] = rng.rand(300)
    xj = jnp.asarray(x)
    v1, i1 = jax.jit(lambda x: jax.lax.top_k(x, 200))(xj)
    v2, i2 = jax.jit(lambda x: topk_2stage(x, 200))(xj)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    # zero-valued tail may tie-order differently; compare nonzero prefix idx
    nz = np.asarray(v1) > 0
    np.testing.assert_array_equal(np.asarray(i1)[nz], np.asarray(i2)[nz])
