"""Property test: fused sigmoid+pseudo-NMS Pallas kernel == golden (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpucenterface.decode.pallas_nms import sigmoid_pseudo_nms_pallas
from tpucenterface.decode.reference import pseudo_nms


def test_pallas_nms_matches_golden_interpret():
    rng = np.random.RandomState(0)
    hm = jnp.asarray(rng.randn(3, 32, 64).astype(np.float32)) * 3
    got = sigmoid_pseudo_nms_pallas(hm, interpret=True)
    want = pseudo_nms(jax.nn.sigmoid(hm))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_nms_plateau_ties_keep_all():
    hm = jnp.zeros((1, 16, 16), jnp.float32)  # constant map: all cells tie
    got = np.asarray(sigmoid_pseudo_nms_pallas(hm, interpret=True))
    assert (got == 0.5).all()  # sigmoid(0)=0.5 everywhere, all kept
