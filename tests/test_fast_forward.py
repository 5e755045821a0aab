"""FastEngine parity vs the flax folded model (CPU; kernel in interpret mode)."""

from dataclasses import replace

import jax
import numpy as np
import pytest

from tpucenterface.config import ModelConfig
from tpucenterface.model.centernet import CenterFaceNet, init_model
from tpucenterface.model.fast_forward import FastEngine
from tpucenterface.weights.fold import fold_variables

CFG = ModelConfig(compute_dtype="bfloat16")


@pytest.fixture(scope="module")
def folded():
    _, variables = init_model(CFG, rng=jax.random.PRNGKey(2), input_size=64)
    return fold_variables(variables)


@pytest.fixture(scope="module")
def flax_out(folded):
    fmodel = CenterFaceNet(replace(CFG, folded=True))
    x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    out = jax.jit(lambda v, xx: fmodel.apply(v, xx, train=False))(folded, x)
    return x, out


def _check(out, ref):
    for k in ("hm", "wh", "off"):
        a = np.asarray(out[k], np.float32)
        b = np.asarray(ref[k], np.float32)
        np.testing.assert_allclose(a, b, atol=0.08, rtol=0.05, err_msg=k)


def test_fast_engine_xla_path_matches_flax(folded, flax_out):
    x, ref = flax_out
    eng = FastEngine(folded, CFG, use_mbconv_kernel=False)
    out = jax.jit(eng)(x)
    _check(out, ref)


def test_fast_engine_kernel_path_matches_flax(folded, flax_out):
    x, ref = flax_out
    eng = FastEngine(
        folded, CFG, use_mbconv_kernel=True, kernel_interpret=True, min_kernel_hw=4
    )
    out = eng(x)  # interpret-mode pallas can't be jitted on CPU paths uniformly
    _check(out, ref)
