"""Interpret-mode correctness of the fused MBConv block Pallas kernel.

Three-way bit-exact agreement at a small shape: the Pallas kernel (banded,
halo-padded), the planar jnp reference (parity-plane shifts), and the
engine-style NHWC int8 conv chain (what the serving program runs today).
If these agree, the parity-plane decomposition of the stride-2 depthwise
conv and the banded halo bookkeeping are both right.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tpucenterface.bench.probe_fused_block import (  # noqa: E402
    fused_block_ref,
    make_fused_block_kernel,
    make_params,
    nhwc_to_parity_planar,
    pad_bands,
    xla_nhwc_chain,
)

B, HWIN, CIN, CMID, COUT_PAD = 2, 32, 8, 24, 32
HW_OUT, ROW_BAND = HWIN // 2, 4


@pytest.fixture(scope="module")
def setup():
    prm = make_params(CIN, CMID, COUT_PAD, seed=3)
    rng = np.random.RandomState(1)
    x_nhwc = jnp.asarray(
        rng.randint(-127, 128, (B, HWIN, HWIN, CIN), np.int8)
    )
    xp = nhwc_to_parity_planar(x_nhwc)
    args = [jnp.asarray(prm[k]) for k in (
        "we", "e_scale", "e_bias", "e_inv_sdw",
        "wd", "d_scale", "d_bias", "d_inv_sproj",
        "wp", "p_scale", "p_bias",
    )]
    return prm, x_nhwc, xp, args


def test_kernel_matches_planar_ref(setup):
    prm, x_nhwc, xp, args = setup
    ker = make_fused_block_kernel(
        B, CIN, CMID, COUT_PAD, HW_OUT, ROW_BAND, interpret=True
    )
    got = np.asarray(ker(*args, pad_bands(xp, HW_OUT, ROW_BAND)))
    ref = np.asarray(fused_block_ref(xp, *args, hw_out=HW_OUT))
    np.testing.assert_array_equal(got, ref)


def test_ref_matches_nhwc_conv_chain(setup):
    prm, x_nhwc, xp, args = setup
    ref = np.asarray(fused_block_ref(xp, *args, hw_out=HW_OUT))
    chain = xla_nhwc_chain(CIN, CMID, COUT_PAD)
    we_hwio = jnp.asarray(prm["we"]).T.reshape(1, 1, CIN, CMID)
    wd_hwio = jnp.asarray(prm["wd"].reshape(3, 3, 1, CMID).astype(np.int8))
    wp_hwio = jnp.asarray(prm["wp"]).T.reshape(1, 1, CMID, COUT_PAD)
    bc = lambda v: jnp.asarray(v.reshape(1, 1, 1, -1))  # noqa: E731
    co = np.asarray(chain(
        x_nhwc, we_hwio, bc(prm["e_scale"]), bc(prm["e_bias"]),
        bc(prm["e_inv_sdw"]), wd_hwio, bc(prm["d_scale"]),
        bc(prm["d_bias"]), bc(prm["d_inv_sproj"]), wp_hwio,
        bc(prm["p_scale"]), bc(prm["p_bias"]),
    ))
    chain_planar = np.moveaxis(
        co.reshape(B, HW_OUT * HW_OUT, COUT_PAD), 2, 1
    )
    np.testing.assert_array_equal(ref, chain_planar)


def test_dw_f32_macs_match_int32():
    """The kernel accumulates dw taps in f32; assert exactness vs int32
    accumulation over the full int8 range (products*9 < 2^24)."""
    rng = np.random.RandomState(0)
    x = rng.randint(-127, 128, (9, 4096)).astype(np.int64)
    w = rng.randint(-127, 128, (9, 1)).astype(np.int64)
    acc_i = (x * w).sum(axis=0)
    acc_f = (
        (x.astype(np.float32) * w.astype(np.float32))
        .astype(np.float32).sum(axis=0, dtype=np.float32)
    )
    np.testing.assert_array_equal(acc_i, acc_f.astype(np.int64))


class TestStride1Residual:
    B, CIN, CMID, HW, ROW_BAND = 2, 24, 48, 16, 4
    COUT_PAD = 32

    def _setup(self):
        from tpucenterface.bench.probe_fused_block import make_params
        prm = make_params(self.CIN, self.CMID, self.COUT_PAD, seed=5)
        rng = np.random.RandomState(2)
        x = jnp.asarray(
            rng.rand(self.B, self.CIN, self.HW * self.HW)
            .astype(np.float32) * 4 - 2
        ).astype(jnp.bfloat16)
        inv_se = jnp.asarray(np.array([[37.5]], np.float32))
        args = [inv_se] + [jnp.asarray(prm[k]) for k in (
            "we", "e_scale", "e_bias", "e_inv_sdw", "wd", "d_scale",
            "d_bias", "d_inv_sproj", "wp", "p_scale", "p_bias")]
        return prm, x, args

    def test_s1_kernel_matches_ref(self):
        from tpucenterface.bench.probe_fused_block import (
            fused_block_s1_ref, make_fused_block_s1_kernel, pad_bands)
        prm, x, args = self._setup()
        x32 = jnp.concatenate(
            [x, jnp.zeros((self.B, self.COUT_PAD - self.CIN,
                           self.HW * self.HW), x.dtype)], axis=1)
        args_k = list(args)
        args_k[1] = jnp.concatenate(
            [args[1], jnp.zeros((self.CMID, self.COUT_PAD - self.CIN),
                                args[1].dtype)], axis=1)
        halo = -(-(self.HW + 1) // 128) * 128
        xp = pad_bands(x32, self.HW, self.ROW_BAND,
                       halo_lo=halo, halo_hi=halo)
        ker = make_fused_block_s1_kernel(
            self.B, self.CIN, self.CMID, self.HW, self.ROW_BAND,
            interpret=True)
        got = np.asarray(ker(*args_k, xp).astype(jnp.float32))
        ref = np.asarray(fused_block_s1_ref(
            x, *args, hw=self.HW).astype(jnp.float32))
        np.testing.assert_array_equal(got, ref)

    def test_s1_ref_matches_nhwc_chain(self):
        from tpucenterface.bench.probe_fused_block import (
            fused_block_s1_ref, xla_nhwc_chain_s1)
        prm, x, args = self._setup()
        ref = np.asarray(fused_block_s1_ref(
            x, *args, hw=self.HW).astype(jnp.float32))
        x_nhwc = jnp.asarray(
            np.moveaxis(np.asarray(x.astype(jnp.float32)), 1, 2)
            .reshape(self.B, self.HW, self.HW, self.CIN)
        ).astype(jnp.bfloat16)
        we_hwio = jnp.asarray(prm["we"]).T.reshape(1, 1, self.CIN, self.CMID)
        wd_hwio = jnp.asarray(
            prm["wd"].reshape(3, 3, 1, self.CMID).astype(np.int8))
        wp_hwio = jnp.asarray(prm["wp"]).T.reshape(
            1, 1, self.CMID, self.COUT_PAD)
        bc = lambda v: jnp.asarray(v.reshape(1, 1, 1, -1))  # noqa: E731
        chain = xla_nhwc_chain_s1(self.CIN, self.CMID, self.COUT_PAD)
        co = np.asarray(chain(
            x_nhwc, jnp.float32(37.5), we_hwio, bc(prm["e_scale"]),
            bc(prm["e_bias"]), bc(prm["e_inv_sdw"]), wd_hwio,
            bc(prm["d_scale"]), bc(prm["d_bias"]), bc(prm["d_inv_sproj"]),
            wp_hwio, bc(prm["p_scale"]), bc(prm["p_bias"]),
        ).astype(jnp.float32))
        chain_planar = np.moveaxis(
            co.reshape(self.B, self.HW * self.HW, self.COUT_PAD), 2, 1)
        np.testing.assert_array_equal(ref, chain_planar)
