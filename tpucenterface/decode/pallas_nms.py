"""Fused sigmoid + 3x3 maxpool pseudo-NMS as one Pallas kernel.

The decode's dense stage (`decode.reference.pseudo_nms` on sigmoid(hm))
lowers in XLA to several shifted-max/select passes over the heatmap —
measured ~0.15ms at bs32 @640, ~30x the map's HBM floor. This kernel does
the whole stage in ONE VMEM pass per image: read logits, sigmoid, separable
3x3 shifted max (sublane shifts for H, lane shifts for W), peak select,
write the masked scores. Bit-compatible with the golden `pseudo_nms`
(same maximum/select ops in the same order; property-tested in
tests/test_pallas_nms.py).

MEASURED (v5e, slope method): bit-exact with the golden (maxdiff 0.0 on
random maps) but SLOWER than XLA's dense stage, which fuses the whole
sigmoid/shifted-max/select chain into ~free elementwise passes: 0.103 vs
0.041 ms at bs32, 0.035 vs ~0.01 ms at bs128 — the pallas_call grid
overhead exceeds the stage's entire cost. Ledger entry #18 in
PERFORMANCE.md; kept tested (tests/test_pallas_nms.py) and default-OFF,
like every other hand kernel that lost to XLA on this model.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

def _nms_kernel(hm_ref, out_ref):
    x = hm_ref[0]  # (H, W) f32 logits
    s = jax.nn.sigmoid(x)
    h, w = s.shape
    neg_row = jnp.full((1, w), -float("inf"), jnp.float32)
    up = jnp.concatenate([s[1:], neg_row], axis=0)
    dn = jnp.concatenate([neg_row, s[:-1]], axis=0)
    v = jnp.maximum(jnp.maximum(up, s), dn)
    neg_col = jnp.full((h, 1), -float("inf"), jnp.float32)
    lf = jnp.concatenate([v[:, 1:], neg_col], axis=1)
    rt = jnp.concatenate([neg_col, v[:, :-1]], axis=1)
    hmax = jnp.maximum(jnp.maximum(lf, v), rt)
    out_ref[0] = jnp.where(hmax == s, s, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sigmoid_pseudo_nms_pallas(
    hm_logits: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """(B, H, W) f32 logits -> (B, H, W) peak-masked sigmoid scores."""
    b, h, w = hm_logits.shape
    return pl.pallas_call(
        _nms_kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        interpret=interpret,
    )(hm_logits.astype(jnp.float32))
