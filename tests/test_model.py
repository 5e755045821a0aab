"""Model shape/structure tests (SURVEY.md §2 C1-C3).

Structural assertions use `jax.eval_shape` (abstract — no compute, no per-op
XLA compiles, fast on CPU); the single value-level test jits the whole apply.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpucenterface.config import ModelConfig
from tpucenterface.model.backbone import MobileNetV2Backbone, backbone_plan
from tpucenterface.model.centernet import CenterFaceNet


def _abstract_init_apply(module, x_shape, **apply_kw):
    x = jax.ShapeDtypeStruct(x_shape, jnp.float32)
    variables = jax.eval_shape(
        lambda r, xx: module.init(r, xx, train=False), jax.random.PRNGKey(0), x
    )
    out = jax.eval_shape(
        lambda v, xx: module.apply(v, xx, train=False), variables, x
    )
    return variables, out


def test_backbone_plan_strides():
    cfg = ModelConfig()
    plan = backbone_plan(cfg)
    assert len(plan) == 17
    assert plan[-1][3] == 32  # deepest stride


def test_backbone_feature_pyramid():
    cfg = ModelConfig(compute_dtype="float32")
    _, feats = _abstract_init_apply(MobileNetV2Backbone(cfg), (1, 128, 128, 3))
    assert set(feats.keys()) == {4, 8, 16, 32}
    for s, f in feats.items():
        assert f.shape[1] == 128 // s and f.shape[2] == 128 // s
    assert feats[4].shape[-1] == 24
    assert feats[8].shape[-1] == 32
    assert feats[16].shape[-1] == 96
    assert feats[32].shape[-1] == 320


def test_full_model_head_shapes():
    cfg = ModelConfig(compute_dtype="float32")
    _, out = _abstract_init_apply(CenterFaceNet(cfg), (2, 160, 160, 3))
    assert out["hm"].shape == (2, 40, 40, 1)
    assert out["wh"].shape == (2, 40, 40, 2)
    assert out["off"].shape == (2, 40, 40, 2)
    assert out["hm"].dtype == jnp.float32


def test_landmark_head_optional():
    cfg = ModelConfig(compute_dtype="float32", with_landmarks=True)
    _, out = _abstract_init_apply(CenterFaceNet(cfg), (1, 128, 128, 3))
    assert out["lm"].shape == (1, 32, 32, 10)


def test_hm_prior_bias():
    """sigmoid(hm) of a fresh model ~ 0.01 prior (parity-critical init)."""
    cfg = ModelConfig(compute_dtype="float32")
    model = CenterFaceNet(cfg)
    x = jnp.zeros((1, 128, 128, 3))
    variables = jax.jit(lambda r: model.init(r, x, train=False))(
        jax.random.PRNGKey(0)
    )
    hm = jax.jit(lambda v: model.apply(v, x, train=False)["hm"])(variables)
    p = jax.nn.sigmoid(hm)
    assert 0.001 < float(p.mean()) < 0.08


def test_param_count_lightweight():
    """The point of the reference is being lightweight (~a few M params)."""
    cfg = ModelConfig()
    model = CenterFaceNet(cfg)
    variables = jax.eval_shape(
        lambda r, x: model.init(r, x, train=False),
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 128, 128, 3), jnp.float32),
    )
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    assert n < 4_000_000, f"model not lightweight: {n} params"


def test_width_mult_make_divisible_90pct_floor():
    """width() must follow torchvision's full _make_divisible rule, including
    the 90% floor (ADVICE r1): 89 * 0.4 = 35.6 rounds to 32 which is < 0.9 *
    35.6, so the result bumps to 40."""
    from tpucenterface.config import ModelConfig

    cfg = ModelConfig(width_mult=0.4)
    assert cfg.width(89) == 40
    # plain rounding still intact
    cfg5 = ModelConfig(width_mult=0.5)
    assert cfg5.width(32) == 16
    assert cfg5.width(16) == 8
