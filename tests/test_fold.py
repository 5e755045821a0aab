"""BN folding parity tests (inference hot path, weights.fold)."""

from dataclasses import replace

import jax
import numpy as np
import torch

from tpucenterface.config import DetectorConfig, ModelConfig
from tpucenterface.detector import Detector
from tpucenterface.model.centernet import CenterFaceNet
from tpucenterface.weights.fold import fold_variables
from tpucenterface.weights.port import flax_from_torch_module
from tpucenterface.weights.torch_twin import TorchCenterFace

CFG = ModelConfig(compute_dtype="float32")


def _randomized_variables():
    torch.manual_seed(1)
    twin = TorchCenterFace(CFG).eval()
    with torch.no_grad():
        for m in twin.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.3, 0.3)
    return flax_from_torch_module(twin, CFG)


def test_folded_matches_unfolded():
    variables = _randomized_variables()
    folded = fold_variables(variables, bn_eps=CFG.bn_eps)
    model = CenterFaceNet(CFG)
    fmodel = CenterFaceNet(replace(CFG, folded=True))
    x = np.random.RandomState(0).rand(1, 128, 128, 3).astype(np.float32)
    a = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(variables, x)
    b = jax.jit(lambda v, xx: fmodel.apply(v, xx, train=False))(folded, x)
    for k in ("hm", "wh", "off"):
        np.testing.assert_allclose(
            np.asarray(b[k]), np.asarray(a[k]), atol=5e-4, err_msg=k
        )


def test_detector_autofolds_and_detects():
    variables = _randomized_variables()
    cfg = DetectorConfig(model=CFG, default_size=64)
    det_f = Detector(variables=variables, config=cfg, fold_bn=True)
    det_u = Detector(variables=variables, config=cfg, fold_bn=False)
    assert det_f.config.model.folded and not det_u.config.model.folded
    img = np.random.RandomState(1).randint(0, 255, (64, 64, 3), np.uint8)
    bf, sf = det_f.detect(img, score_thresh=0.0)[:2]
    bu, su = det_u.detect(img, score_thresh=0.0)[:2]
    np.testing.assert_allclose(sf, su, atol=1e-4)
    np.testing.assert_allclose(bf, bu, atol=5e-3)


def test_s2d_stem_matches_3x3_stem_exactly():
    """The space-to-depth stem (2x2/s1 conv on s2d-12ch input with remapped
    weights) must be arithmetically identical to the 3x3/s2 stem."""
    variables = _randomized_variables()
    folded = fold_variables(variables, bn_eps=CFG.bn_eps)
    folded_s2d = fold_variables(variables, bn_eps=CFG.bn_eps, s2d_stem=True)
    fmodel = CenterFaceNet(replace(CFG, folded=True))
    smodel = CenterFaceNet(replace(CFG, folded=True, s2d_stem=True))
    x = np.random.RandomState(2).rand(2, 64, 64, 3).astype(np.float32)
    a = jax.jit(lambda v, xx: fmodel.apply(v, xx, train=False))(folded, x)
    b = jax.jit(lambda v, xx: smodel.apply(v, xx, train=False))(folded_s2d, x)
    for k in ("hm", "wh", "off"):
        np.testing.assert_allclose(
            np.asarray(b[k]), np.asarray(a[k]), atol=1e-5, err_msg=k
        )


def test_detector_s2d_stem_opt_in():
    """s2d_stem is an explicit opt-in (measured slower on v5e, see
    PERFORMANCE.md); when requested, the Detector remaps the stem weights."""
    det = Detector(
        variables=_randomized_variables(),
        config=DetectorConfig(model=replace(CFG, s2d_stem=True), default_size=64),
    )
    assert det.config.model.s2d_stem
    k = np.asarray(det.variables["params"]["backbone"]["stem"]["conv"]["kernel"])
    assert k.shape[:2] == (2, 2) and k.shape[2] == 12
    # default stays off
    det2 = Detector(
        variables=_randomized_variables(),
        config=DetectorConfig(model=CFG, default_size=64),
    )
    assert not det2.config.model.s2d_stem


def test_detector_constructed_with_s2d_stem_from_scratch():
    """ModelConfig(s2d_stem=True) at construction: init builds the 2x2 s2d
    stem directly, so the fold must NOT try the 3x3 remap (regression: this
    crashed with 's2d stem remap expects a 3x3 kernel')."""
    import jax
    import numpy as np

    from tpucenterface.config import DetectorConfig, ModelConfig
    from tpucenterface.detector import Detector

    cfg = DetectorConfig(
        model=ModelConfig(compute_dtype="float32", s2d_stem=True),
        buckets=(64, 128),
        default_size=64,
    )
    det = Detector(config=cfg, rng=jax.random.PRNGKey(0))
    assert det.config.model.s2d_stem
    out = det.detect(
        np.zeros((64, 64, 3), np.uint8), score_thresh=-1.0
    )
    assert out.boxes.shape[1] == 4 and np.isfinite(out.scores).all()


def test_stem_bake_parity_and_flag():
    """stem_bake folds BGR flip + /255 + mean/std into the stem conv;
    detect results must match the unbaked pipeline within float tolerance
    on BOTH the identity and the resize path (VERDICT r2 task-1 lever a)."""
    import dataclasses

    import jax
    import numpy as np

    from tpucenterface.config import DetectorConfig, ModelConfig
    from tpucenterface.detector import Detector
    from tpucenterface.model.centernet import init_model

    cfgA = DetectorConfig(
        model=ModelConfig(compute_dtype="float32"), default_size=64
    )
    cfgB = dataclasses.replace(
        cfgA,
        preprocess=dataclasses.replace(cfgA.preprocess, stem_bake=False),
    )
    _, raw_vars = init_model(cfgA.model, rng=jax.random.PRNGKey(0))
    detA = Detector(variables=raw_vars, config=cfgA)
    detB = Detector(variables=raw_vars, config=cfgB)
    assert detA.config.model.stem_preprocess
    assert not detB.config.model.stem_preprocess
    # Compare the HEAD MAPS through both input conventions (decode is the
    # same code after that; random-weight score near-ties make box-level
    # comparison ill-posed). Covers the identity path (raw normalize) and
    # the letterbox resize path.
    import jax.numpy as jnp

    from tpucenterface.preprocess import (
        letterbox_normalize_batch,
        normalize_images,
    )

    rng = np.random.RandomState(1)
    img64 = jnp.asarray(rng.randint(0, 255, (1, 64, 64, 3), np.uint8))
    fa = detA._forward(normalize_images(img64, cfgA.preprocess, raw=True))
    fb = detB._forward(normalize_images(img64, cfgB.preprocess, raw=False))
    for k in fa:
        np.testing.assert_allclose(
            np.asarray(fa[k]), np.asarray(fb[k]), atol=2e-3, err_msg=k
        )
    imgs = jnp.asarray(rng.randint(0, 255, (1, 40, 56, 3), np.uint8))
    hws = jnp.asarray(np.array([[40, 56]], np.int32))
    xa, _, _ = letterbox_normalize_batch(imgs, hws, 64, cfgA.preprocess, raw=True)
    xb, _, _ = letterbox_normalize_batch(imgs, hws, 64, cfgB.preprocess, raw=False)
    fa = detA._forward(xa)
    fb = detB._forward(xb)
    for k in fa:
        np.testing.assert_allclose(
            np.asarray(fa[k]), np.asarray(fb[k]), atol=2e-3, err_msg=k
        )


def test_bake_preprocess_into_stem_exact_math():
    """Isolated bake math vs flip+normalize+conv, f64, including the
    zero-padded borders (the shared zero point makes them exact)."""
    import jax.lax as lax
    import jax.numpy as jnp
    import numpy as np

    from tpucenterface.config import PreprocessConfig
    from tpucenterface.weights.fold import (
        bake_preprocess_into_stem,
        raw_pixel_offset,
    )

    pp = PreprocessConfig()
    rng = np.random.RandomState(0)
    K = rng.randn(3, 3, 3, 8)
    b = rng.randn(8)
    u = rng.randint(0, 255, (1, 10, 10, 3)).astype(np.float64)  # raw BGR

    conv = lambda z, k: lax.conv_general_dilated(
        jnp.asarray(z), jnp.asarray(k), (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    mean = np.array(pp.mean) * 255.0
    std = np.array(pp.std) * 255.0
    ref = np.asarray(conv((u[..., ::-1] - mean) / std, K)) + b

    baked = bake_preprocess_into_stem({"kernel": K, "bias": b}, pp)
    x = u - raw_pixel_offset(pp)
    got = np.asarray(
        conv(x, np.asarray(baked["kernel"], np.float64))
    ) + np.asarray(baked["bias"], np.float64)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_detector_max_dets_override():
    """_batch_fn(max_dets=...) compiles a serving-profile program whose
    top-K results are the head of the default program's K=bigger list."""
    import jax
    import numpy as np

    from tpucenterface.config import DetectorConfig, ModelConfig
    from tpucenterface.detector import Detector

    cfg = DetectorConfig(
        model=ModelConfig(compute_dtype="float32"), default_size=64
    )
    det = Detector(config=cfg, rng=jax.random.PRNGKey(0))
    rng = np.random.RandomState(2)
    imgs = rng.randint(0, 255, (2, 64, 64, 3), np.uint8)
    hws = np.tile(np.array([[64, 64]], np.int32), (2, 1))
    full = det._batch_fn(2, (64, 64), 64)(imgs, hws)
    small = det._batch_fn(2, (64, 64), 64, max_dets=16)(imgs, hws)
    assert np.asarray(small[1]).shape == (2, 16)
    np.testing.assert_allclose(
        np.asarray(small[1]), np.asarray(full[1])[:, :16], atol=1e-6
    )
