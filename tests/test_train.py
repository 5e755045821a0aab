"""Training substrate tests: losses, augment, loader, end-to-end loop with
checkpoint/resume on the 8-fake-device mesh (SURVEY.md §2 C8-C10)."""

import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpucenterface.config import ModelConfig, TrainConfig
from tpucenterface.data.augment import hflip, random_affine
from tpucenterface.data.loader import batch_iterator
from tpucenterface.data.wider import WiderImage
from tpucenterface.train.losses import focal_loss, gather_at_ind, masked_l1


def test_focal_loss_orders_predictions():
    gt = jnp.zeros((1, 8, 8, 1)).at[0, 4, 4, 0].set(1.0)
    good = jnp.full((1, 8, 8, 1), -6.0).at[0, 4, 4, 0].set(6.0)
    bad = jnp.full((1, 8, 8, 1), -6.0)
    assert float(focal_loss(good, gt)) < float(focal_loss(bad, gt))


def test_gather_and_masked_l1():
    feat = jnp.arange(2 * 4 * 4 * 2, dtype=jnp.float32).reshape(2, 4, 4, 2)
    ind = jnp.array([[5], [0]])
    g = gather_at_ind(feat, ind)
    np.testing.assert_allclose(np.asarray(g[0, 0]), np.asarray(feat[0, 1, 1]))
    target = g + 1.0
    mask = jnp.ones((2, 1))
    assert abs(float(masked_l1(feat, target, ind, mask)) - 1.0) < 1e-6
    # masked-out entries contribute nothing
    assert float(masked_l1(feat, target + 100, ind, jnp.zeros((2, 1)))) == 0.0


def test_hflip_boxes():
    img = np.zeros((10, 20, 3), np.uint8)
    b = np.array([[2.0, 1.0, 8.0, 5.0]])
    img2, b2 = hflip(img, b)
    np.testing.assert_allclose(b2, [[12.0, 1.0, 18.0, 5.0]])


def test_random_affine_box_consistency():
    rng = np.random.RandomState(0)
    img = np.zeros((100, 200, 3), np.uint8)
    img[20:40, 50:90] = 255
    boxes = np.array([[50.0, 20.0, 90.0, 40.0]])
    out, b = random_affine(img, boxes, 128, rng, scale_range=(1.0, 1.0), shift_ratio=0)
    # the white region's bounding box in the canvas should match the mapped box
    ys, xs = np.where(out[..., 0] > 127)
    x1, x2 = np.clip(b[0, [0, 2]], 0, 127)
    y1, y2 = np.clip(b[0, [1, 3]], 0, 127)
    assert abs(xs.min() - x1) <= 1.5 and abs(xs.max() - x2) <= 1.5
    assert abs(ys.min() - y1) <= 1.5 and abs(ys.max() - y2) <= 1.5


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("wider")
    rng = np.random.RandomState(0)
    records = []
    for i in range(8):
        img = rng.randint(0, 255, (80, 100, 3), np.uint8)
        img[20:50, 30:70] = 255
        p = str(root / f"img_{i}.jpg")
        cv2.imwrite(p, img)
        records.append(
            WiderImage(
                path=p,
                rel_path=f"ev/img_{i}.jpg",
                boxes=np.array([[30, 20, 40, 30]], np.float32),
                invalid=np.array([False]),
            )
        )
    return records


def test_batch_iterator_shapes(tiny_dataset):
    cfg = TrainConfig(input_size=64, batch_size=4, max_objs=8)
    batch = next(iter(batch_iterator(tiny_dataset, cfg, seed=0)))
    assert batch["image"].shape == (4, 64, 64, 3)
    assert batch["image"].dtype == np.uint8
    assert batch["hm"].shape == (4, 16, 16, 1)
    assert batch["ind"].shape == (4, 8)


def test_train_loop_end_to_end(tiny_dataset, tmp_path):
    from tpucenterface.train.loop import restore_checkpoint, train
    from tpucenterface.train.step import make_train_state

    mcfg = ModelConfig(compute_dtype="float32")
    tcfg = TrainConfig(input_size=64, batch_size=8, max_objs=8, lr=1e-3)
    logs = {}

    state = train(
        tiny_dataset,
        model_cfg=mcfg,
        train_cfg=tcfg,
        workdir=str(tmp_path / "run"),
        max_steps=3,
        log_every=1,
        ckpt_every=2,
        log_fn=lambda s, m: logs.update({s: m}),
    )
    assert int(state.step) == 3
    assert logs and all(np.isfinite(m["loss"]) for m in logs.values())

    # resume restores the saved step
    _, template, _ = make_train_state(mcfg, tcfg, input_size=64)
    restored = restore_checkpoint(str(tmp_path / "run"), template)
    assert restored is not None and int(restored.step) == 3

    # exported weights load into the Detector API
    from tpucenterface.config import DetectorConfig
    from tpucenterface.detector import Detector

    det = Detector.from_safetensors(
        str(tmp_path / "run/model.safetensors"),
        config=DetectorConfig(model=mcfg, default_size=64),
    )
    boxes, scores = det.detect(np.zeros((64, 64, 3), np.uint8), score_thresh=0.0)[:2]
    assert boxes.shape[1] == 4


def test_train_loop_no_per_step_host_sync(tiny_dataset, tmp_path, monkeypatch):
    """The loop must enqueue multiple steps before any blocking device fetch
    (VERDICT r1 #6): the step counter lives on the host; metrics/state are
    only materialized at log/ckpt boundaries."""
    import tpucenterface.train.loop as loop_mod

    events = []

    class _Proxy:
        """Stands in for a device scalar; records materialization."""

        def __init__(self, v):
            self._v = v

        def __int__(self):
            events.append("fetch")
            return int(self._v)

        def __float__(self):
            events.append("fetch")
            return float(self._v)

        def items(self):  # metrics dict duck-typing not needed; unused
            return []

    real_shard = loop_mod.shard_train_step

    def fake_shard(step_fn, mesh, state):
        def fake_jitted(st, batch):
            import dataclasses

            events.append("step")
            n = len([e for e in events if e == "step"])
            return dataclasses.replace(st, step=_Proxy(n)), {"loss": _Proxy(1.0)}

        return fake_jitted, state

    monkeypatch.setattr(loop_mod, "shard_train_step", fake_shard)
    monkeypatch.setattr(loop_mod, "save_checkpoint", lambda *a, **k: "skipped")
    monkeypatch.setattr(loop_mod, "export_weights", lambda *a, **k: "skipped")

    mcfg = ModelConfig(compute_dtype="float32")
    tcfg = TrainConfig(input_size=64, batch_size=8, max_objs=8)
    loop_mod.train(
        tiny_dataset,
        model_cfg=mcfg,
        train_cfg=tcfg,
        workdir=str(tmp_path / "run2"),
        max_steps=4,
        log_every=100,      # no log fetch within the run
        ckpt_every=0,       # no ckpt fetch within the run
        log_fn=lambda s, m: None,
        resume=False,
    )
    steps_before_first_fetch = 0
    for e in events:
        if e == "fetch":
            break
        steps_before_first_fetch += 1
    assert steps_before_first_fetch >= 2, events
    _ = real_shard  # keep a reference; silences lint about unused capture


def test_bf16_bn_training_matches_f32():
    """bn_compute_dtype='bfloat16' (the measured +26% training option):
    loss must track the f32-BN path closely; running stats stay f32."""
    import jax
    import jax.numpy as jnp
    from tpucenterface.config import ModelConfig, TrainConfig
    from tpucenterface.train.step import (
        make_dummy_batch,
        make_train_state,
        make_train_step,
    )

    tc = TrainConfig()
    batch = make_dummy_batch(2, 64, tc)
    losses = {}
    for bn_dt in ("float32", "bfloat16"):
        mc = ModelConfig(bn_compute_dtype=bn_dt)
        model, state, tx = make_train_state(
            mc, tc, rng=jax.random.PRNGKey(0), input_size=64
        )
        step = jax.jit(make_train_step(model, tx, tc))
        for _ in range(2):
            state, metrics = step(state, batch)
        losses[bn_dt] = float(metrics["loss"])
        # running statistics must remain f32 (the fold path depends on it)
        stats_dtypes = {
            l.dtype for l in jax.tree.leaves(state.batch_stats)
        }
        assert stats_dtypes == {jnp.dtype(jnp.float32)}, (bn_dt, stats_dtypes)
    assert abs(losses["bfloat16"] - losses["float32"]) < 0.02 * abs(
        losses["float32"]
    ), losses


def test_loader_workers_deterministic_and_shaped(tmp_path):
    """workers>0 loader: bounded-window thread pool, deterministic stream."""
    import cv2
    import numpy as np
    from tpucenterface.config import TrainConfig
    from tpucenterface.data.loader import batch_iterator
    from tpucenterface.data.wider import WiderImage

    rng = np.random.RandomState(0)
    records = []
    for i in range(10):
        path = str(tmp_path / f"im{i}.jpg")
        cv2.imwrite(path, rng.randint(0, 255, (80, 100, 3), np.uint8))
        boxes = np.array([[10.0, 10.0, 20.0, 30.0]])  # x,y,w,h
        records.append(
            WiderImage(
                path=path,
                rel_path=f"ev/im{i}.jpg",
                boxes=boxes,
                invalid=np.zeros(1, bool),
            )
        )
    cfg = TrainConfig(input_size=64, batch_size=4, max_objs=8)

    def take(workers):
        it = batch_iterator(records, cfg, seed=3, epochs=1, workers=workers)
        return list(it)

    a = take(2)
    b = take(2)
    assert len(a) == 2  # 10 imgs, bs4, drop_last
    for ba, bb in zip(a, b):
        assert ba["image"].shape == (4, 64, 64, 3)
        np.testing.assert_array_equal(ba["image"], bb["image"])
        np.testing.assert_array_equal(ba["hm"], bb["hm"])


def test_grad_clip_bounds_update_norm():
    """make_optimizer(grad_clip_norm>0) clips the global gradient norm
    BEFORE Adam accumulates it. Adam's direction is scale-invariant, so
    the observable is its first-moment state: after one update with a
    norm-5 gradient and clip 1.0, mu = (1-b1) * g_clipped has global norm
    0.1*1.0; unclipped it would be 0.1*5.0."""
    from tpucenterface.train.step import make_optimizer

    def find_mu(state):
        if hasattr(state, "mu"):
            return state.mu
        if isinstance(state, (tuple, list)):
            for s in state:
                r = find_mu(s)
                if r is not None:
                    return r
        return None

    params = {"w": jnp.zeros((4,), jnp.float32)}
    big = {"w": jnp.asarray([3.0, 0.0, 4.0, 0.0], jnp.float32)}  # norm 5

    tx = make_optimizer(TrainConfig(grad_clip_norm=1.0, lr=1e-2))
    _, st = tx.update(big, tx.init(params), params)
    mu_norm = float(jnp.linalg.norm(find_mu(st)["w"]))
    np.testing.assert_allclose(mu_norm, 0.1 * 1.0, rtol=1e-5)

    tx0 = make_optimizer(TrainConfig(grad_clip_norm=0.0, lr=1e-2))
    _, st0 = tx0.update(big, tx0.init(params), params)
    mu0_norm = float(jnp.linalg.norm(find_mu(st0)["w"]))
    np.testing.assert_allclose(mu0_norm, 0.1 * 5.0, rtol=1e-5)


def test_ema_tracks_params_and_exports(tiny_dataset, tmp_path):
    """EMA params follow ema = d*ema + (1-d)*params inside the jitted step
    (checked against a host-side recomputation over real training steps);
    the loop exports model_ema.safetensors that loads into the Detector."""
    from tpucenterface.runtime.sharding import data_mesh
    from tpucenterface.train.loop import train
    from tpucenterface.train.step import (
        make_dummy_batch,
        make_train_state,
        make_train_step,
        shard_train_step,
    )

    mcfg = ModelConfig(compute_dtype="float32")
    tcfg = TrainConfig(
        input_size=64, batch_size=8, max_objs=8, lr=1e-3, ema_decay=0.9
    )
    model, state, tx = make_train_state(mcfg, tcfg, input_size=64)
    assert state.ema_params is not None
    step_fn = make_train_step(model, tx, tcfg)
    jitted, state = shard_train_step(step_fn, data_mesh(), state)
    batch = make_dummy_batch(8, 64, tcfg)

    expect = jax.device_get(state.ema_params)
    for _ in range(3):
        state, _ = jitted(state, batch)
        p = jax.device_get(state.params)
        expect = jax.tree.map(lambda e, q: 0.9 * e + 0.1 * q, expect, p)
    got = jax.device_get(state.ema_params)
    flat_e, _ = jax.tree_util.tree_flatten(expect)
    flat_g, _ = jax.tree_util.tree_flatten(got)
    for e, g in zip(flat_e, flat_g):
        np.testing.assert_allclose(g, e, rtol=1e-5, atol=1e-6)
    # EMA lags the live params (they moved; decay 0.9 over 3 steps)
    assert any(
        not np.allclose(g, q)
        for g, q in zip(flat_g, jax.tree_util.tree_leaves(jax.device_get(state.params)))
    )

    # loop export: model_ema.safetensors appears and loads into a Detector
    train(
        tiny_dataset,
        model_cfg=mcfg,
        train_cfg=tcfg,
        workdir=str(tmp_path / "run"),
        max_steps=2,
        ckpt_every=0,
        log_fn=None,
    )
    ema_path = str(tmp_path / "run/model_ema.safetensors")
    assert os.path.exists(ema_path)
    from tpucenterface.config import DetectorConfig
    from tpucenterface.detector import Detector

    det = Detector.from_safetensors(
        ema_path, config=DetectorConfig(model=mcfg, default_size=64)
    )
    b, s = det.detect(np.zeros((64, 64, 3), np.uint8), score_thresh=0.0)[:2]
    assert np.isfinite(s).all()


def test_ema_checkpoint_roundtrip(tiny_dataset, tmp_path):
    """ema_params survive the orbax checkpoint/restore cycle."""
    from tpucenterface.train.loop import restore_checkpoint, train
    from tpucenterface.train.step import make_train_state

    mcfg = ModelConfig(compute_dtype="float32")
    tcfg = TrainConfig(
        input_size=64, batch_size=8, max_objs=8, ema_decay=0.95
    )
    state = train(
        tiny_dataset,
        model_cfg=mcfg,
        train_cfg=tcfg,
        workdir=str(tmp_path / "run"),
        max_steps=2,
        ckpt_every=2,
        log_fn=None,
    )
    _, template, _ = make_train_state(mcfg, tcfg, input_size=64)
    restored = restore_checkpoint(str(tmp_path / "run"), template)
    assert restored is not None and restored.ema_params is not None
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state.ema_params)),
        jax.tree_util.tree_leaves(restored.ema_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_completed_run_does_not_resave(tiny_dataset, tmp_path):
    """Resuming a run whose checkpoint already sits at total_steps must exit
    cleanly (export only) — orbax refuses to overwrite the existing ckpt
    directory, so a blind final save would crash (regression)."""
    from tpucenterface.train.loop import train

    mcfg = ModelConfig(compute_dtype="float32")
    tcfg = TrainConfig(input_size=64, batch_size=8, max_objs=8, lr=1e-3)
    wd = str(tmp_path / "run")
    state = train(
        tiny_dataset, model_cfg=mcfg, train_cfg=tcfg, workdir=wd,
        max_steps=2, ckpt_every=2,
    )
    assert int(state.step) == 2
    # second invocation restores step 2, runs zero steps, must not raise
    state2 = train(
        tiny_dataset, model_cfg=mcfg, train_cfg=tcfg, workdir=wd,
        max_steps=2, ckpt_every=2, resume=True,
    )
    assert int(state2.step) == 2
    assert os.path.exists(os.path.join(wd, "model.safetensors"))


def test_frozen_bn_step_semantics(tiny_dataset):
    """FrozenBN (TrainConfig.freeze_bn_steps, the r5 flagship fix): the
    frozen step must leave batch_stats bit-identical while still updating
    params; the unfrozen step must mutate batch_stats."""
    from tpucenterface.runtime.sharding import data_mesh
    from tpucenterface.train.step import (
        make_train_state,
        make_train_step,
        shard_train_step,
    )

    mcfg = ModelConfig(compute_dtype="float32")
    tcfg = TrainConfig(input_size=64, batch_size=8, max_objs=8, lr=1e-3)
    batch = next(iter(batch_iterator(tiny_dataset, tcfg, seed=0)))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    model, state, tx = make_train_state(
        mcfg, tcfg, rng=jax.random.PRNGKey(0), input_size=64
    )
    mesh = data_mesh()
    stats0 = jax.device_get(state.batch_stats)

    frozen = make_train_step(model, tx, tcfg, frozen_bn=True)
    jit_frozen, state_f = shard_train_step(frozen, mesh, state)
    # snapshot before the call: the jitted step donates its input state
    params0 = jax.device_get(state_f.params)
    new_f, metrics_f = jit_frozen(state_f, batch)
    assert np.isfinite(float(metrics_f["loss"]))
    # batch_stats pass through bit-identically; params moved
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        new_f.batch_stats,
        stats0,
    )
    params_moved = any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 0
        for a, b in zip(jax.tree.leaves(new_f.params), jax.tree.leaves(params0))
    )
    assert params_moved, "frozen step must still update params"

    model2, state2, tx2 = make_train_state(
        mcfg, tcfg, rng=jax.random.PRNGKey(0), input_size=64
    )
    unfrozen = make_train_step(model2, tx2, tcfg)
    jit_unfrozen, state_u = shard_train_step(unfrozen, mesh, state2)
    new_u, _ = jit_unfrozen(state_u, batch)
    moved = any(
        np.abs(np.asarray(a) - b).max() > 0
        for a, b in zip(
            jax.tree.leaves(new_u.batch_stats), jax.tree.leaves(stats0)
        )
    )
    assert moved, "unfrozen step must update batch_stats"


def test_train_loop_freeze_bn_boundary(tiny_dataset, tmp_path):
    """train() switches to the frozen step at freeze_bn_steps: stats move
    during warmup, then stay bit-frozen to the end of the run."""
    from tpucenterface.train.loop import restore_checkpoint, train
    from tpucenterface.train.step import make_train_state

    mcfg = ModelConfig(compute_dtype="float32")
    tcfg = TrainConfig(
        input_size=64, batch_size=8, max_objs=8, lr=1e-3, freeze_bn_steps=2
    )
    state = train(
        tiny_dataset,
        model_cfg=mcfg,
        train_cfg=tcfg,
        workdir=str(tmp_path / "a"),
        max_steps=2,
        ckpt_every=0,
        resume=False,
    )
    stats_at_freeze = jax.device_get(state.batch_stats)

    state2 = train(
        tiny_dataset,
        model_cfg=mcfg,
        train_cfg=tcfg,
        workdir=str(tmp_path / "b"),
        max_steps=5,
        ckpt_every=0,
        resume=False,
    )
    assert int(state2.step) == 5
    # steps 3-5 ran frozen: stats equal the step-2 snapshot bit-for-bit
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state2.batch_stats,
        stats_at_freeze,
    )


def test_compile_retry_on_transient_relay_error():
    """Transient remote-compile RPC failures retry; everything else raises
    immediately (execution-phase errors may have consumed donated buffers)."""
    from tpucenterface.train.loop import call_with_compile_retry

    calls = {"n": 0}
    sleeps = []

    def flaky(x):
        calls["n"] += 1
        if calls["n"] < 3:
            raise jax.errors.JaxRuntimeError(
                "INTERNAL: http://127.0.0.1:8093/remote_compile: read body:"
                " response body closed before all bytes were read"
            )
        return x + 1

    assert call_with_compile_retry(flaky, 41, _sleep=sleeps.append) == 42
    assert calls["n"] == 3 and len(sleeps) == 2

    # retries exhausted -> the transient error propagates
    calls["n"] = -10
    with pytest.raises(jax.errors.JaxRuntimeError):
        call_with_compile_retry(flaky, 0, retries=2, _sleep=sleeps.append)

    # non-compile-phase runtime errors are NOT retried
    def exec_fail(x):
        calls["exec"] = calls.get("exec", 0) + 1
        raise jax.errors.JaxRuntimeError("INTERNAL: buffer was deleted")

    with pytest.raises(jax.errors.JaxRuntimeError):
        call_with_compile_retry(exec_fail, 0, _sleep=sleeps.append)
    assert calls["exec"] == 1
