"""DP sharding tests on the 8-fake-device CPU mesh (SURVEY.md §4 item 4)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpucenterface.config import DetectorConfig, ModelConfig
from tpucenterface.detector import Detector
from tpucenterface.runtime.prefetch import prefetch_to_device
from tpucenterface.runtime.sharding import (
    batch_sharding,
    data_mesh,
    put_sharded,
    shard_batch_fn,
)


def test_mesh_has_8_devices():
    mesh = data_mesh()
    assert mesh.devices.size == 8


def test_shard_batch_fn_matches_unsharded():
    mesh = data_mesh()
    w = jnp.asarray(np.random.RandomState(0).rand(16, 8).astype(np.float32))

    def fn(x):
        return jnp.tanh(x @ w)

    x = jnp.asarray(np.random.RandomState(1).rand(32, 16).astype(np.float32))
    sharded = shard_batch_fn(fn, mesh)
    y_sh = sharded(put_sharded(x, mesh))
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(fn(x)), atol=1e-6)
    # result really is sharded over the mesh
    assert len(y_sh.sharding.device_set) == 8


def test_dp_detector_inference_matches_single():
    cfg = DetectorConfig(model=ModelConfig(compute_dtype="float32"), default_size=64)
    det = Detector(config=cfg, rng=jax.random.PRNGKey(0))
    mesh = data_mesh()
    b, s = 8, 64
    imgs = np.random.RandomState(0).randint(0, 255, (b, s, s, 3), np.uint8)
    hws = np.tile(np.array([[s, s]], np.int32), (b, 1))

    single = det._batch_fn(b, (s, s), s)
    boxes1, scores1 = single(jnp.asarray(imgs), jnp.asarray(hws))

    dp = shard_batch_fn(
        lambda im, hw: single(im, hw), mesh, num_batch_args=2
    )
    boxes2, scores2 = dp(
        put_sharded(jnp.asarray(imgs), mesh), put_sharded(jnp.asarray(hws), mesh)
    )
    np.testing.assert_allclose(np.asarray(scores2), np.asarray(scores1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(boxes2), np.asarray(boxes1), atol=1e-3)


def test_prefetch_preserves_order_and_device():
    mesh = data_mesh()
    batches = [{"x": np.full((8, 4), i, np.float32)} for i in range(5)]
    out = list(prefetch_to_device(iter(batches), size=2, sharding=batch_sharding(mesh)))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert float(b["x"][0, 0]) == i
        assert len(b["x"].sharding.device_set) == 8


def test_graft_dryrun_smoke():
    import __graft_entry__ as g

    g.dryrun_multichip(4)


def test_maybe_init_distributed_noop_single_process(monkeypatch):
    """Without coordinator config the init must be a no-op (single-process
    path unchanged, VERDICT r1 #7); the initialize call is reachable and
    plumbed when configured."""
    import tpucenterface.runtime.sharding as sh

    monkeypatch.delenv("TPUCF_COORDINATOR", raising=False)
    monkeypatch.delenv("TPUCF_MULTIHOST", raising=False)
    assert sh.maybe_init_distributed() is False

    calls = {}
    monkeypatch.setattr(
        sh.jax.distributed, "initialize",
        lambda **kw: calls.update(kw),
    )
    monkeypatch.setattr(sh, "_DISTRIBUTED_INITIALIZED", False)
    assert sh.maybe_init_distributed(
        coordinator_address="10.0.0.1:1234", num_processes=4, process_id=1
    )
    assert calls == {
        "coordinator_address": "10.0.0.1:1234",
        "num_processes": 4,
        "process_id": 1,
    }
    # idempotent
    assert sh.maybe_init_distributed() is True
    monkeypatch.setattr(sh, "_DISTRIBUTED_INITIALIZED", False)


def test_process_local_batch_bounds_single():
    from tpucenterface.runtime.sharding import process_local_batch_bounds

    assert process_local_batch_bounds(32) == (0, 32)
