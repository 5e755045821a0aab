"""2-process multi-host DP: real jax.distributed over a local coordinator
(VERDICT r2 #6 — turns runtime.sharding's multi-host scaffolding into
verified behavior).

Spawns 2 worker processes (tests/multihost_worker.py), each with 4 fake CPU
devices, joined into ONE 8-device global mesh. Each worker feeds its
process-local rows (process_local_batch_bounds +
jax.make_array_from_process_local_data), runs a DP detect launch and a DP
train step, and reports its local output shards + the replicated loss.
The parent asserts both workers agree and match the single-process
8-device reference computed here.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_matches_single_process(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    outs = [str(tmp_path / f"w{i}.json") for i in range(2)]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own 4-device flag
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(repo, "tests", "multihost_worker.py"),
                coord,
                str(i),
                "2",
                outs[i],
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for i in range(2)
    ]
    results = []
    for p, out in zip(procs, outs):
        stdout, stderr = p.communicate(timeout=540)
        assert p.returncode == 0, (
            f"worker failed rc={p.returncode}\n"
            f"stdout: {stdout.decode()[-2000:]}\n"
            f"stderr: {stderr.decode()[-2000:]}"
        )
        with open(out) as f:
            results.append(json.load(f))

    for r in results:
        assert r["process_count"] == 2
        assert r["n_devices"] == 8
    assert results[0]["bounds"] == [0, 4]
    assert results[1]["bounds"] == [4, 8]

    # single-process 8-device reference (this pytest process has 8 fake
    # devices via conftest)
    import jax

    from tpucenterface.config import DetectorConfig, ModelConfig, TrainConfig
    from tpucenterface.detector import Detector
    from tpucenterface.runtime.sharding import data_mesh, put_sharded, shard_batch_fn

    det = Detector(
        config=DetectorConfig(
            model=ModelConfig(compute_dtype="float32"), default_size=64
        ),
        rng=jax.random.PRNGKey(0),
    )
    mesh = data_mesh()
    B = 8
    rng = np.random.RandomState(42)
    imgs = rng.randint(0, 255, (B, 64, 64, 3), np.uint8)
    hws = np.tile(np.array([[64, 64]], np.int32), (B, 1))
    fn = shard_batch_fn(det._batch_fn(B, (64, 64), 64), mesh, num_batch_args=2)
    ref_scores = np.asarray(
        fn(put_sharded(imgs, mesh), put_sharded(hws, mesh))[1]
    )

    rows = {}
    for r in results:
        for k, v in r["scores_rows"].items():
            rows[int(k)] = np.asarray(v)
    got = np.concatenate([rows[k] for k in sorted(rows)], axis=0)
    assert got.shape == ref_scores.shape
    np.testing.assert_allclose(got, ref_scores, atol=1e-5)

    # the DP train step's loss is psum'd -> identical across processes and
    # equal to the single-process step
    from tpucenterface.train.step import (
        make_dummy_batch,
        make_train_state,
        make_train_step,
        shard_train_step,
    )

    tcfg = TrainConfig(batch_size=B, max_objs=4)
    model, state, tx = make_train_state(
        ModelConfig(compute_dtype="float32"),
        tcfg,
        rng=jax.random.PRNGKey(1),
        input_size=64,
    )
    step = make_train_step(model, tx, tcfg)
    jstep, sstate = shard_train_step(step, mesh, state)
    batch = make_dummy_batch(B, 64, tcfg)
    batch = {k: put_sharded(np.asarray(v), mesh) for k, v in batch.items()}
    _, metrics = jstep(sstate, batch)
    ref_loss = float(np.asarray(metrics["loss"]))
    assert np.isfinite(ref_loss)
    for r in results:
        np.testing.assert_allclose(r["loss"], ref_loss, rtol=1e-5)
        # the prefetch pipeline's multi-host branch feeds identical data
        np.testing.assert_allclose(r["prefetch_loss"], r["loss"], rtol=1e-6)
    np.testing.assert_allclose(results[0]["loss"], results[1]["loss"], rtol=1e-7)
