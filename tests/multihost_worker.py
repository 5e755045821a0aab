"""Worker process for the 2-process multi-host DP test (VERDICT r2 #6).

Each worker: 4 fake CPU devices, joins the jax.distributed coordinator,
builds the GLOBAL 8-device data mesh, feeds its process-local batch rows
(runtime.sharding.process_local_batch_bounds), runs one DP detect launch
and one DP train step, and writes its local results + the replicated loss
to a JSON file for the parent test to compare against the single-process
reference.

Invoked as: python tests/multihost_worker.py <coord> <pid> <nprocs> <out.json>
"""

import json
import os
import sys


def main() -> None:
    coord, pid, nprocs, out_path = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tpucenterface.runtime.sharding import (
        batch_sharding,
        data_mesh,
        maybe_init_distributed,
        process_local_batch_bounds,
        shard_batch_fn,
    )

    assert maybe_init_distributed(
        coordinator_address=coord, num_processes=nprocs, process_id=pid
    )
    assert jax.process_count() == nprocs, jax.process_count()
    assert len(jax.devices()) == 4 * nprocs, len(jax.devices())

    import numpy as np

    from tpucenterface.config import DetectorConfig, ModelConfig, TrainConfig
    from tpucenterface.detector import Detector

    det = Detector(
        config=DetectorConfig(
            model=ModelConfig(compute_dtype="float32"), default_size=64
        ),
        rng=jax.random.PRNGKey(0),
    )
    mesh = data_mesh()
    sh = batch_sharding(mesh)
    B = 8
    rng = np.random.RandomState(42)
    imgs = rng.randint(0, 255, (B, 64, 64, 3), np.uint8)  # same on every proc
    hws = np.tile(np.array([[64, 64]], np.int32), (B, 1))
    lo, hi = process_local_batch_bounds(B)
    g_imgs = jax.make_array_from_process_local_data(sh, imgs[lo:hi])
    g_hws = jax.make_array_from_process_local_data(sh, hws[lo:hi])
    fn = shard_batch_fn(det._batch_fn(B, (64, 64), 64), mesh, num_batch_args=2)
    out = fn(g_imgs, g_hws)
    scores = out[1]
    local = sorted(
        scores.addressable_shards, key=lambda s: s.index[0].start or 0
    )
    local_rows = {
        int(s.index[0].start or 0): np.asarray(s.data).tolist() for s in local
    }

    # one DP train step over the same global mesh
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
    # second replicated copy from a HOST snapshot: the jitted step DONATES
    # its state argument, and device_put may alias rather than copy, so the
    # prefetch-path run below needs provably fresh buffers
    _, sstate_b = shard_train_step(step, mesh, jax.device_get(state))
    batch = make_dummy_batch(B, 64, tcfg)
    batch = {
        k: jax.make_array_from_process_local_data(sh, np.asarray(v)[lo:hi])
        for k, v in batch.items()
    }
    _, metrics = jstep(sstate, batch)
    loss = float(np.asarray(metrics["loss"]))

    # the SAME step fed through the training loop's prefetch pipeline
    # (multi-host branch: global batch in, per-process rows transferred)
    from tpucenterface.runtime.prefetch import prefetch_to_device

    host_batch = {
        k: np.asarray(v) for k, v in make_dummy_batch(B, 64, tcfg).items()
    }
    dev_batches = list(
        prefetch_to_device([host_batch], size=2, sharding=sh)
    )
    _, metrics2 = jstep(sstate_b, dev_batches[0])
    prefetch_loss = float(np.asarray(metrics2["loss"]))

    with open(out_path, "w") as f:
        json.dump(
            {
                "pid": pid,
                "bounds": [lo, hi],
                "scores_rows": local_rows,
                "loss": loss,
                "prefetch_loss": prefetch_loss,
                "process_count": jax.process_count(),
                "n_devices": len(jax.devices()),
            },
            f,
        )


if __name__ == "__main__":
    main()
