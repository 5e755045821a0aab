"""Data-parallel sharding over a device mesh (SURVEY.md §2 DP row, config #5).

The only parallelism that is meaningful for this ~1-2M-param CNN detector is
data parallelism (TP/PP/SP/EP documented N/A in SURVEY.md §2): params are
replicated, the batch splits over a 1-D 'data' mesh axis, and inference needs
NO collectives on the hot path (pure sharding; XLA runs each shard locally).
Training grad/BN reductions are inserted by GSPMD (see train.step).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_DISTRIBUTED_INITIALIZED = False


def maybe_init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host scaffolding (VERDICT r1 #7): initialize jax.distributed when
    a multi-process run is requested, else no-op.

    Opt-in via arguments or environment (TPUCF_COORDINATOR / TPUCF_NUM_PROCS
    / TPUCF_PROC_ID, falling back to jax.distributed's own auto-detection on
    real multi-host TPU pods when TPUCF_MULTIHOST=1). A v5e-8 slice is
    single-host, so this stays off by default; past one slice, call this
    before any jax API and `data_mesh()` below will see the global device
    set. Returns True when initialization happened (idempotent).

    Untestable beyond plumbing in this container (one process, one chip);
    unit tests cover the no-op path and the reachable argument plumbing.
    """
    global _DISTRIBUTED_INITIALIZED
    if _DISTRIBUTED_INITIALIZED:
        return True
    coord = coordinator_address or os.environ.get("TPUCF_COORDINATOR")
    nproc = num_processes or (
        int(os.environ["TPUCF_NUM_PROCS"]) if "TPUCF_NUM_PROCS" in os.environ else None
    )
    pid = process_id if process_id is not None else (
        int(os.environ["TPUCF_PROC_ID"]) if "TPUCF_PROC_ID" in os.environ else None
    )
    auto = os.environ.get("TPUCF_MULTIHOST") == "1"
    if coord is None and not auto:
        return False
    if coord is not None:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=nproc,
            process_id=pid,
        )
    else:  # TPU-pod auto-detection
        jax.distributed.initialize()
    _DISTRIBUTED_INITIALIZED = True
    return True


def data_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D 'data' mesh over the first n devices (default: all *global*
    devices — after maybe_init_distributed() on a multi-host run,
    jax.devices() spans every process, so the same mesh code scales past one
    slice; per-host input feeding uses jax.process_index() shards)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("data",))


def process_local_batch_bounds(global_batch: int) -> tuple:
    """[start, end) rows of the global batch this process should feed
    (multi-host input pipeline contract; trivially (0, B) single-process)."""
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch // n
    return (i * per, (i + 1) * per if i < n - 1 else global_batch)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_fn(
    fn: Callable,
    mesh: Mesh,
    num_batch_args: int = 1,
) -> Callable:
    """jit `fn` with its first `num_batch_args` args sharded over 'data' and
    outputs sharded over 'data'.

    For inference DP: fn(batch...) -> outputs, where every batch arg and every
    output has a leading batch dim divisible by mesh size. Params captured by
    closure are replicated automatically (jit default for captured constants).
    """
    data = batch_sharding(mesh)
    in_sh = tuple(data for _ in range(num_batch_args))
    return jax.jit(fn, in_shardings=in_sh, out_shardings=data)


def put_sharded(batch: Any, mesh: Mesh) -> Any:
    """device_put a host batch pytree sharded over the 'data' axis."""
    return jax.device_put(batch, batch_sharding(mesh))
