"""Data-parallel sharding over a device mesh (SURVEY.md §2 DP row, config #5).

The only parallelism that is meaningful for this ~1-2M-param CNN detector is
data parallelism (TP/PP/SP/EP documented N/A in SURVEY.md §2): params are
replicated, the batch splits over a 1-D 'data' mesh axis, and inference needs
NO collectives on the hot path (pure sharding; XLA runs each shard locally).
Training grad/BN reductions are inserted by GSPMD (see train.step).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D 'data' mesh over the first n devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("data",))


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
