"""Double-buffered host->HBM prefetch (SURVEY.md §5, BASELINE config #4).

`jax.device_put` is asynchronous: transfers for batch N+1 overlap device
compute of batch N as long as we enqueue ahead. This iterator keeps a small
queue of in-flight device batches — the TPU-native analogue of the
DataLoader-worker + pinned-memory + cudaMemcpyAsync pipeline the reference
relies on torch for.
"""

from __future__ import annotations

import collections
from typing import Any, Iterable, Iterator, Optional

import jax


def prefetch_to_device(
    iterator: Iterable[Any],
    size: int = 2,
    sharding: Optional[Any] = None,
) -> Iterator[Any]:
    """Yield device-resident pytrees, keeping `size` transfers in flight.

    Multi-host (after runtime.sharding.maybe_init_distributed): the
    iterator yields GLOBAL batches on every process (deterministic for a
    fixed seed); each process transfers only its own rows
    (process_local_batch_bounds) and the shards assemble into one global
    jax.Array over the given sharding — the standard per-host input
    feeding contract, now the training loop's default behavior.
    """
    queue: collections.deque = collections.deque()

    def _put(item):
        if sharding is not None:
            if jax.process_count() > 1:
                import numpy as np

                from tpucenterface.runtime.sharding import (
                    process_local_batch_bounds,
                )

                def put_leaf(x):
                    lo, hi = process_local_batch_bounds(x.shape[0])
                    return jax.make_array_from_process_local_data(
                        sharding, np.asarray(x)[lo:hi]
                    )

                return jax.tree.map(put_leaf, item)
            return jax.device_put(item, sharding)
        return jax.device_put(item)

    it = iter(iterator)
    for item in it:
        queue.append(_put(item))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
