"""Runtime: device mesh sharding, host->HBM prefetch, video streaming
(SURVEY.md §2 parallelism table, §5 distributed-comm backend, §3.4).

TPU-native replacements for the reference's runtime surface:
- reference `DataParallel` -> `jax.sharding.Mesh` + NamedSharding'd jit
  (GSPMD collectives over ICI; no NCCL-style process groups)
- reference per-frame synchronous OpenCV loop -> software-pipelined
  dispatch with double-buffered host->device transfer
"""

from tpucenterface.runtime.sharding import data_mesh, shard_batch_fn
from tpucenterface.runtime.prefetch import prefetch_to_device

__all__ = ["data_mesh", "shard_batch_fn", "prefetch_to_device"]
