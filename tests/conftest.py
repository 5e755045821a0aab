"""Test env: force CPU backend with 8 fake devices (SURVEY.md §4 item 4).

Multi-chip DP sharding paths are tested on one host via
`--xla_force_host_platform_device_count=8`; real-TPU perf is bench.py's job.

IMPORTANT: this container's sitecustomize registers the axon TPU PJRT plugin
and calls `jax.config.update("jax_platforms", "axon,cpu")`, which OVERRIDES
the JAX_PLATFORMS env var. The only way to get a CPU backend is to update the
config again after importing jax — before any backend initialization.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402  (must come after XLA_FLAGS is set)

jax.config.update("jax_platforms", "cpu")
