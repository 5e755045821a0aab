"""Profiling/observability (SURVEY.md §5: reference has only FPS prints;
rebuild uses jax.profiler + tensorboard-plugin-profile).

Usage:
    from tpucenterface.runtime.profiling import trace
    with trace("runs/profile"):            # view with tensorboard --logdir
        det.detect_batch(imgs)

    with annotate("decode"):               # named region in the trace
        ...
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (XLA/TPU timeline) into `logdir`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Lightweight host-side step timing with EMA (the reference's FPS-print
    equivalent, but structured)."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema_ms: Optional[float] = None
        self._t: Optional[float] = None

    def tic(self) -> None:
        self._t = time.perf_counter()

    def toc(self) -> float:
        dt = (time.perf_counter() - self._t) * 1e3
        self.ema_ms = dt if self.ema_ms is None else (
            self.alpha * dt + (1 - self.alpha) * self.ema_ms
        )
        return dt

    @property
    def fps(self) -> float:
        return 1000.0 / self.ema_ms if self.ema_ms else 0.0
