"""Profiling/tracing as a first-class module.

The reference has no profiling at all (SURVEY §5: DeepSpeed
wall_clock_breakdown present-but-disabled, progress bars only). This module
gives the framework:

- ``trace(dir)``: context manager around ``jax.profiler`` (Perfetto/XPlane
  traces viewable in TensorBoard or ui.perfetto.dev);
- ``annotate(name)``: TraceAnnotation for labeling pipeline stages;
- ``timed(fn)``: block-until-ready wall-clock timing helper that is honest
  about JAX async dispatch (times value materialization, not dispatch);
- ``step_timer()``: rolling throughput meter for train loops.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


def timed(fn: Callable, *args, iters: int = 1, warmup: int = 1, **kwargs):
    """Wall-clock a jitted function; returns (result, seconds_per_iter).

    Forces value materialization each iteration (block_until_ready alone can
    be unreliable over remote-execution tunnels)."""
    import numpy as np

    result = None
    for _ in range(warmup):
        result = fn(*args, **kwargs)
        jax.tree.map(lambda x: np.asarray(x), result)
    t0 = time.perf_counter()
    for _ in range(iters):
        result = fn(*args, **kwargs)
        jax.tree.map(lambda x: np.asarray(x), result)
    return result, (time.perf_counter() - t0) / iters


class StepTimer:
    """Rolling samples/sec + step-time meter for training loops."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now
        return dt

    @property
    def mean_step_time(self) -> Optional[float]:
        return sum(self._times) / len(self._times) if self._times else None

    def throughput(self, batch_size: int) -> Optional[float]:
        st = self.mean_step_time
        return batch_size / st if st else None
