"""Tracing / profiling (SURVEY.md §5: the reference has none — only ad-hoc
wall-clock prints; this is the superset).

- :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace;
- :func:`annotate` — named step/op annotations that show up in the trace;
- :class:`StepProfiler` — wall-clock per-step stats with optional periodic
  device sync (cheap step timing without tracing overhead).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace: ``with profiling.trace('/tmp/tb'): step()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region annotation (shows in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)


class StepProfiler:
    """Rolling step-time statistics with explicit sync points."""

    def __init__(self, sync_every: int = 10):
        self.sync_every = sync_every
        self.times: list[float] = []
        self._last = time.perf_counter()
        self._step = 0

    def step(self, result=None) -> Optional[float]:
        """Call once per training step; pass a device array to sync against
        every ``sync_every`` steps."""
        self._step += 1
        if self._step % self.sync_every:
            return None
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        dt = (now - self._last) / self.sync_every
        self._last = now
        self.times.append(dt)
        return dt

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "mean_step_s": float(arr.mean()),
            "p50_step_s": float(np.percentile(arr, 50)),
            "p95_step_s": float(np.percentile(arr, 95)),
            "steps_per_s": float(1.0 / arr.mean()),
        }
