"""Profiling & tracing hooks — a first-class subsystem here, absent in the
reference (SURVEY.md §5: "Tracing / profiling: none").

- ``trace(logdir)``: context manager around ``jax.profiler`` emitting a
  TensorBoard-compatible trace of XLA execution.
- ``StepTimer``: millisecond-resolution step timing with warmup discard and
  percentile summary (used by bench.py and the Trainer).
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: List[float] = []
        self._count = 0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self._times.append(dt)

    def summary(self):
        if not self._times:
            return {}
        arr = np.asarray(self._times)
        return {
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "min_s": float(arr.min()),
            "steps": len(arr),
        }
