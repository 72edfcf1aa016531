"""Tracing / profiling harness (SURVEY.md §5.1 — absent in the reference).

Two tools:
 * ``trace(logdir)``: context manager around ``jax.profiler`` — produces a
   TensorBoard-loadable trace of device execution (works on TPU and CPU).
 * ``Timer``: a ``block_until_ready`` wall-clock harness for steady-state
   throughput numbers (compile excluded by warmup), used by bench.py and ad
   hoc profiling.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax


@contextmanager
def trace(logdir: str = "/tmp/tpu2048-trace"):
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
        print(f"Profiler trace written to {logdir} (load with TensorBoard)")


class Timer:
    """Measure steady-state latency of a jitted callable.

    >>> t = Timer(lambda: f(x), warmup=2, repeats=5)
    >>> t.best_seconds, t.mean_seconds
    """

    def __init__(self, fn, warmup: int = 1, repeats: int = 5):
        for _ in range(warmup):
            jax.block_until_ready(fn())
        self.times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            self.times.append(time.perf_counter() - t0)

    @property
    def best_seconds(self) -> float:
        return min(self.times)

    @property
    def mean_seconds(self) -> float:
        return sum(self.times) / len(self.times)
