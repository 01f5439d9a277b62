"""Profiling hooks (SURVEY.md §5.1 — absent in the reference).

`profile_trace` wraps jax.profiler for TensorBoard traces; `StepTimer` gives
cheap wall-clock step timing with warmup-aware summaries.
"""

from __future__ import annotations

import contextlib
import time
from typing import List


@contextlib.contextmanager
def profile_trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: List[float] = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    @property
    def steady(self) -> List[float]:
        return self.times[self.warmup:] if len(self.times) > self.warmup \
            else self.times

    def mean(self) -> float:
        s = self.steady
        return sum(s) / max(len(s), 1)
