"""Step-time / throughput meters + profiler capture helper.

The reference has NO profiling or timing instrumentation anywhere (SURVEY.md
section 5); these meters and the ``jax.profiler`` trace hook fill that gap and
feed the videos/sec benchmark numbers.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import numpy as np


class StepTimer:
    """Tracks wall-clock per step with percentile summaries."""

    def __init__(self) -> None:
        self.times: list[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        assert self._t0 is not None
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        self._t0 = None
        return dt

    @contextlib.contextmanager
    def measure(self) -> Iterator[None]:
        self.start()
        try:
            yield
        finally:
            self.stop()

    def p50(self) -> float:
        return float(np.median(self.times)) if self.times else float("nan")

    def p90(self) -> float:
        return float(np.percentile(self.times, 90)) if self.times else float("nan")

    def mean(self) -> float:
        return float(np.mean(self.times)) if self.times else float("nan")

    def summary(self) -> dict:
        return {"p50_sec": self.p50(), "p90_sec": self.p90(), "mean_sec": self.mean(), "n": len(self.times)}


@contextlib.contextmanager
def profile_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
