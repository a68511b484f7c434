"""Profiling and tracing helpers.

The reference has zero instrumentation (SURVEY.md §5). These wrap
``jax.profiler`` so any phase of the loop can be captured for TensorBoard /
Perfetto, plus a simple wall-clock scope for coarse step timings.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a device profile (open the result in TensorBoard/Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region that shows up in device traces."""
    with jax.profiler.TraceAnnotation(name):
        yield


class Stopwatch:
    """Accumulating wall-clock scopes: ``with sw("selfplay"): ...``."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {
            k: {"total_s": round(v, 4), "count": self.counts[k]}
            for k, v in self.totals.items()
        }
