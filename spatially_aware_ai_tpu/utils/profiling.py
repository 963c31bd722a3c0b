"""Profiling/observability helpers.

The reference's only instrumentation is wall-clock prints around endpoints
(SURVEY.md §5.1). Here:
- PhaseTimer: named phase accumulation the pipeline/manager report in their
  results (frames/sec, scan->queryable latency are first-class outputs)
- trace_to: context manager around jax.profiler for TensorBoard-viewable
  device traces of the fusion hot loop
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict


class PhaseTimer:
    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {
            name: {
                "total_s": round(total, 4),
                "count": self.counts[name],
                "mean_s": round(total / self.counts[name], 4),
            }
            for name, total in self.totals.items()
        }


@contextlib.contextmanager
def trace_to(logdir: str):
    """Device trace of the enclosed block (view with TensorBoard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
