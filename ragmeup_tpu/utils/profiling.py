"""Tracing / profiling hooks (SURVEY.md §5.1 — the reference has none).

``StageTimer`` collects per-stage wall times (the pipeline already reports
them per request in ``timings``); ``trace_stage`` wraps a stage in a
``jax.profiler.TraceAnnotation`` so device traces segment by pipeline stage
when captured with ``jax.profiler.start_trace``."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


class StageTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": self.totals[k], "count": self.counts[k],
                    "mean_ms": 1e3 * self.totals[k] / max(self.counts[k], 1)}
                for k in self.totals}


@contextlib.contextmanager
def trace_stage(name: str):
    """jax.profiler annotation + wall time in one context manager."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        t0 = time.perf_counter()
        yield
        _ = time.perf_counter() - t0
