"""Profiling hooks — the observability upgrade over the reference's
frames/sec counters (SURVEY.md §5.1: the reference has no tracer).

``trace(logdir)`` wraps a code block in the JAX profiler (view with
TensorBoard or xprof); ``annotate(name)`` adds named regions to the trace;
``StepTimer`` gives wall-clock per-step stats with correct device syncing.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region: ``with annotate("beam_search"): ...``"""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Per-step wall-clock stats; call ``stop`` with a device array to sync."""

    def __init__(self):
        self.times = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> dict:
        if not self.times:
            return {}
        ts = sorted(self.times)
        n = len(ts)
        return {
            "steps": n,
            "mean_s": sum(ts) / n,
            "p50_s": ts[n // 2],
            "p90_s": ts[int(n * 0.9)],
            "max_s": ts[-1],
        }
