"""Profiling / tracing helpers.

The reference has wall-clock timing only (SURVEY.md §5.1); here the TPU
build exposes jax.profiler trace capture for XProf/TensorBoard plus
dispatch-aware step timing.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Async-dispatch-aware step timing: blocks on the step's outputs
    before reading the clock, so times measure device work, not dispatch."""

    def __init__(self):
        self.times: list[float] = []
        self._t0: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def done(self, outputs) -> float:
        jax.block_until_ready(outputs)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    def __exit__(self, *exc):
        return False

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)


def annotate(name: str):
    """Named trace span (shows up in XProf timelines)."""
    return jax.profiler.TraceAnnotation(name)
