"""Profiling hooks (new capability — the reference has no tracing at all,
SURVEY.md §5): jax.profiler trace context + a simple steps/sec and
questions/sec meter."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir, enabled=True):
    """Capture a device trace viewable in TensorBoard/Perfetto."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """questions/sec (and steps/sec) meter — the north-star counters."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._steps = 0
        self._questions = 0

    def update(self, batch_size, steps=1):
        self._steps += steps
        self._questions += batch_size * steps

    @property
    def steps_per_sec(self):
        dt = time.perf_counter() - self._t0
        return self._steps / dt if dt > 0 else 0.0

    @property
    def questions_per_sec(self):
        dt = time.perf_counter() - self._t0
        return self._questions / dt if dt > 0 else 0.0
