"""Profiling helpers.

The reference has no tracer — only ad-hoc wall-clock columns
(PolicyExecTime/..., vectorized_sampler.py:47-105), which `Logger.timed`
reproduces. This adds the TPU-native tier: a context manager around
``jax.profiler`` for device traces (viewable in TensorBoard/XProf) and a
phase-timer registry for cheap always-on timings.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a device trace: ``with device_trace('tb/run1'): step()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimers:
    """Accumulating named wall-clock timers; ``summary()`` -> {name: seconds}."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict[str, float]:
        return dict(self.totals)

    def means(self) -> dict[str, float]:
        return {k: self.totals[k] / max(self.counts[k], 1) for k in self.totals}

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()
