"""Profiling helpers: jax.profiler traces + throughput accounting.

The reference only has wall-clock timers (utils/timer.py, SURVEY.md §5);
here device traces (viewable in XProf/TensorBoard) and an images/sec/chip
counter — the north-star metric — are first-class.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture an XLA device trace: `with device_trace('/tmp/trace'): step()`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """images/sec/chip over a sliding window of steps."""

    def __init__(self, batch_size: int, n_chips: int = 1):
        self.batch_size = batch_size
        self.n_chips = max(n_chips, 1)
        self.reset()

    def reset(self):
        self._t0 = time.time()
        self._steps = 0

    def step(self, n: int = 1):
        self._steps += n

    @property
    def images_per_sec_per_chip(self) -> float:
        dt = time.time() - self._t0
        if dt <= 0 or self._steps == 0:
            return 0.0
        return self._steps * self.batch_size / dt / self.n_chips
