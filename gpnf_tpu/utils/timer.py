"""Wall-clock timers for training telemetry.

Reference: utils/timer.py (Timer 34-51 rolling-average iteration time,
TickTock 54-78 data-loading time, ScopeTimer 20-31).
"""
from __future__ import annotations

import time
from collections import deque


class ScopeTimer:
    def __init__(self, label: str = "", print_fn=print):
        self.label = label
        self.print_fn = print_fn

    def __enter__(self):
        self.start = time.time()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.time() - self.start
        if self.label:
            self.print_fn(f"{self.label}: {self.elapsed:.4f}s")
        return False


class Timer:
    """Rolling-average iteration timer."""

    def __init__(self, window: int = 200):
        self.times = deque(maxlen=window)
        self._t0 = None

    def tick(self):
        self._t0 = time.time()

    def tock(self) -> float:
        assert self._t0 is not None
        dt = time.time() - self._t0
        self.times.append(dt)
        self._t0 = None
        return dt

    def get_average_and_reset(self) -> float:
        if not self.times:
            return -1.0
        avg = sum(self.times) / len(self.times)
        self.times.clear()
        return avg

    def get_last_iteration(self) -> float:
        return self.times[-1] if self.times else 0.0


class TickTock(Timer):
    """Alias with the reference's tick/tock naming for data-load timing."""
