"""Per-stage wall-clock timers + solver iteration bookkeeping.

The reference only prints total elapsed (simulation.py:277,342); SURVEY.md
section 5.1 asks the new framework for per-stage timers (mesh / assembly /
solve / metrics) and iteration counts -- this is that subsystem.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Dict

__all__ = ["StageTimer"]


class StageTimer:
    def __init__(self):
        self.times: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextmanager
    def stage(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def record(self, name, seconds):
        self.times[name] = self.times.get(name, 0.0) + seconds

    def summary(self):
        return dict(sorted(self.times.items(), key=lambda kv: -kv[1]))

    def report(self, prefix=""):
        for name, t in self.summary().items():
            print(f"{prefix}{name}: {t:.3f}s")
