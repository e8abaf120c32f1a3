"""Wall-clock timing scopes (reference viso/timer.hh:9-34) plus a stage
profiler that aggregates per-stage totals for the bench harness."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StartTimer:
    """Prints "<name>: X s" on end(), like the reference StartTimer."""

    def __init__(self, name: str, verbose: bool = True):
        self.name = name
        self.verbose = verbose
        self.t0 = time.perf_counter()
        self._elapsed = None

    def end(self):
        self._elapsed = time.perf_counter() - self.t0
        if self.verbose:
            print(f"{self.name}: {self._elapsed} s")
        return self._elapsed

    def seconds(self) -> float:
        if self._elapsed is None:
            return time.perf_counter() - self.t0
        return self._elapsed


class StageProfiler:
    """Accumulates wall time per named stage."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> dict:
        return {k: {"total_s": v, "mean_s": v / max(self.counts[k], 1)}
                for k, v in sorted(self.totals.items())}
