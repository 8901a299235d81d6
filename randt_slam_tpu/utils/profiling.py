"""Structured stage timing + JAX profiler hooks.

The reference's tracing is ad-hoc (``TicToc`` stopwatches, accumulating
counters, stdout logs — SURVEY.md §5).  This module provides the structured
replacement: named wall-clock stages with device synchronization, an
accumulating registry, and optional JAX profiler trace capture.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class StageStats:
    count: int = 0
    total_s: float = 0.0
    min_s: float = float("inf")
    max_s: float = 0.0

    def add(self, dt: float):
        self.count += 1
        self.total_s += dt
        self.min_s = min(self.min_s, dt)
        self.max_s = max(self.max_s, dt)

    @property
    def mean_s(self) -> float:
        return self.total_s / max(self.count, 1)


class Profiler:
    """Accumulating stage timer (the structured ``TicToc``/``total_time_``
    replacement, cf. ``tictoc.h`` and ``local_fuser.h:164-165``)."""

    def __init__(self, sync: bool = True):
        self.stages: dict[str, StageStats] = defaultdict(StageStats)
        self.sync = sync

    @contextlib.contextmanager
    def stage(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync and sync_value is not None:
                import jax

                jax.block_until_ready(sync_value)
            self.stages[name].add(time.perf_counter() - t0)

    def report(self) -> dict:
        return {
            k: {
                "count": v.count,
                "total_s": round(v.total_s, 6),
                "mean_s": round(v.mean_s, 6),
                "min_s": round(v.min_s, 6),
                "max_s": round(v.max_s, 6),
            }
            for k, v in sorted(self.stages.items())
        }

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(self.report(), f, indent=2)


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a JAX profiler trace (tensorboard-compatible)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
