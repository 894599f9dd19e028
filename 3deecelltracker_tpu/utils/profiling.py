"""Structured timing + profiling.

Replaces the reference's print-based ``timer`` decorator
(``tracker.py:51-62``) with a stage timer that aggregates wall time per
pipeline stage and can wrap ``jax.profiler`` traces.
"""

from __future__ import annotations

import contextlib
import functools
import time
from collections import defaultdict
from typing import Dict, Optional


def timer(fn):
    """Decorator printing wall time per call (tracker.py:51-62 parity)."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        print(f"[{fn.__name__}] {time.perf_counter() - t0:.3f}s")
        return out
    return wrapped


class StageTimer:
    """Accumulate wall time per named stage; report a summary table."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = ["stage                          total_s   calls   per_call"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            tot, n = self.totals[name], self.counts[name]
            lines.append(f"{name:<30} {tot:8.3f} {n:7d} {tot / n:10.4f}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None):
    """jax.profiler trace scope (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield
