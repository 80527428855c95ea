"""Timing instrumentation.

The reference hand-times everything with wall clocks printed every 50 rows
-- per-phase splits for camera math / ray_cast / blackhole_hit plus
per-sample and total times (LimitedRelativisticRenderEngine.py:187-254).
Standalone equivalent: named accumulating timers with the same phase-split
reporting, plus device-synchronizing timing for honest JAX numbers (an
un-synced timer under async dispatch measures nothing -- single-shot
timings on this stack were off by 30x).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class PhaseTimers:
    """Accumulating per-phase wall-clock timers with reference-style dump."""

    def __init__(self):
        self.total = defaultdict(float)
        self.count = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync: bool = False):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync:
                jax.effects_barrier()
            self.total[name] += time.perf_counter() - t0
            self.count[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.total, key=self.total.get, reverse=True):
            t, n = self.total[name], self.count[name]
            lines.append(f"{name:24s} {t:8.3f}s total  {t / n * 1e3:8.2f}ms avg"
                         f"  x{n}")
        return "\n".join(lines)


def timed(fn, *args, sync=True, **kwargs):
    """(result, seconds) with block_until_ready -- honest device timing."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    if sync:
        out = jax.block_until_ready(out)
    return out, time.perf_counter() - t0


def benchmark(fn, *args, warmup: int = 1, repeat: int = 5, **kwargs):
    """Best-of-N timing after warmup; returns (result, best_seconds)."""
    out = None
    for _ in range(warmup):
        out = jax.block_until_ready(fn(*args, **kwargs))
    best = float("inf")
    for _ in range(repeat):
        out, dt = timed(fn, *args, **kwargs)
        best = min(best, dt)
    return out, best
