"""Profiler integration -- the reference's print-timers, upgraded to XProf.

The reference's only tracing is stdout wall-clock prints (SURVEY.md §5).
Here: ``trace(dir)`` captures a full device trace viewable in
TensorBoard/XProf (kernel timelines, HBM traffic, fusion boundaries), and
``annotate(name)`` scopes named regions so render phases (camera /
integrate / shade) show up as labeled spans.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: ``with trace('/tmp/trace'): render(...)``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span context for profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats():
    """Per-device live/peak HBM bytes (None entries where unsupported)."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
