"""Profiling / tracing helpers (SURVEY.md §5 tracing plan).

The reference's only tracing is AverageMeter wall timers (core/function.py:104-161);
here: jax.profiler device traces + a step timer context.  Enable traces with
BUCTD_PROFILE_DIR=/path or trace_context(log_dir=...).
"""

from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def trace_context(log_dir: str | None = None):
    """Wrap a region in a jax.profiler trace when a log dir is configured."""
    import jax

    log_dir = log_dir or os.environ.get("BUCTD_PROFILE_DIR")
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def annotate(name: str):
    """Named sub-region inside a trace (shows up in the profiler timeline)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Wall-clock step timer with device fencing via a supplied fetch function."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, fence=None):
        if fence is not None:
            fence()  # e.g. lambda: float(loss) — forces device completion
        self.times.append(time.perf_counter() - self._t0)
        return self.times[-1]

    @property
    def mean(self):
        return sum(self.times) / len(self.times) if self.times else 0.0
