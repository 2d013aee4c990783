"""Profiling / tracing hooks (SURVEY §5: the reference has none — only
wall-clock prints; the TPU build makes tracing first-class).

* `trace(logdir)` — context manager around `jax.profiler.trace`, producing a
  TensorBoard-loadable trace of device execution (works on TPU and CPU).
* `annotate(name)` — `jax.profiler.TraceAnnotation` wrapper for host-side
  phases (data prep, rewards) so they show up in the same timeline.
* `step_metrics(fn)` — lightweight per-step wall-clock metering used by the
  trainers when no full trace is wanted.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """Capture a device trace into `logdir` (no-op when logdir is None)."""
    if not logdir:
        yield
        return
    with jax.profiler.trace(logdir):
        yield


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepClock:
    """Rolling per-step timing: mean/p50/p90 over a window."""

    def __init__(self, window: int = 50):
        self.window = window
        self.samples: list[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.samples.append(dt)
        if len(self.samples) > self.window:
            self.samples.pop(0)
        return False

    def stats(self) -> dict:
        if not self.samples:
            return {}
        s = sorted(self.samples)
        n = len(s)
        return {"step_time_mean": sum(s) / n,
                "step_time_p50": s[n // 2],
                "step_time_p90": s[min(n - 1, int(0.9 * n))]}
