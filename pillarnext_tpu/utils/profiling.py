"""Tracing / profiling hooks (SURVEY.md §5 — absent in the reference).

- ``trace(logdir)``: jax.profiler trace context for TensorBoard/Perfetto.
- ``annotate(name)``: named trace scope (shows per-layer in the trace).
- ``StepTimer``: wall-clock step timing with a fetch fence — NOTE the axon
  remote-TPU tunnel does not synchronize on ``block_until_ready``; fetching
  a scalar from the result is the only honest fence (see bench.py).
- NaN guards: ``enable_nan_checks()`` flips jax_debug_nans (the runtime
  analogue of the reference's hand-written NaN guards in RegLoss,
  centerloss.py:56-57).
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope: ``with annotate('backbone'): ...`` inside traced code."""
    return jax.profiler.TraceAnnotation(name)


def enable_nan_checks(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)


class StepTimer:
    """Rolling step timer; call ``tick(result)`` once per step with any jax
    array from the step's output (it is fetched as the fence)."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times: list[float] = []
        self._last = None

    def tick(self, fence_array=None) -> float:
        if fence_array is not None:
            np.asarray(jax.numpy.ravel(fence_array)[:1])
        now = time.perf_counter()
        dt = 0.0 if self._last is None else now - self._last
        self._last = now
        if dt:
            self.times.append(dt)
            self.times = self.times[-self.window :]
        return dt

    @property
    def mean(self) -> float:
        return float(np.mean(self.times)) if self.times else 0.0
