"""Profiling and step-timing observability.

Framework addition (the reference has no tracing in its main path —
SURVEY.md §5: only a cudaEvent timer in the standalone CUDA harness,
``seg_ops_cuda/seg_ops.cu:57-77``).  Wraps ``jax.profiler`` for device
traces and provides a lightweight host-side step timer with
edges/s / examples/s accounting.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler device trace (view with TensorBoard /
    xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span for host-side phases."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling step timing with throughput accounting.

    ``edges_per_step`` / ``examples_per_step`` are fixed per config; call
    ``tick()`` once per optimisation step after the result is ready.
    """

    def __init__(self, edges_per_step: int = 0, examples_per_step: int = 0,
                 window: int = 50):
        self.edges_per_step = edges_per_step
        self.examples_per_step = examples_per_step
        self.window = window
        self._times = []
        self._last = None

    def start(self):
        self._last = time.perf_counter()

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    @property
    def mean_step_s(self):
        return (sum(self._times) / len(self._times)) if self._times else 0.0

    def stats(self):
        s = self.mean_step_s
        return {
            "step_ms": s * 1e3,
            "edges_per_s": (self.edges_per_step / s) if s else 0.0,
            "examples_per_s": (self.examples_per_step / s) if s else 0.0,
        }
