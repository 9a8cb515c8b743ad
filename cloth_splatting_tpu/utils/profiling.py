"""Profiling / debugging aids (SURVEY.md section 5 tracing row).

The reference times iterations with cuda events (train.py:111-146) and has no
tracing. Here: ``jax.profiler`` trace capture around arbitrary spans, named
step annotations, a per-step wall timer with EMA, and the JAX debugging
toggles (nan checking / leak checking) that replace
``torch.autograd.set_detect_anomaly`` / CUDA_LAUNCH_BLOCKING.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def step_annotation(name: str):
    """Named span that shows up in profiler traces."""
    return jax.profiler.StepTraceAnnotation(name)


def enable_debug_checks(nans: bool = True, leaks: bool = False) -> None:
    """JAX equivalents of the reference's anomaly detection (train.py:435)."""
    if nans:
        jax.config.update("jax_debug_nans", True)
    if leaks:
        jax.config.update("jax_check_tracer_leaks", True)


class StepTimer:
    """Wall-clock per-step timing with EMA (replaces cuda event pairs)."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg_ms: float | None = None
        self._t0: float | None = None

    def start(self) -> None:
        self._t0 = time.time()

    def stop(self) -> float:
        dt = (time.time() - self._t0) * 1000.0
        self.avg_ms = dt if self.avg_ms is None else \
            self.ema * self.avg_ms + (1 - self.ema) * dt
        return dt
