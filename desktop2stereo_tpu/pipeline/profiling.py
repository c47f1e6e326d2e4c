"""Tracing / profiling hooks.

The reference instruments per-stage wall clock latencies and FPS statistics
(reference main.py:70-77, 1081-1094) and has no deeper profiler.  Here the
same counters live in pipeline.metrics, and this module adds the TPU-native
layer: the JAX/XLA profiler (TensorBoard trace of every compiled program,
HBM transfers and host callbacks) plus named trace annotations around the
frame stages.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax


def start_trace(log_dir: Optional[str] = None) -> str:
    """Begin a JAX profiler trace (view with TensorBoard's profile plugin).
    Plays the role the reference's latency logs play, but at XLA-op depth."""
    log_dir = log_dir or os.environ.get("D2S_TRACE_DIR", "logs/trace")
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    return log_dir


def stop_trace() -> None:
    jax.profiler.stop_trace()


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[str]:
    d = start_trace(log_dir)
    try:
        yield d
    finally:
        stop_trace()


def annotate(name: str):
    """Named region that shows up in the profiler timeline; usable as a
    context manager around host-side stage code."""
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Profiler-annotated per-stage wall timing (the reference's
    thread_latencies dict, main.py:70-77).

    The EMA/history math lives in ONE place — metrics.StageLatency — and
    this wrapper only adds the TraceAnnotation so the region shows up in
    the profiler timeline; the sample records even when the block raises
    (try/finally), so a failing stage still shows its cost."""

    def __init__(self, alpha: float = 0.9):
        from desktop2stereo_tpu.pipeline.metrics import StageLatency

        self.alpha = alpha
        self._lat = StageLatency()

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            with annotate(f"d2s.{name}"):
                yield
        finally:
            self._lat.record(name, time.perf_counter() - t0,
                             ema_alpha=self.alpha)

    @property
    def latency(self) -> dict:
        return self._lat.snapshot()

    def snapshot(self) -> dict:
        return self._lat.snapshot()
