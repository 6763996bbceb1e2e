"""Tracing / profiling hooks (SURVEY §5: absent in the reference).

Thin wrappers over jax.profiler so codec phases show up named in TensorBoard
/ Perfetto traces, plus a tiny wall-clock phase timer for host-side stats.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def annotate(label: str):
    """Name a region in device traces (no-op cost when not tracing)."""
    with jax.profiler.TraceAnnotation(label):
        yield


@contextlib.contextmanager
def trace_to(logdir: str):
    """Capture a device trace for the enclosed block into ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulating wall-clock timer: ``with timer('encode'): ...``."""

    def __init__(self) -> None:
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, phase: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[phase] = self.totals.get(phase, 0.0) + dt
            self.counts[phase] = self.counts.get(phase, 0) + 1

    def report(self) -> dict[str, dict[str, float]]:
        return {
            k: {"total_s": round(v, 4), "calls": self.counts[k]}
            for k, v in sorted(self.totals.items())
        }
