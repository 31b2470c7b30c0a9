"""Tracing and throughput profiling.

The reference's only instrumentation is one wall-clock around the whole run
(``m_training.py:98,476-477``). Here: JAX profiler traces (viewable in
TensorBoard/Perfetto), per-step timing with warmup discard, and the
domain throughput metric (transcribed audio seconds per wall second).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with trace('/tmp/trace'): step()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepTimer:
    """Accumulates step wall times; discards warmup (compile) steps."""

    warmup: int = 2
    times: list = field(default_factory=list)
    _seen: int = 0
    _t0: float = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(dt)

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0

    def steps_per_sec(self) -> float:
        return 1.0 / self.mean if self.mean else 0.0

    def audio_sec_per_sec(self, windows_per_step: int,
                          sec_per_window: float) -> float:
        """Domain throughput: transcribed audio-sec per wall-sec."""
        return (windows_per_step * sec_per_window * self.steps_per_sec())


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
