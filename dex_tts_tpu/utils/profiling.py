"""Tracing & step-timing instrumentation.

The reference has no profiling at all (tqdm bars only — SURVEY §5). This
module adds the TPU-native equivalents:
  * `trace(dir)` — context manager around jax.profiler for XLA/TPU traces
    viewable in TensorBoard/Perfetto,
  * `StepTimer` — wall-clock + device-time step statistics with warmup
    skipping (compile steps excluded from the averages),
  * `annotate` — named TraceAnnotation spans that show up in traces.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulates per-step wall times, skipping warmup (compile) steps."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: list[float] = []
        self._seen = 0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(dt)
        return False

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")

    @property
    def total_steps(self) -> int:
        return self._seen

    def summary(self) -> str:
        if not self.times:
            return f"{self._seen} steps (all warmup)"
        return (
            f"{self._seen} steps | mean {self.mean * 1e3:.1f} ms"
            f" | min {min(self.times) * 1e3:.1f} ms"
            f" | max {max(self.times) * 1e3:.1f} ms"
        )
