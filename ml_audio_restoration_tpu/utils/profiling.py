"""Tracing / profiling utilities.

The reference has no profiling beyond wall-clock epoch prints
(/root/reference/src/training/trainer.py:476,501-506). This module provides
the TPU-native story:

- trace(): context manager around jax.profiler (xplane dumps viewable in
  TensorBoard / xprof)
- annotate(): named TraceAnnotation regions inside a step
- StepTimer: rolling wall-time stats with honest device sync (this
  environment's block_until_ready can return early — sync via checksum)
"""
from __future__ import annotations

import contextlib
import time
from collections import deque
from pathlib import Path


@contextlib.contextmanager
def trace(log_dir: str = "profiles"):
    """Capture a jax.profiler trace (xplane) for everything in the block."""
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for profiler timelines."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def sync(x):
    """Force execution of a jax array and return it (checksum readback —
    see bench.py for why block_until_ready is insufficient here)."""
    import jax.numpy as jnp

    float(jnp.sum(x))
    return x


class StepTimer:
    """Rolling step-time statistics (window of `keep` steps)."""

    def __init__(self, keep: int = 100):
        self.times = deque(maxlen=keep)
        self._start = None

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._start)
        return False

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    @property
    def last(self) -> float:
        return self.times[-1] if self.times else 0.0

    def summary(self) -> dict:
        if not self.times:
            return {"mean_s": 0.0, "min_s": 0.0, "max_s": 0.0, "steps": 0}
        return {
            "mean_s": self.mean,
            "min_s": min(self.times),
            "max_s": max(self.times),
            "steps": len(self.times),
        }
