"""Profiling utilities (SURVEY.md §5.1: the reference only has fvcore FLOPs +
wall-clock; we add first-class jax.profiler traces)."""

from __future__ import annotations

import contextlib
import os
import time
from typing import Optional


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/craft_tpu_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard / Perfetto."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        print(f"Profiler trace written to {log_dir}")


class StepTimer:
    """Wall-clock per-step timing with running mean (the reference's 'time'
    metric, train.py:218-241)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.count = 0
        self.total = 0.0
        self._t = None

    def tic(self):
        self._t = time.perf_counter()

    def toc(self) -> float:
        dt = time.perf_counter() - self._t
        self.count += 1
        if self.count > self.warmup:
            self.total += dt
        return dt

    @property
    def mean(self) -> float:
        n = max(self.count - self.warmup, 1)
        return self.total / n
