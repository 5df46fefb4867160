"""Profiling / tracing helpers.

TPU counterpart of the reference's wall-clock-only instrumentation
(SURVEY.md §5): jax.profiler traces replace torch.cuda timing, and
device_memory_profile replaces torch.cuda.max_memory_allocated.
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax profiler trace (view with tensorboard or xprof)."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a captured trace."""
    with jax.profiler.TraceAnnotation(name):
        yield


def device_memory_stats(device=None) -> Dict[str, int]:
    """Per-device memory stats in bytes (empty dict on backends without
    memory_stats support, e.g. CPU)."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}


class StepTimer:
    """Rolling step timer with block_until_ready bracketing for honest
    device timings (the TPU analogue of cuda.synchronize bracketing in the
    reference eval, pointnerf_evaluation.py:215-234)."""

    def __init__(self, burn_in: int = 3):
        self.burn_in = burn_in
        self._times = []
        self._count = 0

    @contextlib.contextmanager
    def measure(self, result=None) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - t0
        self._count += 1
        if self._count > self.burn_in:
            self._times.append(dt)

    @property
    def mean(self) -> Optional[float]:
        return sum(self._times) / len(self._times) if self._times else None
