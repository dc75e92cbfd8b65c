"""Profiling harness: wall-clock timers + jax.profiler traces.

The reference's only observability is coarse wall-clock timing (main.py:50-52,
63-66); on TPU, first-class profiling matters — `profile_trace` wraps
jax.profiler.trace for perfetto/XPlane dumps, and Timer does
block_until_ready-aware step timing for benchmarks.
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import jax


class Timer:
    """Collects step latencies (seconds); call with the step's output arrays
    so device work is included via block_until_ready."""

    def __init__(self):
        self.samples: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, *block_on):
        for x in block_on:
            jax.block_until_ready(x)
        self.samples.append(time.perf_counter() - self._t0)

    @contextlib.contextmanager
    def measure(self, *unused):
        self.start()
        out = []
        yield out
        self.stop(*out)

    def p50(self) -> float:
        s = sorted(self.samples)
        return s[len(s) // 2] if s else float("nan")

    def mean(self) -> float:
        return sum(self.samples) / len(self.samples) if self.samples else float("nan")

    def best(self) -> float:
        return min(self.samples) if self.samples else float("nan")


@contextlib.contextmanager
def profile_trace(logdir: str, enabled: bool = True):
    """jax.profiler trace context (view with xprof/tensorboard or perfetto)."""
    if not enabled:
        yield
        return
    with jax.profiler.trace(logdir):
        yield
