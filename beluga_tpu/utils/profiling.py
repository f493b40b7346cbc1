"""Timing, metrics and profiling utilities (the beluga_benchmark analog).

The reference ships perf/timem-based offline profiling scripts and logs
per-update latency from the node (amcl_node.cpp:602-615,
beluga_benchmark/*).  Here:

  * :class:`LatencyRecorder` — per-update wall-clock stats (p50/p90/p99),
    the node-log equivalent;
  * :func:`time_compiled` — robust steady-state timing of a jitted callable
    (compile excluded, device-synchronized);
  * :func:`trace` — context manager around ``jax.profiler`` producing an
    xplane trace directory for tensorboard, the flamegraph equivalent.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax
import numpy as np


@dataclass
class LatencyRecorder:
    samples_s: list = field(default_factory=list)

    def record(self, seconds: float) -> None:
        self.samples_s.append(seconds)

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        yield
        self.record(time.perf_counter() - t0)

    def summary(self) -> dict:
        if not self.samples_s:
            return {"count": 0}
        arr = np.asarray(self.samples_s) * 1e3
        return {
            "count": len(arr),
            "mean_ms": float(arr.mean()),
            "p50_ms": float(np.percentile(arr, 50)),
            "p90_ms": float(np.percentile(arr, 90)),
            "p99_ms": float(np.percentile(arr, 99)),
            "max_ms": float(arr.max()),
        }


def time_compiled(fn, *args, iters: int = 20, warmup: int = 3) -> float:
    """Steady-state seconds/call of a jitted callable (first output blocked)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (xplane dump for tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
