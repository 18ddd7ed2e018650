"""Profiling & observability — first-class, unlike the reference.

The reference has no tracing/profiling (SURVEY §5: wall-clock prints and
tqdm only). Here: jax.profiler trace capture, per-step timers that
account for the async dispatch model (a value fetch is the only reliable
synchronization on tunneled TPU backends), and a tiny scalar-metrics
logger (JSONL + optional tensorboard via orbax-free summary writing).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with tensorboard/xprof."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force_sync(x) -> float:
    """Synchronize by fetching a scalar derived from ``x``; returns it.

    ``block_until_ready`` is a no-op on some remote platforms (observed
    on the tunneled v5e used for benchmarking), so timing code must pull
    a value through the transfer path.
    """
    leaf = jax.tree.leaves(x)[0]
    return float(leaf.ravel()[0])


class StepTimer:
    """Rolling per-step wall time with compile-step exclusion."""

    def __init__(self, skip_first: int = 1):
        self.skip_first = skip_first
        self.times = []
        self._t0: Optional[float] = None
        self._count = 0

    def start(self):
        self._t0 = time.time()

    def stop(self, sync_value=None) -> float:
        if sync_value is not None:
            force_sync(sync_value)
        dt = time.time() - self._t0
        self._count += 1
        if self._count > self.skip_first:
            self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0

    @property
    def best(self) -> float:
        return min(self.times) if self.times else 0.0


class MetricsLogger:
    """JSONL scalar logger (host side), the accelerator.log analogue."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path

    def log(self, step: int, metrics: Dict[str, Any]):
        rec = {"step": int(step)}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = str(v)
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")


def mfu(flops_per_step: float, step_seconds: float,
        peak_tflops: float = 197.0, n_chips: int = 1) -> float:
    """Model FLOPs utilization against bf16 peak."""
    return flops_per_step / step_seconds / (peak_tflops * 1e12 * n_chips)
