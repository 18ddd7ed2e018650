"""Machine-readable training observability.

The reference logs loss/lr to tensorboard/wandb via ``accelerator.log``
(reference ``train_code/train_wan_motion_FrameINO.py:1324-1326``). The
TPU-native counterpart appends one JSON object per logging step to
``<output_dir>/metrics.jsonl`` — greppable, plottable, and asserted by
the CLI smoke tests — and optionally mirrors to tensorboard when
``tensorboardX``/``tf.summary`` is importable (not required).

Also hosts the profiling hook: ``maybe_profile`` wraps a step range with
``jax.profiler`` trace capture when a trace dir is configured.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, output_dir: str, filename: str = "metrics.jsonl",
                 also_print: bool = True):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, filename)
        self.also_print = also_print
        self._f = open(self.path, "a", buffering=1)
        self._t0 = time.time()
        self._tb = self._try_tensorboard(output_dir)

    @staticmethod
    def _try_tensorboard(output_dir):
        try:
            from torch.utils.tensorboard import SummaryWriter
            return SummaryWriter(os.path.join(output_dir, "tb"))
        except Exception:
            return None

    def log(self, step: int, metrics: Dict[str, Any]):
        row = {"step": int(step),
               "time": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                row[k] = v
        self._f.write(json.dumps(row) + "\n")
        if self._tb is not None:
            for k, v in row.items():
                if k not in ("step", "time") and isinstance(v, float):
                    self._tb.add_scalar(k, v, int(step))
        if self.also_print:
            shown = " ".join(f"{k} {v:.4g}" if isinstance(v, float)
                             else f"{k} {v}" for k, v in row.items()
                             if k not in ("step", "time"))
            print(f"step {step} {shown} ({row['time']:.1f}s)")

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


@contextlib.contextmanager
def maybe_profile(trace_dir: Optional[str]):
    """jax.profiler trace capture when ``trace_dir`` is set (reference
    has no profiling at all — SURVEY §5)."""
    if not trace_dir:
        yield
        return
    import jax
    os.makedirs(trace_dir, exist_ok=True)
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
