"""Trace-time precision scope for memory-bound frozen-model passes.

The serving default keeps conv accumulation and norm materialization in
fp32 (bit-stable decode). The trainer's frozen-VAE *encodes* run under
``accum_dtype_scope(jnp.bfloat16)`` — reference parity: the whole encode
runs inside the torch bf16 autocast context
(``train_code/train_wan_motion_FrameINO.py:507-657``) — which halves the
near-full-res encoder activation temps. Measured on a 16 GB v5e chip this
is the difference between a 20.3 GB OOM and a fitting train-step program
(``scripts/bench_train.py``).

The scope takes effect at TRACE time: wrap the call that traces the
jitted program, or use it inside the traced function body.
"""

from __future__ import annotations

import jax.numpy as jnp

_DEFAULT_ACCUM_DTYPE = jnp.float32


def default_accum_dtype():
    return _DEFAULT_ACCUM_DTYPE


def low_precision_scope_active() -> bool:
    return _DEFAULT_ACCUM_DTYPE != jnp.float32


class accum_dtype_scope:
    """Context manager scoping the default accumulation/materialization
    dtype for convs (``ops/conv.py``) and VAE norms (``ops/norms.py``)."""

    def __init__(self, dtype):
        self.dtype = dtype

    def __enter__(self):
        global _DEFAULT_ACCUM_DTYPE
        self._prev = _DEFAULT_ACCUM_DTYPE
        _DEFAULT_ACCUM_DTYPE = self.dtype
        return self

    def __exit__(self, *exc):
        global _DEFAULT_ACCUM_DTYPE
        _DEFAULT_ACCUM_DTYPE = self._prev
        return False
