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

import contextvars

import jax.numpy as jnp

# A ContextVar (not a module global) so that concurrently-traced programs
# cannot leak scopes into each other: each thread starts from a fresh
# context, so a warmup trace racing a request trace in the threaded server
# each sees its own scope (or the fp32 default), never the other's.
_ACCUM_DTYPE: contextvars.ContextVar = contextvars.ContextVar(
    "frameino_accum_dtype", default=jnp.float32
)


def default_accum_dtype():
    return _ACCUM_DTYPE.get()


def low_precision_scope_active() -> bool:
    return _ACCUM_DTYPE.get() != jnp.float32


class accum_dtype_scope:
    """Context manager scoping the default accumulation/materialization
    dtype for convs (``ops/conv.py``) and VAE norms (``ops/norms.py``).

    Scoping is per-``contextvars`` context (hence per-thread): entering the
    scope on one thread is invisible to traces running on any other thread.
    """

    def __init__(self, dtype):
        self.dtype = dtype

    def __enter__(self):
        self._token = _ACCUM_DTYPE.set(self.dtype)
        return self

    def __exit__(self, *exc):
        _ACCUM_DTYPE.reset(self._token)
        return False
