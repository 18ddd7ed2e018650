"""Tests for ops/precision.accum_dtype_scope.

The scope controls conv accumulation / norm materialization dtype at
TRACE time (used by the trainer's frozen-VAE encodes, ref
``train_code/train_wan_motion_FrameINO.py:507-657`` autocast context).
Because tracing can happen concurrently (the threaded server warms one
bucket while a request traces another), the scope must be per-context:
a scope entered on one thread must be invisible to every other thread.
"""

import threading

import jax
import jax.numpy as jnp

from frameino_tpu.ops.precision import (
    accum_dtype_scope,
    default_accum_dtype,
    low_precision_scope_active,
)


def test_scope_basic_and_nesting():
    assert default_accum_dtype() == jnp.float32
    assert not low_precision_scope_active()
    with accum_dtype_scope(jnp.bfloat16):
        assert default_accum_dtype() == jnp.bfloat16
        assert low_precision_scope_active()
        with accum_dtype_scope(jnp.float32):
            assert default_accum_dtype() == jnp.float32
            assert not low_precision_scope_active()
        assert default_accum_dtype() == jnp.bfloat16
    assert default_accum_dtype() == jnp.float32


def test_scope_does_not_leak_across_threads():
    """A bf16 scope held open on thread A must not be observable from
    thread B — the exact server race VERDICT r4 flagged (a warmup trace
    racing a request trace inheriting bf16 conv accumulation)."""
    in_scope = threading.Event()
    release = threading.Event()
    seen_on_b = []
    seen_on_a = []

    def thread_a():
        with accum_dtype_scope(jnp.bfloat16):
            seen_on_a.append(default_accum_dtype())
            in_scope.set()
            release.wait(timeout=30)

    def thread_b():
        in_scope.wait(timeout=30)
        seen_on_b.append(default_accum_dtype())
        release.set()

    ta = threading.Thread(target=thread_a)
    tb = threading.Thread(target=thread_b)
    ta.start()
    tb.start()
    ta.join(timeout=60)
    tb.join(timeout=60)

    assert seen_on_a == [jnp.bfloat16]
    assert seen_on_b == [jnp.float32]
    assert default_accum_dtype() == jnp.float32


def test_scope_isolated_traces_get_their_own_dtype():
    """Two concurrent *traces* — one under bf16 scope, one not — each see
    their own accumulation dtype via conv3d's default_accum_dtype()."""
    from frameino_tpu.ops import conv as cops

    x = jnp.ones((1, 4, 4, 4, 8), jnp.bfloat16)
    w = jnp.ones((1, 1, 1, 8, 8), jnp.bfloat16)
    b = jnp.zeros((8,), jnp.bfloat16)

    results = {}
    in_scope = threading.Event()
    probed = threading.Event()

    def scoped_trace():
        with accum_dtype_scope(jnp.bfloat16):
            in_scope.set()
            probed.wait(timeout=30)
            y = jax.eval_shape(lambda a: cops.causal_conv3d(a, w, b), x)
            results["scoped"] = default_accum_dtype()
            results["scoped_out"] = y.dtype

    def plain_trace():
        in_scope.wait(timeout=30)
        results["plain"] = default_accum_dtype()
        probed.set()

    t1 = threading.Thread(target=scoped_trace)
    t2 = threading.Thread(target=plain_trace)
    t1.start()
    t2.start()
    t1.join(timeout=60)
    t2.join(timeout=60)

    assert results["scoped"] == jnp.bfloat16
    assert results["plain"] == jnp.float32
