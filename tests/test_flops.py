"""Tests for core/flops.py — analytic FLOP counting under scan.

The whole point (VERDICT r4 weak #1): XLA cost_analysis counts a scanned
body once; these tests pin that count_flops multiplies by trip count, so
a 30-block scanned DiT reports 15x the flops of a 2-block one.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frameino_tpu.core.flops import FlopReport, count_flops


def test_plain_matmul():
    a = jnp.zeros((8, 16), jnp.float32)
    b = jnp.zeros((16, 32), jnp.float32)
    r = count_flops(lambda x, y: x @ y, a, b)
    assert r.flops == 2 * 8 * 16 * 32
    assert r.dot_flops == r.flops
    assert r.while_loops == 0


def test_batched_dot_general():
    a = jnp.zeros((4, 8, 16), jnp.float32)
    b = jnp.zeros((4, 16, 32), jnp.float32)
    r = count_flops(lambda x, y: jnp.einsum("bij,bjk->bik", x, y), a, b)
    assert r.flops == 2 * 4 * 8 * 16 * 32


def test_scan_multiplies_by_trip_count():
    a = jnp.zeros((8, 8), jnp.float32)

    def body(c, _):
        return c @ a, None

    def scanned(x, n):
        y, _ = jax.lax.scan(lambda c, _: body(c, _), x, None, length=n)
        return y

    r5 = count_flops(lambda x: scanned(x, 5), a)
    r10 = count_flops(lambda x: scanned(x, 10), a)
    one = 2 * 8 * 8 * 8
    assert r5.flops == 5 * one
    assert r10.flops == 10 * one


def test_jitted_fn_and_remat_recompute_counted():
    """grad of a remat'd matmul chain: the jaxpr contains fwd, the remat
    recompute, and bwd explicitly, and the counter sees inside both the
    pjit and the remat2 eqn. For grad-wrt-w of sum((x@w)@w): 2 fwd dots
    outside + 4 dots inside remat2 (1 recompute + dw2 + dh + dw1) =
    exactly 3x the forward."""
    w = jnp.zeros((16, 16), jnp.float32)
    x = jnp.zeros((4, 16), jnp.float32)

    @jax.checkpoint
    def f(w, x):
        return (x @ w) @ w

    loss = lambda w, x: jnp.sum(f(w, x))
    fwd = count_flops(f, w, x).flops
    grad_flops = count_flops(jax.jit(jax.grad(loss)), w, x).flops
    assert grad_flops == pytest.approx(3 * fwd, rel=0.01)


def test_conv_flops():
    x = jnp.zeros((1, 8, 10, 10), jnp.float32)   # NCHW
    k = jnp.zeros((16, 8, 3, 3), jnp.float32)    # OIHW
    r = count_flops(
        lambda a, b: jax.lax.conv_general_dilated(
            a, b, (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW")), x, k)
    assert r.conv_flops == 2 * (1 * 16 * 10 * 10) * 3 * 3 * 8
    assert r.flops == r.conv_flops


def test_cond_takes_max_branch():
    a = jnp.zeros((8, 8), jnp.float32)

    def f(x, p):
        return jax.lax.cond(p, lambda v: v @ v @ v, lambda v: v @ v, x)

    r = count_flops(f, a, True)
    assert r.flops == 2 * (2 * 8 * 8 * 8)


def test_while_counted_once_and_flagged():
    a = jnp.zeros((8, 8), jnp.float32)

    def f(x):
        return jax.lax.while_loop(
            lambda c: c[0, 0] < 10, lambda c: c @ a, x)

    r = count_flops(f, a)
    assert r.flops == 2 * 8 * 8 * 8
    assert r.while_loops == 1


def test_pallas_call_counts_grid_times_kernel():
    from jax.experimental import pallas as pl

    def kern(x_ref, y_ref, o_ref):
        o_ref[...] = x_ref[...] @ y_ref[...]

    f = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        grid=(2,),
        in_specs=[pl.BlockSpec((64, 128), lambda i: (i, 0)),
                  pl.BlockSpec((128, 128), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((64, 128), lambda i: (i, 0)),
        interpret=True)
    x = jnp.zeros((128, 128))
    r = count_flops(f, x, x)
    # 2 grid cells x (64x128 @ 128x128) = the full 128^3 matmul
    assert r.flops == 2 * (2 * 64 * 128 * 128)


def test_train_step_flops_scale_with_layers():
    """The actual r4 failure mode, in miniature: a scanned stack of L
    blocks must report flops linear in L with slope = one block."""
    D, S = 32, 64

    def make_step(L):
        def loss(params, x):
            def blk(h, w):
                return jnp.tanh(h @ w), None
            h, _ = jax.lax.scan(blk, x, params)
            return jnp.sum(h * h)
        return jax.grad(loss)

    x = jnp.zeros((S, D), jnp.float32)
    p2 = jnp.zeros((2, D, D), jnp.float32)
    p4 = jnp.zeros((4, D, D), jnp.float32)
    f2 = count_flops(make_step(2), p2, x).flops
    f4 = count_flops(make_step(4), p4, x).flops
    per_block = (f4 - f2) / 2
    # fwd + bwd(2x) of one S x D x D matmul
    assert per_block == pytest.approx(3 * 2 * S * D * D, rel=0.01)
    # and the L-multiplied structure means f4 ~= 2x f2 (no fixed cost
    # here beyond the final elementwise loss)
    assert f4 == pytest.approx(2 * f2, rel=0.01)
