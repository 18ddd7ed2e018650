#!/usr/bin/env python
"""D=64 (CogVideoX) flash-attention experiments on one TPU chip.

VERDICT r4 weak #3: the Cog protocol step spends 64% of device time in
flash attention whose QK^T runs ~63 TFLOP/s — vs ~97 for the D=128 Wan
kernel — because head_dim=64 fills only half the MXU's 128-deep
contraction. Three experiments:

1. ``sweep``  — block-size sweep at the EXACT protocol shape
   (B=2, H=48, D=64, S=15,906 joint tokens) to confirm the shipped
   (512, 1024) blocks sit at the measured optimum.
2. ``packed`` — head-pair packing: two heads per grid cell, QK^T and PV
   expressed as single 128-deep contractions against BLOCK-DIAGONAL
   K/V tiles. Theory says this cannot win: a 2-head block-diagonal
   matmul is 50% dense, so a full-rate packed dot does 2x the flops of
   the useful work = 50% effective utilization, BELOW the ~65% the
   direct D=64 dot already achieves (the MXU pipelines K=64 better
   than naive half-fill). Measured here to make the negative concrete.
3. ``int8rate`` — raw dot_general microbench: bf16 vs int8 MXU rate at
   K=64/128 contractions. Sizes the prize of an int8-logits attention
   (v5e: 394 int8 TOP/s vs 197 bf16 TFLOP/s).

Usage: python scripts/bench_attn_d64.py [--exp sweep,packed,int8rate]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from frameino_tpu.ops.attention import _flash_fwd, _NEG_INF

# CogVideoX-5B FrameIn protocol joint sequence: 226 text + 14 latent
# frames x 28x40 patches @448x640
B, H, D = 2, 48, 64
S = 226 + 14 * 28 * 40


def timed(fn, *args, iters=8, calls=3):
    @jax.jit
    def many(*a):
        def body(c, _):
            o = fn(c, *a[1:])
            return c + o * jnp.bfloat16(1e-3), None
        out, _ = jax.lax.scan(body, a[0], None, length=iters)
        return out.ravel()[0]

    t0 = time.time()
    float(many(*args))
    compile_s = time.time() - t0
    times = []
    for _ in range(calls):
        t0 = time.time()
        float(many(*args))
        times.append(time.time() - t0)
    return min(times) / iters, compile_s


def attn_args(key=0, dtype=jnp.bfloat16):
    ks = jax.random.split(jax.random.key(key), 3)
    q = jax.random.normal(ks[0], (B, H, S, D), dtype)
    k = jax.random.normal(ks[1], (B, H, S, D), dtype)
    v = jax.random.normal(ks[2], (B, H, S, D), dtype)
    return q, k, v


def exp_sweep():
    q, k, v = attn_args()
    fl = 4 * B * H * S * S * D
    print(f"# sweep: B={B} H={H} D={D} S={S}", file=sys.stderr)
    for bq, bk in [(256, 1024), (512, 512), (512, 1024), (512, 2048),
                   (768, 1024), (1024, 1024), (1024, 2048), (512, 1408)]:
        try:
            t, c = timed(lambda a, b_, c_: _flash_fwd(
                a, b_, c_, scale=D ** -0.5, block_q=bq, block_k=bk),
                q, k, v)
        except Exception as e:
            print(f"bq={bq:5d} bk={bk:5d} FAIL {str(e)[:80]}")
            continue
        print(f"bq={bq:5d} bk={bk:5d} {t * 1e3:7.2f} ms "
              f"{fl / t / 1e12:6.1f} TFLOP/s (compile {c:.0f}s)")


# ---------------------------------------------------------------------------
# Experiment 2: head-pair-packed block-diagonal kernel
# ---------------------------------------------------------------------------

def _packed_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                   block_k: int, kv_len: int, masked: bool):
    """One (batch*headpair, q_block) cell. q_ref [1, bq, 128] carries
    TWO heads' queries side by side on lanes; k_ref/v_ref [1, bk, 128]
    carry the pair's keys/values. QK^T runs as ONE 128-deep contraction
    against a block-diagonal [128, 2bk] K tile (lanes 0-63 -> left bk
    columns for head A, lanes 64-127 -> right bk for head B); PV as one
    [bq, 2bk] x [2bk, 128] against block-diagonal V. Both dots are
    exactly 50% dense — the zeros ARE the experiment."""
    k_idx = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q2 = q_ref[0]                        # [bq, 128]  (= [qA | qB])
    kt = k_ref[0]                        # [bk, 128]  (= [kA | kB])
    bk = kt.shape[0]
    zero = jnp.zeros((64, bk), kt.dtype)
    # block-diagonal K^T: [128, 2bk]
    k_bd = jnp.concatenate([
        jnp.concatenate([kt[:, :64].T, zero], axis=1),
        jnp.concatenate([zero, kt[:, 64:].T], axis=1)], axis=0)
    s = jax.lax.dot_general(q2, k_bd, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [bq,2bk]

    if masked:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) % bk \
            + k_idx * bk
        s = jnp.where(col < kv_len, s, _NEG_INF)

    # two independent online softmaxes, kept lane-packed as [bq, 2]
    sa, sb = s[:, :bk], s[:, bk:]
    m_prev = m_ref[...]                  # [bq, 2]
    m_cur = jnp.concatenate([jnp.max(sa, -1, keepdims=True),
                             jnp.max(sb, -1, keepdims=True)], axis=1)
    m_next = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_next)    # [bq, 2]
    pa = jnp.exp2(sa - m_next[:, :1])
    pb = jnp.exp2(sb - m_next[:, 1:])
    l_ref[...] = alpha * l_ref[...] + jnp.concatenate(
        [jnp.sum(pa, -1, keepdims=True), jnp.sum(pb, -1, keepdims=True)], 1)
    m_ref[...] = m_next

    p2 = jnp.concatenate([pa, pb], axis=1).astype(v_ref.dtype)  # [bq,2bk]
    vt = v_ref[0]                        # [bk, 128] (= [vA | vB])
    zero_v = jnp.zeros((bk, 64), vt.dtype)
    v_bd = jnp.concatenate([
        jnp.concatenate([vt[:, :64], zero_v], axis=1),
        jnp.concatenate([zero_v, vt[:, 64:]], axis=1)], axis=0)  # [2bk,128]
    pv = jax.lax.dot_general(p2, v_bd, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [bq,128]
    gamma = jnp.concatenate([
        jnp.repeat(alpha[:, :1], 64, axis=1),
        jnp.repeat(alpha[:, 1:], 64, axis=1)], axis=1)
    acc_ref[...] = gamma * acc_ref[...] + pv

    @pl.when(k_idx == num_k - 1)
    def _finish():
        linv = jnp.concatenate([
            jnp.repeat(1.0 / l_ref[:, :1], 64, axis=1),
            jnp.repeat(1.0 / l_ref[:, 1:], 64, axis=1)], axis=1)
        o_ref[0] = (acc_ref[...] * linv).astype(o_ref.dtype)


def packed_flash(q, k, v, *, block_q=512, block_k=1024):
    """[B_, H_, S_, 64] -> packed [B_*H_/2, S_, 128] layout -> kernel."""
    B_, H_, S_, _ = q.shape
    scale = D ** -0.5
    LOG2E = 1.4426950408889634
    q = q * jnp.asarray(scale * LOG2E, q.dtype)
    sp = (S_ + block_q - 1) // block_q * block_q
    skp = (S_ + block_k - 1) // block_k * block_k
    pad_q, pad_k = sp - S_, skp - S_

    def pack(x, pad):
        # [B, H, S, 64] -> [B*H/2, S, 128]: head pairs side by side
        Bq, Hq, Sq, Dq = x.shape
        x = x.reshape(Bq, Hq // 2, 2, Sq, Dq).transpose(0, 1, 3, 2, 4)
        x = x.reshape(Bq * Hq // 2, Sq, 2 * Dq)
        return jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x

    qp, kp, vp = pack(q, pad_q), pack(k, pad_k), pack(v, pad_k)
    bh = qp.shape[0]
    grid = (bh, sp // block_q, skp // block_k)
    out = pl.pallas_call(
        functools.partial(_packed_kernel, block_k=block_k, kv_len=S_,
                          masked=skp != S_),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, 128), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, 128), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 2), jnp.float32),
            pltpu.VMEM((block_q, 2), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((bh, sp, 128), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qp, kp, vp)
    out = out[:, :S_]
    out = out.reshape(B_, H_ // 2, S_, 2, 64).transpose(0, 1, 3, 2, 4)
    return out.reshape(B_, H_, S_, 64)


def exp_packed():
    q, k, v = attn_args()
    fl = 4 * B * H * S * S * D          # USEFUL flops (not the 2x padded)
    # correctness vs the reference kernel first (small slice)
    qs, ks, vs = q[:, :4, :1024], k[:, :4, :1024], v[:, :4, :1024]
    got = packed_flash(qs, ks, vs, block_q=256, block_k=512)
    ref = _flash_fwd(qs, ks, vs, scale=D ** -0.5, block_q=256, block_k=512)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    print(f"# packed-vs-reference max|diff| (S=1024 slice): {err:.3e}")
    assert err < 5e-2, "packed kernel numerics diverged"

    for bq, bk in [(256, 512), (512, 512), (512, 1024)]:
        try:
            t, c = timed(lambda a, b_, c_: packed_flash(
                a, b_, c_, block_q=bq, block_k=bk), q, k, v)
        except Exception as e:
            print(f"packed bq={bq} bk={bk} FAIL {str(e)[:80]}")
            continue
        print(f"packed bq={bq:4d} bk={bk:5d} {t * 1e3:7.2f} ms "
              f"{fl / t / 1e12:6.1f} useful-TFLOP/s (compile {c:.0f}s)")
    t_ref, _ = timed(lambda a, b_, c_: _flash_fwd(
        a, b_, c_, scale=D ** -0.5, block_q=512, block_k=1024), q, k, v)
    print(f"direct D=64 (512,1024): {t_ref * 1e3:7.2f} ms "
          f"{fl / t_ref / 1e12:6.1f} TFLOP/s")


def exp_int8rate():
    """Raw MXU rate: bf16 vs int8 at K=64 and K=128 contractions, the
    shape class the flash kernel issues per tile. The contraction
    result is fed back into the next iteration's LHS so XLA cannot
    hoist/CSE the loop-invariant dot, and M/N are large enough
    (2048x4096) that per-iteration overhead is <5% of MXU time."""
    M, N, ITERS = 2048, 4096, 50
    for dtype, acc in ((jnp.bfloat16, jnp.float32), (jnp.int8, jnp.int32)):
        for K in (64, 128):
            a = jnp.ones((M, K), dtype)
            b = jnp.ones((K, N), dtype)

            @jax.jit
            def many(a, b):
                def body(carry, _):
                    o = jax.lax.dot_general(
                        carry, b, (((1,), (0,)), ((), ())),
                        preferred_element_type=acc)  # [M, N]
                    # fold the result back into a [M, K] LHS (cheap
                    # slice+cast on the VPU; keeps the dot live)
                    nxt = o[:, :K].astype(dtype)
                    if dtype == jnp.int8:
                        nxt = jnp.clip(o[:, :K], -127, 127).astype(dtype)
                    return nxt, None
                out, _ = jax.lax.scan(body, a, None, length=ITERS)
                return out.astype(jnp.float32).ravel()[0]

            t0 = time.time()
            float(many(a, b))
            times = []
            for _ in range(3):
                t0 = time.time()
                float(many(a, b))
                times.append(time.time() - t0)
            t = min(times) / ITERS
            fl = 2 * M * N * K
            name = "int8" if dtype == jnp.int8 else "bf16"
            unit = "TOP/s" if dtype == jnp.int8 else "TFLOP/s"
            print(f"dot {name} K={K:4d}: {t * 1e6:7.1f} us "
                  f"{fl / t / 1e12:6.1f} {unit}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", default="sweep,packed,int8rate")
    args = ap.parse_args()
    for name in args.exp.split(","):
        print(f"=== {name} ===")
        {"sweep": exp_sweep, "packed": exp_packed,
         "int8rate": exp_int8rate}[name]()


if __name__ == "__main__":
    main()
