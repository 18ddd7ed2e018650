"""Attention ops: XLA reference + Pallas TPU flash attention.

The video DiTs need three attention shapes (reference call sites):
- Wan self-attention over ~18k-32k video tokens with 3-axis RoPE
  (reference ``architecture/transformer_wan.py:38-119``),
- Wan cross-attention video->text (512 UMT5 tokens),
- CogVideoX *joint* self-attention over [text; video] in one sequence
  (reference ``architecture/attention_processor.py:2805-2877``).

All are full bidirectional attention — no masking on the hot path. That
makes the TPU kernel much simpler than general flash attention: the only
masking needed is for the padded tail when sequence lengths are not
multiples of the block size.

Three implementations:
- ``attention_xla``: jnp einsum reference (fp32 softmax). Used on CPU and
  in tests; XLA fuses it reasonably but materializes the [Sq, Skv] scores.
- ``flash_attention_inference``: hand-written Pallas forward kernel with
  online softmax (fwd only — the inference denoise loop never
  differentiates). Handles non-multiple sequence lengths by internal
  padding + tail masking.
- ``flash_attention_train``: wrapper around JAX's bundled Pallas TPU
  flash attention (fwd+bwd custom VJP) with segment-id padding so
  arbitrary lengths work.

``attention(...)`` dispatches on platform and differentiation needs.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _default_scale(head_dim: int) -> float:
    return head_dim ** -0.5


# ---------------------------------------------------------------------------
# XLA reference
# ---------------------------------------------------------------------------

def attention_xla(q: jax.Array, k: jax.Array, v: jax.Array,
                  scale: Optional[float] = None) -> jax.Array:
    """softmax(q k^T * scale) v with fp32 softmax. q/k/v: [B, H, S, D]."""
    scale = scale if scale is not None else _default_scale(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas forward kernel (inference hot path)
# ---------------------------------------------------------------------------

_NEG_INF = -1e30


_LOG2E = 1.4426950408889634


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref,
                      m_ref, l_ref, acc_ref, *,
                      block_k: int, kv_len: int, masked: bool):
    """One (batch*head, q_block) cell iterating over k blocks (grid dim 2).

    Online softmax with fp32 running max / sum / accumulator in VMEM
    scratch, in the exp2 domain (softmax is shift-invariant; the
    log2(e) * scale factor is folded into q by the caller — saves one
    [bq, bk] multiply per tile and uses the cheaper exp2 transcendental).
    The tail k block masks columns >= kv_len only when padding exists
    (static ``masked``).
    """
    k_idx = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                     # [block_q, D] (pre-scaled)
    k = k_ref[0]                     # [block_k, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # [block_q, block_k]

    if masked:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
            + k_idx * block_k
        s = jnp.where(col < kv_len, s, _NEG_INF)

    m_prev = m_ref[...]              # [block_q, 1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_next)
    p = jnp.exp2(s - m_next)         # [block_q, block_k] fp32
    l_ref[...] = alpha * l_ref[...] + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[...] = m_next

    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # [block_q, D]
    acc_ref[...] = alpha * acc_ref[...] + pv

    @pl.when(k_idx == num_k - 1)
    def _finish():
        o_ref[0] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)


def _flash_fwd_kernel_static(q_ref, k_ref, v_ref, b_ref, o_ref,
                             l_ref, acc_ref, *,
                             block_k: int, kv_len: int, masked: bool):
    """Static-bound softmax cell: ``p = exp2(s - bound)`` with a
    PRECOMPUTED per-(batch*head) upper bound on every logit — no
    running max, no ``alpha`` rescale of l/acc, no m scratch.

    Sound because softmax is shift-invariant and the DiT q/k are
    RMS/LayerNorm-normalized before attention: the caller derives
    ``bound >= max_ij q_i.k_j`` from Cauchy-Schwarz
    (max_i||q_i|| * max_j||k_j||, in the scaled exp2 domain), so
    ``p <= 1`` — no overflow by construction. Underflow (a whole row
    of p flushing to 0 -> 0/0) would need bound - row_max > ~126
    log2 units, impossible under qk-norm (gap <= 2*bound ~= 33 units
    at D=128 with unit gains); the -120 clamp makes even an
    adversarial-gain violation return a finite average-of-V row
    instead of NaN. Measured on v5e vs the online kernel (r5,
    scripts/bench_flash_variants.py): Cog D=64 S=15.9k 100.2 -> 83.9
    ms (+16%), Wan D=128 S=5.6k 10.3 -> 9.1 ms (+12%) — the D=64
    path is partially VPU(softmax)-bound, and the max reduction +
    rescale were the largest VPU terms.
    """
    k_idx = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _init():
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # [block_q, block_k]
    p = jnp.exp2(jnp.maximum(s - b_ref[0], -120.0))
    if masked:
        # zero padded key columns AFTER exp2 (the clamp floor would
        # otherwise resurrect them at 2^-120)
        col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1) \
            + k_idx * block_k
        p = jnp.where(col < kv_len, p, 0.0)
    l_ref[...] = l_ref[...] + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # [block_q, D]
    acc_ref[...] = acc_ref[...] + pv

    @pl.when(k_idx == num_k - 1)
    def _finish():
        o_ref[0] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _auto_block(sp: int, default: int, cap: int = 1408,
                floor: int = 512) -> int:
    """Block size for the padded sequence length ``sp``: 1024 when it
    divides, else the largest 128-multiple divisor in [floor, cap],
    else ``default``.

    Divisor blocks eliminate the kernel's tail re-pad (e.g. the 49f
    480x832 shape pads 5632 -> 6144 under block_k=1024: +9% masked
    work) and larger q blocks cut KV re-read traffic (~ sq/block_q).
    Measured on v5e (fused producers, B=2 H=24 D=128):
      sp=5632  (S=5590):  (512,1024) 10.29 ms -> (1408,1408) 9.80 ms
      sp=19456 (S=19360): (512,1024) 79.5 ms  -> (1024,1024) 73.7 ms
      sp=5120  (S=5096):  (512,1024) 7.19 ms  -> (1024,1024) 6.76 ms,
                          but (1280,1280) 7.41 ms — hence prefer 1024
                          over larger divisors when 1024 divides.
    cap=1408 bounds the [bq, bk] fp32 probability tile at 7.9 MB VMEM
    ((1408, 2816) fails scoped-vmem allocation). D=64 (CogVideoX) is a
    measured LOSS for every variant tried — its path keeps fixed
    blocks.
    """
    if sp % 1024 == 0:
        return 1024
    for cand in range(cap, floor - 1, -128):
        if sp % cand == 0:
            return cand
    return min(default, sp)


# Test hook: run the Pallas kernel in interpret mode on CPU so the
# shard_map x pallas_call composition (sp/tp meshes) is exercisable
# without TPU hardware (tests/test_sp_integration.py).
FORCE_INTERPRET = False

# Escape hatch for the fused-producer self-attention path (in-kernel
# qk-norm + RoPE); see fused_qk_flash_attention.
FUSED_QK_PRODUCERS = True


@functools.partial(jax.jit,
                   static_argnames=("scale", "block_q", "block_k",
                                    "kv_len", "prescaled", "interpret"))
def _flash_fwd(q, k, v, *, scale: Optional[float], block_q: int,
               block_k: int, kv_len: Optional[int] = None,
               prescaled: bool = False, interpret: bool = False):
    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    kv_len = Skv if kv_len is None else kv_len
    sq_p = _round_up(Sq, block_q)
    skv_p = _round_up(Skv, block_k)
    if not prescaled:
        # fold softmax scale + log2(e) into q once (exp2-domain softmax)
        q = q * jnp.asarray(scale * _LOG2E, q.dtype)
    if sq_p != Sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - Sq), (0, 0)))
    if skv_p != Skv:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, skv_p - Skv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, skv_p - Skv), (0, 0)))

    bh = B * H
    q = q.reshape(bh, sq_p, D)
    k = k.reshape(bh, skv_p, D)
    v = v.reshape(bh, skv_p, D)

    grid = (bh, sq_p // block_q, skv_p // block_k)
    out = pl.pallas_call(
        functools.partial(_flash_fwd_kernel, block_k=block_k,
                          kv_len=kv_len, masked=skv_p != kv_len),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v)
    out = out.reshape(B, H, sq_p, D)
    if sq_p != Sq:
        out = out[:, :, :Sq]
    return out


@functools.partial(jax.jit,
                   static_argnames=("block_q", "block_k", "kv_len",
                                    "interpret"))
def _flash_fwd_static(q, k, v, bound, *, block_q: int, block_k: int,
                      kv_len: Optional[int] = None,
                      interpret: bool = False):
    """Static-bound flash forward (see ``_flash_fwd_kernel_static``).

    q must be PRE-SCALED (softmax scale * log2e folded in, as the fused
    producers emit); ``bound`` is a shape-(1,) fp32 upper bound on
    every scaled logit (sup-norm product from Cauchy-Schwarz). Used by
    the DiT fused-producer paths only — generic callers without a
    qk-norm guarantee keep the online-softmax kernel.
    """
    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    kv_len = Skv if kv_len is None else kv_len
    sq_p = _round_up(Sq, block_q)
    skv_p = _round_up(Skv, block_k)
    if sq_p != Sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - Sq), (0, 0)))
    if skv_p != Skv:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, skv_p - Skv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, skv_p - Skv), (0, 0)))
    bh = B * H
    q = q.reshape(bh, sq_p, D)
    k = k.reshape(bh, skv_p, D)
    v = v.reshape(bh, skv_p, D)
    grid = (bh, sq_p // block_q, skv_p // block_k)
    out = pl.pallas_call(
        functools.partial(_flash_fwd_kernel_static, block_k=block_k,
                          kv_len=kv_len, masked=skv_p != kv_len),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, bound)
    out = out.reshape(B, H, sq_p, D)
    if sq_p != Sq:
        out = out[:, :, :Sq]
    return out


# Escape hatch: route the fused DiT paths back to the online-softmax
# kernel (tests compare the two; production default is static-bound —
# measured +16% D=64 / +12% D=128 on v5e, r5).
STATIC_BOUND_SOFTMAX = True


def flash_attention_inference(q, k, v, scale: Optional[float] = None,
                              block_q: int = 512, block_k: int = 1024):
    # block_k=1024 measured 26% faster than 512 on v5e at the Wan DiT
    # shapes (S~5.5k, D=128): 76 vs 56 TFLOP/s.
    """Non-causal Pallas flash attention, forward only. q/k/v: [B,H,S,D]."""
    scale = scale if scale is not None else _default_scale(q.shape[-1])
    Skv = k.shape[2]
    block_q = min(block_q, _round_up(q.shape[2], 128))
    block_k = min(block_k, _round_up(Skv, 128))
    return _flash_fwd(q, k, v, scale=float(scale),
                      block_q=block_q, block_k=block_k,
                      interpret=FORCE_INTERPRET)


# ---------------------------------------------------------------------------
# Fused-producer forward kernel: qk RMS-norm + interleaved RoPE fused
# into the q/k tile loads (VERDICT r2 #2)
# ---------------------------------------------------------------------------
#
# The Wan self-attention producer chain (dense -> rms_norm across heads
# -> interleaved RoPE, reference architecture/transformer_wan.py:75-87)
# costs several full HBM round-trips of the [B, S, H*D] q/k tensors per
# block. Here the norm (per-token rsqrt statistic precomputed by a cheap
# XLA reduce fused into the dense epilogue) and the RoPE rotation are
# applied INSIDE the flash kernel on tile load:
#   - q tiles are processed once per (bh, q_block) into a VMEM scratch;
#   - k tiles are re-processed per q block (VPU cost, measured);
#   - the interleaved pair swap is two lane-rolls + a parity select —
#     no layout permutation, no strided lane access;
#   - softmax scale * log2(e) is folded into q's cos/sin tables.
# Numerics match the unfused path: norm math fp32 -> bf16 cast (the
# reference RMSNorm returns x.dtype), rope fp32 -> bf16 for the MXU dot.


def _pairswap_lanes(x):
    """[..., 2i] <-> [..., 2i+1] (interleaved RoPE partner lanes)."""
    n = x.shape[-1]
    left = pltpu.roll(x, shift=n - 1, axis=x.ndim - 1)   # == shift -1
    right = pltpu.roll(x, shift=1, axis=x.ndim - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(lane % 2 == 0, left, right)


def _norm_rope_tile(raw, rstd, w, c2, s2, out_dtype):
    """raw [blk, D] bf16; rstd [blk]; w [D]; c2/s2 [blk, D] fp32."""
    f = raw.astype(jnp.float32) * rstd[:, None] * w[None, :]
    f = f.astype(out_dtype).astype(jnp.float32)   # RMSNorm returns x.dtype
    return (f * c2 + _pairswap_lanes(f) * s2).astype(out_dtype)


def _qk_producer_kernel(raw_ref, rstd_ref, w_ref, c2_ref, s2_ref,
                        out_ref):
    """One (batch, s_block, head) cell: apply across-heads RMS-norm
    (precomputed per-token rstd) + interleaved RoPE to a [block_s, D]
    head slice, writing the [B*H, S, D] attention layout directly (the
    split_heads transpose rides along for free)."""
    out_ref[0] = _norm_rope_tile(raw_ref[0], rstd_ref[0, 0],
                                 w_ref[0, 0], c2_ref[...], s2_ref[...],
                                 out_ref.dtype)


def _qk_producer(raw, rstd, w2, c2, s2, *, num_heads: int,
                 block_s: int, interpret: bool):
    """raw [B, S_pad, H*D] -> normed+roped [B*H, S_pad, D].

    Grid order keeps the head index innermost so the (s-indexed) rope
    tables' block index is unchanged across consecutive cells — Pallas
    skips the re-DMA, so tables are fetched once per s block."""
    B, S, HD = raw.shape
    D = HD // num_heads
    H = num_heads
    grid = (B, S // block_s, H)
    return pl.pallas_call(
        _qk_producer_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_s, D), lambda b, s, h: (b, s, h)),
            pl.BlockSpec((1, 1, block_s), lambda b, s, h: (b, 0, s)),
            pl.BlockSpec((1, 1, D), lambda b, s, h: (h, 0, 0)),
            pl.BlockSpec((block_s, D), lambda b, s, h: (s, 0)),
            pl.BlockSpec((block_s, D), lambda b, s, h: (s, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_s, D),
                               lambda b, s, h: (b * H + h, s, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, S, D), raw.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(raw, rstd, w2, c2, s2)


def _qk_producer_fullrow_kernel(raw_ref, w_ref, c2_ref, s2_ref, out_ref,
                                *, eps: float, num_heads: int):
    """One (batch, s_block) cell seeing the FULL [block_s, H*D] row:
    computes the across-heads RMS statistic in-VMEM (killing the
    separate XLA reduce pass over q_raw/k_raw — measured ~210 GB/s, a
    full extra HBM read per producer) then applies norm + interleaved
    RoPE per head, writing the [B*H, S, D] attention layout.

    Two sweeps over the resident block: (1) fp32 sum-of-squares
    accumulated per head slice (no [block_s, H*D] fp32 temp), (2) the
    norm+rope application. RoPE pairs are lane-adjacent (2i, 2i+1) so
    head slices never straddle a pair."""
    D = out_ref.shape[-1]
    raw = raw_ref[0]                                    # [blk, H*D]
    ssq = jnp.zeros((raw.shape[0],), jnp.float32)
    for h in range(num_heads):
        f = raw[:, h * D:(h + 1) * D].astype(jnp.float32)
        ssq = ssq + jnp.sum(f * f, axis=-1)
    rstd = jax.lax.rsqrt(ssq / (num_heads * D) + eps)
    c2, s2 = c2_ref[...], s2_ref[...]
    for h in range(num_heads):
        out_ref[h] = _norm_rope_tile(raw[:, h * D:(h + 1) * D], rstd,
                                     w_ref[0, h], c2, s2, out_ref.dtype)


def _qk_producer_fullrow(raw, w2, c2, s2, *, num_heads: int, eps: float,
                         block_s: int, interpret: bool):
    """raw [B, S_pad, H*D] -> normed+roped [B*H, S_pad, D], RMS
    statistic computed in-kernel (cf. _qk_producer, which takes a
    precomputed rstd). w2: [1, H, D]."""
    B, S, HD = raw.shape
    D = HD // num_heads
    H = num_heads
    grid = (B, S // block_s)
    return pl.pallas_call(
        functools.partial(_qk_producer_fullrow_kernel, eps=eps,
                          num_heads=H),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_s, HD), lambda b, s: (b, s, 0)),
            pl.BlockSpec((1, H, D), lambda b, s: (0, 0, 0)),
            pl.BlockSpec((block_s, D), lambda b, s: (s, 0)),
            pl.BlockSpec((block_s, D), lambda b, s: (s, 0)),
        ],
        out_specs=pl.BlockSpec((H, block_s, D), lambda b, s: (b, s, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, S, D), raw.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(raw, w2, c2, s2)


def _rope_expand(cos, sin, gain: float = 1.0):
    """[S, D/2] pair tables -> interleaved-lane [S, D] C2/S2 with
    C2 = [c0,c0,c1,c1,...], S2 = [-s0,+s0,-s1,+s1,...] (times gain)."""
    c2 = jnp.repeat(cos * gain, 2, axis=-1)
    sg = sin * gain
    s2 = jnp.stack([-sg, sg], axis=-1).reshape(sg.shape[0], -1)
    return c2.astype(jnp.float32), s2.astype(jnp.float32)


def _rowmax_norm(x):
    """max row L2 over [BH, S, D] (fp32)."""
    return jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)),
                            axis=-1)).max()


def _fused_qk_flash_impl(q_raw, k_raw, v, w_q, w_k, cos, sin, *,
                         num_heads: int, eps: float,
                         scale: Optional[float],
                         block_q: Optional[int],
                         block_k: Optional[int],
                         interpret: bool,
                         rstd_q=None, rstd_k=None,
                         static_softmax: Optional[bool] = None):
    """Shared body of the fused-producer flash path. With
    rstd_q/rstd_k ([B, 1, S] per-token reciprocal RMS) the producers
    apply the PRECOMPUTED statistic (the tp-sharded path, where the
    across-heads stat was psum'd outside); otherwise the full-row
    kernel computes it in-VMEM."""
    B, S, HD = q_raw.shape
    D = HD // num_heads
    H = num_heads
    scale = scale if scale is not None else _default_scale(D)

    # 256-row blocks: the full-row producer holds [block_s, H*D] raw +
    # [H, block_s, D] out resident; 512 rows = 22.4M scoped vmem (OOM),
    # 256 fits with room for the fp32 temps
    block_s = min(256, _round_up(S, 128))
    sp = _round_up(S, block_s)
    pad = sp - S
    # softmax scale * log2(e) folds into q's rope tables
    cq2, sq2 = _rope_expand(cos, sin, gain=scale * _LOG2E)
    ck2, sk2 = _rope_expand(cos, sin)
    if pad:
        q_raw = jnp.pad(q_raw, ((0, 0), (0, pad), (0, 0)))
        k_raw = jnp.pad(k_raw, ((0, 0), (0, pad), (0, 0)))
        cq2 = jnp.pad(cq2, ((0, pad), (0, 0)))
        sq2 = jnp.pad(sq2, ((0, pad), (0, 0)))
        ck2 = jnp.pad(ck2, ((0, pad), (0, 0)))
        sk2 = jnp.pad(sk2, ((0, pad), (0, 0)))
        if rstd_q is not None:
            rstd_q = jnp.pad(rstd_q, ((0, 0), (0, 0), (0, pad)),
                             constant_values=1.0)
            rstd_k = jnp.pad(rstd_k, ((0, 0), (0, 0), (0, pad)),
                             constant_values=1.0)
    wq2 = w_q.reshape(1, H, D).astype(jnp.float32)
    wk2 = w_k.reshape(1, H, D).astype(jnp.float32)

    if rstd_q is not None:
        # _qk_producer's per-head grid walks the FIRST w dim: [H, 1, D]
        qh = _qk_producer(q_raw, rstd_q, wq2.reshape(H, 1, D), cq2, sq2,
                          num_heads=H, block_s=block_s,
                          interpret=interpret)
        kh = _qk_producer(k_raw, rstd_k, wk2.reshape(H, 1, D), ck2, sk2,
                          num_heads=H, block_s=block_s,
                          interpret=interpret)
    else:
        # RMS statistic computed in-kernel (full-row cells): no separate
        # rstd reduce pass over the [B, S, H*D] raws
        qh = _qk_producer_fullrow(q_raw, wq2, cq2, sq2, num_heads=H,
                                  eps=eps, block_s=block_s,
                                  interpret=interpret)
        kh = _qk_producer_fullrow(k_raw, wk2, ck2, sk2, num_heads=H,
                                  eps=eps, block_s=block_s,
                                  interpret=interpret)
    vh = v
    if pad:
        vh = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))

    # main flash kernel on the pre-processed tensors; q is already
    # scaled, padded k columns masked via the true kv_len. Block sizes
    # default to the divisor policy (_auto_block): no tail re-pad,
    # larger q blocks.
    bq = block_q if block_q is not None else _auto_block(sp, 512)
    bk = block_k if block_k is not None else _auto_block(sp, 1024)
    if static_softmax is None:
        static_softmax = STATIC_BOUND_SOFTMAX
    if static_softmax:
        # sup bound on every scaled logit via Cauchy-Schwarz over the
        # producer outputs (qh already carries scale*log2e; padded rows
        # are exactly zero and cannot inflate the max). One fused XLA
        # reduce over tensors the kernel reads anyway.
        bound = _rowmax_norm(qh) * _rowmax_norm(kh)
        out = _flash_fwd_static(qh.reshape(B, H, sp, D),
                                kh.reshape(B, H, sp, D), vh,
                                bound.reshape(1), block_q=min(bq, sp),
                                block_k=min(bk, sp), kv_len=S,
                                interpret=interpret)
    else:
        out = _flash_fwd(qh.reshape(B, H, sp, D), kh.reshape(B, H, sp, D),
                         vh, scale=None, block_q=min(bq, sp),
                         block_k=min(bk, sp), kv_len=S, prescaled=True,
                         interpret=interpret)
    if pad:
        out = out[:, :, :S]
    return out


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "eps", "scale",
                                    "block_q", "block_k", "interpret",
                                    "static_softmax"))
def fused_qk_flash_attention(q_raw, k_raw, v, w_q, w_k, cos, sin, *,
                             num_heads: int, eps: float,
                             scale: Optional[float] = None,
                             block_q: Optional[int] = None,
                             block_k: Optional[int] = None,
                             interpret: bool = False,
                             static_softmax: Optional[bool] = None):
    """Flash attention with the qk-norm + interleaved-RoPE producers
    fused into the kernel.

    q_raw/k_raw: [B, S, H*D] straight out of the to_q/to_k denses
    (pre-norm, pre-rope). v: [B, H, S, D]. w_q/w_k: [H*D] RMSNorm
    gains. cos/sin: [S, D/2] rope pair tables. Returns [B, H, S, D].
    """
    return _fused_qk_flash_impl(q_raw, k_raw, v, w_q, w_k, cos, sin,
                                num_heads=num_heads, eps=eps, scale=scale,
                                block_q=block_q, block_k=block_k,
                                interpret=interpret,
                                static_softmax=static_softmax)


def fused_sharded_supported(mesh, batch: int, num_heads: int, *,
                            batch_axes=("dp", "fsdp"),
                            head_axis: str = "tp") -> bool:
    """True iff the fused-producer paths can run under this mesh as a
    shard_map: sequence and pipeline axes unsharded (the producers need
    the full sequence's rope table rows, and the manual pp region passes
    mesh=None anyway), batch divides dp*fsdp, heads divide tp."""
    if mesh is None:
        return False
    if mesh.shape.get("sp", 1) > 1 or mesh.shape.get("pp", 1) > 1:
        return False
    bsz = 1
    for a in batch_axes:
        bsz *= mesh.shape.get(a, 1)
    tp = mesh.shape.get(head_axis, 1)
    return batch % bsz == 0 and num_heads % tp == 0


def _get_shard_map():
    try:
        from jax import shard_map as _sm

        def shard_map(f, **kw):           # new API spells it check_vma
            kw["check_vma"] = kw.pop("check_rep")
            return _sm(f, **kw)

        return shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
        return shard_map


def fused_qk_flash_attention_sharded(q_raw, k_raw, v, w_q, w_k, cos, sin,
                                     mesh, *, num_heads: int, eps: float,
                                     scale: Optional[float] = None,
                                     block_q: Optional[int] = None,
                                     block_k: Optional[int] = None,
                                     interpret: bool = False,
                                     batch_axes=("dp", "fsdp"),
                                     head_axis: str = "tp"):
    """``fused_qk_flash_attention`` under a dp/fsdp/tp mesh (VERDICT r3
    weak #5: the fused step win previously vanished on every sharded
    mesh because bare pallas_calls cannot be partitioned by GSPMD).

    Runs the producers + flash kernel inside a shard_map: batch rides
    dp/fsdp, heads ride tp (q_raw/k_raw arrive head-major on the H*D
    dim straight from the column-parallel to_q/to_k denses, so the tp
    shard IS a contiguous head slice). dp/fsdp keep every head local —
    pure dispatch plumbing around the full-row kernel. tp > 1 splits
    the across-heads RMS statistic: each device reduces its local head
    slice's sum-of-squares and a psum over tp completes the global
    mean, after which the producers consume the precomputed rstd
    (``_qk_producer``). Check ``fused_sharded_supported`` first.
    """
    from jax.sharding import PartitionSpec as P
    shard_map = _get_shard_map()
    B, S, HD = q_raw.shape
    D = HD // num_heads
    scale_v = scale if scale is not None else _default_scale(D)
    b_axes = tuple(a for a in batch_axes if a in mesh.shape) or None
    h_ax = head_axis if head_axis in mesh.shape else None
    tp = mesh.shape.get(head_axis, 1)
    h_local = num_heads // tp
    spec_raw = P(b_axes, None, h_ax)
    spec_v = P(b_axes, h_ax, None, None)
    spec_w = P(h_ax)
    spec_t = P(None, None)

    def local(ql, kl, vl, wql, wkl, c, s):
        if tp > 1:
            # the across-heads RMS statistic needs EVERY head: psum the
            # local head slice's sum-of-squares over the tp axis, then
            # hand the producers the finished per-token rstd
            ssq_q = jax.lax.psum(
                jnp.sum(jnp.square(ql.astype(jnp.float32)), -1), head_axis)
            ssq_k = jax.lax.psum(
                jnp.sum(jnp.square(kl.astype(jnp.float32)), -1), head_axis)
            rstd_q = jax.lax.rsqrt(ssq_q / HD + eps)[:, None, :]
            rstd_k = jax.lax.rsqrt(ssq_k / HD + eps)[:, None, :]
        else:
            rstd_q = rstd_k = None
        return _fused_qk_flash_impl(ql, kl, vl, wql, wkl, c, s,
                                    num_heads=h_local, eps=eps,
                                    scale=scale_v, block_q=block_q,
                                    block_k=block_k, interpret=interpret,
                                    rstd_q=rstd_q, rstd_k=rstd_k)

    return shard_map(local, mesh=mesh,
                     in_specs=(spec_raw, spec_raw, spec_v, spec_w, spec_w,
                               spec_t, spec_t),
                     out_specs=spec_v, check_rep=False)(
        q_raw, k_raw, v, w_q, w_k, cos, sin)


# ---------------------------------------------------------------------------
# Fused producer, CogVideoX variant: per-head LayerNorm + joint-sequence
# RoPE (identity rotation over the text prefix)
# ---------------------------------------------------------------------------

def _qk_producer_ln_kernel(raw_ref, w_ref, b_ref, c2_ref, s2_ref,
                           out_ref, *, eps: float, head_dim: int,
                           heads_per_block: int):
    """One (batch, s_block, head_group) cell: per-head LayerNorm (stats
    over each head's lanes, shared [head_dim] gamma/beta — diffusers
    Attention qk_norm='layer_norm') + interleaved RoPE, written in the
    [B*H, S, head_dim] attention layout."""
    x = raw_ref[0].astype(jnp.float32)       # [bs, head_dim * hpb]
    w = w_ref[0, 0][None, :]
    b = b_ref[0, 0][None, :]
    for i in range(heads_per_block):
        h = x[:, i * head_dim:(i + 1) * head_dim]
        mu = h.mean(-1, keepdims=True)
        var = ((h - mu) ** 2).mean(-1, keepdims=True)
        n = (h - mu) * jax.lax.rsqrt(var + eps) * w + b
        n = n.astype(out_ref.dtype).astype(jnp.float32)
        out_ref[i] = (n * c2_ref[...]
                      + _pairswap_lanes(n) * s2_ref[...]
                      ).astype(out_ref.dtype)


def _qk_producer_ln(raw, w, b, c2, s2, *, num_heads: int, head_dim: int,
                    eps: float, block_s: int, interpret: bool):
    """raw [B, S_pad, H*hd] -> normed+roped [B*H, S_pad, hd]."""
    B, S, HD = raw.shape
    H = num_heads
    hpb = max(1, min(128 // head_dim, H))
    if H % hpb:
        hpb = 1          # odd head counts: every head must get a cell
    grid = (B, S // block_s, H // hpb)
    return pl.pallas_call(
        functools.partial(_qk_producer_ln_kernel, eps=eps,
                          head_dim=head_dim, heads_per_block=hpb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_s, head_dim * hpb),
                         lambda b_, s, h: (b_, s, h)),
            pl.BlockSpec((1, 1, head_dim), lambda b_, s, h: (0, 0, 0)),
            pl.BlockSpec((1, 1, head_dim), lambda b_, s, h: (0, 0, 0)),
            pl.BlockSpec((block_s, head_dim), lambda b_, s, h: (s, 0)),
            pl.BlockSpec((block_s, head_dim), lambda b_, s, h: (s, 0)),
        ],
        out_specs=pl.BlockSpec(
            (hpb, block_s, head_dim),
            lambda b_, s, h: (b_ * (H // hpb) + h, s, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, S, head_dim), raw.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(raw, w.reshape(1, 1, head_dim).astype(jnp.float32),
      b.reshape(1, 1, head_dim).astype(jnp.float32), c2, s2)


def _fused_ln_qk_flash_impl(q_raw, k_raw, v, w_q, b_q, w_k, b_k,
                            cos, sin, *, num_heads: int,
                            head_dim: int, eps: float,
                            scale: Optional[float],
                            block_q: Optional[int],
                            block_k: Optional[int],
                            interpret: bool,
                            static_softmax: Optional[bool] = None):
    B, S, HD = q_raw.shape
    H, D = num_heads, head_dim
    scale = scale if scale is not None else _default_scale(D)
    block_s = min(512, _round_up(S, 128))
    sp = _round_up(S, block_s)
    pad = sp - S
    cq2, sq2 = _rope_expand(cos, sin, gain=scale * _LOG2E)
    ck2, sk2 = _rope_expand(cos, sin)
    if pad:
        q_raw = jnp.pad(q_raw, ((0, 0), (0, pad), (0, 0)))
        k_raw = jnp.pad(k_raw, ((0, 0), (0, pad), (0, 0)))
        cq2 = jnp.pad(cq2, ((0, pad), (0, 0)))
        sq2 = jnp.pad(sq2, ((0, pad), (0, 0)))
        ck2 = jnp.pad(ck2, ((0, pad), (0, 0)))
        sk2 = jnp.pad(sk2, ((0, pad), (0, 0)))
    qh = _qk_producer_ln(q_raw, w_q, b_q, cq2, sq2, num_heads=H,
                         head_dim=D, eps=eps, block_s=block_s,
                         interpret=interpret)
    kh = _qk_producer_ln(k_raw, w_k, b_k, ck2, sk2, num_heads=H,
                         head_dim=D, eps=eps, block_s=block_s,
                         interpret=interpret)
    vh = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0))) if pad else v
    # D=64 block policy: fixed (1024, 1024). The _auto_block divisor
    # policy is a measured LOSS at this head_dim (joint 19.5k tokens on
    # v5e: (512,1024) 172 ms vs (768,768) 200 ms, (512,1664) 181 ms),
    # but the fixed (1024, 1024) blocks beat the old (512, 1024)
    # default at both CogVideoX protocol shapes through this exact
    # path (scripts/bench_attn_d64.py sweep + fused-path rerun on v5e):
    #   S=15,906 (448x640x49f): 116.4 -> 108.5 ms  (57.3 -> 62 TFLOP/s)
    #   S=19,126 (480x720x49f): 159.1 -> 147.4 ms
    # Larger q blocks amortize the half-depth (K=64) QK^T pipeline
    # startup across more rows; 2048-wide K blocks regress again.
    bq = block_q if block_q is not None else min(1024, sp)
    bk = block_k if block_k is not None else min(1024, sp)
    if static_softmax is None:
        static_softmax = STATIC_BOUND_SOFTMAX
    if static_softmax:
        bound = _rowmax_norm(qh) * _rowmax_norm(kh)
        out = _flash_fwd_static(qh.reshape(B, H, sp, D),
                                kh.reshape(B, H, sp, D), vh,
                                bound.reshape(1), block_q=bq, block_k=bk,
                                kv_len=S, interpret=interpret)
    else:
        out = _flash_fwd(qh.reshape(B, H, sp, D), kh.reshape(B, H, sp, D),
                         vh, scale=None, block_q=bq,
                         block_k=bk, kv_len=S, prescaled=True,
                         interpret=interpret)
    if pad:
        out = out[:, :, :S]
    return out


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "head_dim", "eps",
                                    "scale", "block_q", "block_k",
                                    "interpret", "static_softmax"))
def fused_ln_qk_flash_attention(q_raw, k_raw, v, w_q, b_q, w_k, b_k,
                                cos, sin, *, num_heads: int,
                                head_dim: int, eps: float,
                                scale: Optional[float] = None,
                                block_q: Optional[int] = None,
                                block_k: Optional[int] = None,
                                interpret: bool = False,
                                static_softmax: Optional[bool] = None):
    """CogVideoX joint self-attention with the per-head-LayerNorm +
    RoPE producers fused into Pallas passes (the wan variant's
    layer-norm sibling; reference attention_processor.py:2805-2877).

    q_raw/k_raw: [B, S, H*hd] (pre-norm, pre-rope); v: [B, H, S, hd];
    w/b: [hd] LayerNorm params; cos/sin: [S, hd/2] JOINT-sequence rope
    tables (identity rows over the text prefix). Returns [B, H, S, hd].
    """
    return _fused_ln_qk_flash_impl(q_raw, k_raw, v, w_q, b_q, w_k, b_k,
                                   cos, sin, num_heads=num_heads,
                                   head_dim=head_dim, eps=eps, scale=scale,
                                   block_q=block_q, block_k=block_k,
                                   interpret=interpret,
                                   static_softmax=static_softmax)


def fused_ln_qk_flash_attention_sharded(q_raw, k_raw, v, w_q, b_q, w_k,
                                        b_k, cos, sin, mesh, *,
                                        num_heads: int, head_dim: int,
                                        eps: float,
                                        scale: Optional[float] = None,
                                        block_q: Optional[int] = None,
                                        block_k: Optional[int] = None,
                                        interpret: bool = False,
                                        batch_axes=("dp", "fsdp"),
                                        head_axis: str = "tp"):
    """``fused_ln_qk_flash_attention`` under a dp/fsdp/tp mesh. Unlike
    the wan variant's across-heads RMS, the per-head LayerNorm
    statistic is local to each head — tp sharding needs NO collective,
    only the shard_map plumbing (batch over dp/fsdp, contiguous head
    slices of the H*hd dim over tp, shared [hd] gamma/beta replicated).
    Check ``fused_sharded_supported`` first.
    """
    from jax.sharding import PartitionSpec as P
    shard_map = _get_shard_map()
    tp = mesh.shape.get(head_axis, 1)
    h_local = num_heads // tp
    b_axes = tuple(a for a in batch_axes if a in mesh.shape) or None
    h_ax = head_axis if head_axis in mesh.shape else None
    spec_raw = P(b_axes, None, h_ax)
    spec_v = P(b_axes, h_ax, None, None)
    spec_p = P(None)
    spec_t = P(None, None)

    def local(ql, kl, vl, wq, bq_, wk, bk_, c, s):
        return _fused_ln_qk_flash_impl(ql, kl, vl, wq, bq_, wk, bk_, c, s,
                                       num_heads=h_local,
                                       head_dim=head_dim, eps=eps,
                                       scale=scale, block_q=block_q,
                                       block_k=block_k,
                                       interpret=interpret)

    return shard_map(local, mesh=mesh,
                     in_specs=(spec_raw, spec_raw, spec_v, spec_p, spec_p,
                               spec_p, spec_p, spec_t, spec_t),
                     out_specs=spec_v, check_rep=False)(
        q_raw, k_raw, v, w_q, b_q, w_k, b_k, cos, sin)


# ---------------------------------------------------------------------------
# Differentiable path: bundled Pallas flash attention + padding wrapper
# ---------------------------------------------------------------------------

def flash_attention_train(q, k, v, scale: Optional[float] = None,
                          block_multiple: int = 512):
    """Differentiable flash attention for arbitrary lengths.

    Pads Sq/Skv to a block multiple and uses segment ids so padded keys
    never mix with real tokens (pad tokens form their own segment, which
    keeps their softmax rows finite — important for the backward pass).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as _jax_flash, BlockSizes, SegmentIds)

    scale = scale if scale is not None else _default_scale(q.shape[-1])
    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    sq_p = _round_up(Sq, block_multiple)
    skv_p = _round_up(Skv, block_multiple)
    need_pad = (sq_p != Sq) or (skv_p != Skv)
    if need_pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - Sq), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, skv_p - Skv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, skv_p - Skv), (0, 0)))
        q_seg = (jnp.arange(sq_p) >= Sq).astype(jnp.int32)[None].repeat(B, 0)
        kv_seg = (jnp.arange(skv_p) >= Skv).astype(jnp.int32)[None].repeat(B, 0)
        seg = SegmentIds(q=q_seg, kv=kv_seg)
    else:
        seg = None
    # 512-based blocks measured 78 vs 15 TFLOP/s against the kernel's
    # defaults at the Wan DiT shapes on v5e
    bq = min(512, sq_p)
    bk = min(512, skv_p)
    bs = BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                    block_q_major_dkv=bq, block_k_major_dkv=bk,
                    block_k_dkv=bk, block_q_dkv=bq,
                    block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq)
    out = _jax_flash(q, k, v, segment_ids=seg, causal=False,
                     sm_scale=float(scale), block_sizes=bs)
    if sq_p != Sq:
        out = out[:, :, :Sq]
    return out


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def attention(q, k, v, scale: Optional[float] = None, *,
              impl: Optional[str] = None, differentiable: bool = False):
    """Multi-head attention. q: [B,H,Sq,D]; k/v: [B,H,Skv,D].

    impl: None (auto) | 'xla' | 'pallas'.
    """
    if impl is None:
        impl = "pallas" if _on_tpu() else "xla"
    if impl == "xla":
        return attention_xla(q, k, v, scale)
    if differentiable:
        return flash_attention_train(q, k, v, scale)
    return flash_attention_inference(q, k, v, scale)


# ---------------------------------------------------------------------------
# Sequence-parallel attention (sp axis): all-gather-KV shard_map
# ---------------------------------------------------------------------------

# Sequence-parallel strategy: "allgather" (KV gathered once; best for
# moderate S) or "ring" (KV shards rotate via ppermute with O(S/sp)
# per-device KV memory; best for >32k-token sequences).
DEFAULT_SP_METHOD = "allgather"


def needs_sharded_attention(mesh) -> bool:
    """True iff the mesh shards any axis attention tensors live on
    (dp/fsdp batch, tp heads, sp sequence). A pallas_call is a custom
    call GSPMD cannot partition — on such a mesh the kernel must run
    inside a shard_map (sp_attention/ring_attention) or be replaced by
    XLA attention; handing it to GSPMD directly would replicate the
    operands (all-gathers every step) and compute on every device."""
    if mesh is None:
        return False
    return any(mesh.shape.get(a, 1) > 1 for a in ("dp", "fsdp", "tp", "sp"))


def dispatch_attention(q, k, v, *, mesh=None, gather_kv: bool = True,
                       impl: Optional[str] = None,
                       differentiable: bool = False,
                       sp_method: Optional[str] = None):
    """Single- or mesh-sharded attention on [B, H, S, D].

    With an active multi-device mesh and divisible shapes, runs as a
    shard_map — batch over dp/fsdp, heads over tp, sequence over sp
    (all-gather-KV or ring per ``sp_method``; with sp == 1 no sequence
    collective exists and the kernel simply runs on its local
    batch/head shard; cross-attention to replicated text never
    gathers). When the shapes don't divide the mesh, falls back to XLA
    attention (einsums partition under GSPMD; a bare pallas_call would
    not — see ``needs_sharded_attention``). Single device: plain
    attention.
    """
    if not needs_sharded_attention(mesh):
        return attention(q, k, v, impl=impl, differentiable=differentiable)
    if sp_supported(mesh, q.shape, k.shape[2], gather_kv=gather_kv,
                    allow_sp1=True):
        method = sp_method or DEFAULT_SP_METHOD
        if (method == "ring" and gather_kv
                and mesh.shape.get("sp", 1) > 1):
            return ring_attention(q, k, v, mesh)
        return sp_attention(q, k, v, mesh, gather_kv=gather_kv,
                            impl=impl, differentiable=differentiable)
    if impl is None or impl == "pallas":
        return attention(q, k, v, impl="xla",
                         differentiable=differentiable)
    return attention(q, k, v, impl=impl, differentiable=differentiable)


def sp_supported(mesh, q_shape, kv_len: int, *, axis: str = "sp",
                 batch_axes=("dp", "fsdp"), head_axis: str = "tp",
                 gather_kv: bool = True, allow_sp1: bool = False) -> bool:
    """True iff sp_attention's shard_map divisibility constraints hold.

    With ``allow_sp1`` an sp == 1 mesh qualifies too (batch/head-only
    sharding — no sequence collective, kernel on local shards)."""
    if mesh is None:
        return False
    sp = mesh.shape.get(axis, 1)
    if sp <= 1 and not allow_sp1:
        return False
    B, H, S, _ = q_shape
    bsz = 1
    for a in batch_axes:
        bsz *= mesh.shape.get(a, 1)
    tp = mesh.shape.get(head_axis, 1)
    if gather_kv and kv_len % sp != 0:
        return False
    return S % sp == 0 and B % bsz == 0 and H % tp == 0


def sp_attention(q, k, v, mesh, scale: Optional[float] = None, *,
                 axis: str = "sp", batch_axes=("dp", "fsdp"),
                 head_axis: str = "tp", gather_kv: bool = True,
                 impl: Optional[str] = None, differentiable: bool = False):
    """Sequence-parallel attention: queries stay sharded over ``axis``
    along the sequence dim; keys/values are all-gathered over ICI so each
    shard computes attention for its query slice against the full
    sequence. This is the standard all-gather-KV context parallelism —
    headroom the reference (single-device SDPA, SURVEY §5 "long-context:
    none") never had.

    q/k/v: [B, H, S, D] GLOBAL arrays. Batch rides ``batch_axes``, heads
    ride ``head_axis`` (tensor parallel), sequence rides ``axis`` — so the
    shard_map owns the full mesh layout and no axis is silently gathered.
    With ``gather_kv=False`` the key/value sequence is treated as
    replicated (cross-attention to text: small, no gather needed).
    Differentiable: all_gather transposes to psum_scatter under AD.

    Requires Sq % sp == 0 (and Skv % sp == 0 when gather_kv),
    B % prod(batch_axes) == 0, H % tp == 0 — check with ``sp_supported``.
    """
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map as _sm

        def shard_map(f, **kw):           # new API spells it check_vma
            kw["check_vma"] = kw.pop("check_rep")
            return _sm(f, **kw)
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    scale = scale if scale is not None else _default_scale(q.shape[-1])
    # reference only axis names the mesh actually has (raw Mesh objects
    # may carry a subset of the canonical five axes)
    b_axes = tuple(a for a in batch_axes if a in mesh.shape) or None
    h_ax = head_axis if head_axis in mesh.shape else None
    s_ax = axis if axis in mesh.shape else None
    spec_q = P(b_axes, h_ax, s_ax, None)
    spec_kv = spec_q if gather_kv else P(b_axes, h_ax, None, None)
    do_gather = gather_kv and mesh.shape.get(axis, 1) > 1

    use_pallas = (impl == "pallas") or (impl is None and _on_tpu())

    def local(ql, kl, vl):
        if do_gather:
            kl = jax.lax.all_gather(kl, axis, axis=2, tiled=True)
            vl = jax.lax.all_gather(vl, axis, axis=2, tiled=True)
        if not use_pallas:
            return attention_xla(ql, kl, vl, scale)
        if differentiable:
            return flash_attention_train(ql, kl, vl, scale)
        return flash_attention_inference(ql, kl, vl, scale)

    return shard_map(local, mesh=mesh,
                     in_specs=(spec_q, spec_kv, spec_kv), out_specs=spec_q,
                     check_rep=False)(q, k, v)


def ring_attention(q, k, v, mesh, scale: Optional[float] = None, *,
                   axis: str = "sp", batch_axes=("dp", "fsdp"),
                   head_axis: str = "tp"):
    """Ring sequence-parallel attention: KV shards rotate around the sp
    ring via ``lax.ppermute`` while each device accumulates its query
    shard's online softmax (log-sum-exp merge across ring steps).

    vs ``sp_attention`` (all-gather-KV): per-device KV memory is
    O(S/sp) instead of O(S), and each hop moves one shard instead of a
    full gather — the right trade at >32k-token sequences (ROADMAP
    headroom; the reference has no sequence parallelism at all,
    SURVEY §5). Differentiable (scan + ppermute transpose).

    q/k/v: [B, H, S, D] GLOBAL arrays; same divisibility constraints as
    ``sp_attention`` with gather_kv=True.
    """
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map as _sm

        def shard_map(f, **kw):
            kw["check_vma"] = kw.pop("check_rep")
            return _sm(f, **kw)
    except ImportError:
        from jax.experimental.shard_map import shard_map

    scale = scale if scale is not None else _default_scale(q.shape[-1])
    spec = P(batch_axes, head_axis, axis, None)
    sp = mesh.shape.get(axis, 1)
    perm = [(i, (i + 1) % sp) for i in range(sp)]

    def local(ql, kl, vl):
        qf = ql.astype(jnp.float32) * scale
        B, H, Sq, D = qf.shape

        def step(carry, _):
            m, l, acc, k_cur, v_cur = carry
            s = jnp.einsum("bhqd,bhkd->bhqk", qf,
                           k_cur.astype(jnp.float32))
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m, m_cur)
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            l = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
            acc = alpha * acc + jnp.einsum(
                "bhqk,bhkd->bhqd", p, v_cur.astype(jnp.float32))
            k_nxt = jax.lax.ppermute(k_cur, axis, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis, perm)
            return (m_new, l, acc, k_nxt, v_nxt), None

        init = (jnp.full((B, H, Sq, 1), _NEG_INF, jnp.float32),
                jnp.zeros((B, H, Sq, 1), jnp.float32),
                jnp.zeros((B, H, Sq, D), jnp.float32),
                kl, vl)
        (m, l, acc, _, _), _ = jax.lax.scan(step, init, None, length=sp)
        return (acc / l).astype(ql.dtype)

    return shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec, check_rep=False)(q, k, v)
