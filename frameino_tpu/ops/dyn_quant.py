"""Fused dynamic per-token quantization (Pallas, TPU).

MEASURED NEGATIVE RESULT — ships disabled (``ENABLED = False``).

Hypothesis: dense_int8's absmax reduce + quantize are two XLA passes
over the input; one Pallas kernel doing absmax+round in a single VMEM
pass should cut the traffic ~40%. Measured on v5e (Wan 5B denoise
step, 49f@480x832): int8 1.60 -> 1.39 steps/s — a 13% REGRESSION; the
FFN chain alone 9.7 -> 11.7 ms/call. In isolation the kernel ties XLA
(2.41 vs 2.37 ms at [10920, 3072]; 3.81 vs 3.77 at [10920, 14336]).

Why it loses in context: XLA fuses the quantize arithmetic INTO the
producer chains — the gelu / AdaLN / dequant epilogues emit the s8
rows (and the absmax rides a multi-output fusion), so the bf16
intermediate often never makes a dedicated HBM round-trip. A custom
call cannot host those producers, forcing the intermediate to
materialize and re-read — the same lesson as the hand-fused AdaLN
kernel (ROADMAP: XLA elementwise fusion already saturates HBM here).
The wins that survived this hunt were the ones where the producer
could NOT fuse anyway: the attention producers (custom-call neighbors
— see ops/attention fused producers) and hoisting whole computations
out of the denoise scan (models/wan_dit.precompute_text_kv).

Numerics are identical to the XLA formulation (same fp32 ops in the
same order): s = max(|x|)/127 clamped at 1e-12, q = round(x/s).
Kept (with tests) as the documented experiment; flip ``ENABLED`` to
re-measure on future hardware/compilers.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Test hook (CPU interpret mode) and the re-measure switch (see module
# docstring: measured slower in context on v5e, ships off).
FORCE_INTERPRET = False
ENABLED = False


def _dyn_quant_kernel(x_ref, xq_ref, s_ref):
    x = x_ref[...].astype(jnp.float32)               # [blk, D]
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)   # [blk, 1]
    s = jnp.maximum(amax / 127.0, 1e-12)
    xq_ref[...] = jnp.round(x / s).astype(jnp.int8)
    s_ref[...] = s


@functools.partial(jax.jit, static_argnames=("interpret",))
def dynamic_quantize_rows(x: jax.Array, interpret: bool = False):
    """x [..., D] -> (xq int8 [..., D], s fp32 [..., 1]), one read pass.

    D must be a 128 multiple (all quantized denses here are). Row-tail
    blocks ride on Mosaic's block padding: padded rows produce garbage
    scales that land only in the masked write region.
    """
    shape = x.shape
    D = shape[-1]
    n = math.prod(shape[:-1])
    x2 = x.reshape(n, D)
    # [blk, D] bf16 in + fp32 temp + int8 out resident per cell:
    # 256 rows fits to D=8k, 64 beyond (FFN's 14336)
    blk = 256 if D <= 8192 else 64
    blk = min(blk, max(8, n))
    xq, s = pl.pallas_call(
        _dyn_quant_kernel,
        grid=(pl.cdiv(n, blk),),
        in_specs=[pl.BlockSpec((blk, D), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec((blk, D), lambda i: (i, 0)),
                   pl.BlockSpec((blk, 1), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((n, D), jnp.int8),
                   jax.ShapeDtypeStruct((n, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x2)
    return xq.reshape(shape), s.reshape(shape[:-1] + (1,))


def supported(x: jax.Array) -> bool:
    """Pallas path eligibility: TPU lowering, 128-multiple rows."""
    return (ENABLED and x.shape[-1] % 128 == 0 and x.ndim >= 2
            and (FORCE_INTERPRET or jax.default_backend() == "tpu"))
