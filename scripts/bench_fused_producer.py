"""Bench fused_qk_flash_attention (producers + flash) on one TPU chip.

Wan 5B self-attention call shape: B=2 (CFG), H=24, D=128, S=5590.
Recorded history (same shape): two-pass producers w/ XLA rstd 9.73 ms;
divisor blocks 9.80->9.80? (see _auto_block docstring: 10.29 -> 9.80).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from frameino_tpu.ops import rope as rope_ops
from frameino_tpu.ops.attention import fused_qk_flash_attention


def bench(S=5590, B=2, H=24, D=128, iters=20, calls=3):
    ks = jax.random.split(jax.random.key(0), 5)
    q = jax.random.normal(ks[0], (B, S, H * D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, S, H * D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, S, D), jnp.bfloat16)
    w_q = jax.random.normal(ks[3], (H * D,), jnp.float32) * 0.02 + 1.0
    w_k = jax.random.normal(ks[4], (H * D,), jnp.float32) * 0.02 + 1.0
    grid = (15, 15, 26) if S <= 5850 else (20, 22, 44)
    cos, sin = rope_ops.wan_rope_table(D, *grid, max_seq_len=1024)
    cos = jnp.asarray(cos)[:S]
    sin = jnp.asarray(sin)[:S]

    @jax.jit
    def many(q, k, v):
        def body(carry, _):
            o = fused_qk_flash_attention(carry, k, v, w_q, w_k, cos, sin,
                                         num_heads=H, eps=1e-6)
            return carry + o.transpose(0, 2, 1, 3).reshape(B, S, H * D) \
                * jnp.bfloat16(1e-3), None

        out, _ = jax.lax.scan(body, q, None, length=iters)
        return out[0, 0, 0]

    float(many(q, k, v))          # compile
    times = []
    for _ in range(calls):
        t0 = time.time()
        float(many(q, k, v))
        times.append((time.time() - t0) / iters)
    ms = min(times) * 1e3
    flops = 4 * B * H * S * S * D
    print(f"S={S}: {ms:.2f} ms/call  {flops / (min(times)) / 1e12:.1f} "
          f"TFLOP/s (attention-only flops)")


if __name__ == "__main__":
    for s in (5590, 19360):
        bench(S=s)
