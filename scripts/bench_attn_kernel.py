"""Flash-attention kernel block-size sweep on one TPU chip.

Self-attention shape of the Wan 5B denoise step: B=2 (CFG), H=24,
D=128 at S=5590 (49f@480x832 +ID) and S=19360 (flagship 704x1280x81f
+ID). KV re-read traffic scales with Sq/block_q, so large q blocks
should win until VMEM pressure bites.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from frameino_tpu.ops.attention import _flash_fwd


def bench(S, block_q, block_k, B=2, H=24, D=128, calls=3, iters=20):
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, S, D), jnp.bfloat16)

    @jax.jit
    def many(q, k, v):
        # chain iterations through q so the kernel can't be hoisted;
        # the per-iter elementwise add is noise next to the S^2 work
        def body(carry, _):
            o = _flash_fwd(carry, k, v, scale=D ** -0.5,
                           block_q=block_q, block_k=block_k)
            return carry + o * jnp.bfloat16(1e-3), None

        out, _ = jax.lax.scan(body, q, None, length=iters)
        return out[0, 0, 0, 0]

    def run():
        return float(many(q, k, v))

    try:
        t0 = time.time()
        run()
        compile_s = time.time() - t0
    except Exception as e:
        print(f"S={S} bq={block_q} bk={block_k}: FAIL {str(e)[:100]}")
        return
    times = []
    for _ in range(calls):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    best = min(times) / iters
    fl = 4 * B * H * S * S * D
    print(f"S={S:6d} bq={block_q:5d} bk={block_k:5d} best={best * 1e3:.2f}ms "
          f"tflops={fl / best / 1e12:6.1f} compile={compile_s:.1f}s")


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 5590
    for bq, bk in [(512, 1024), (1024, 1024), (2048, 1024), (4096, 1024),
                   (2048, 2048), (4096, 512)]:
        bench(S, bq, bk)


if __name__ == "__main__":
    main()
