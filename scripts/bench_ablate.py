"""Ablation micro-bench for the Wan 5B DiT forward on one TPU chip.

Isolates where the denoise-step time goes: attention kernel choice,
softmax exp cost, fp32 modulation traffic, per-token vs scalar
timesteps, and the flagship 704x1280x81f shape. Each variant prints
seconds per single forward (batch 2 = CFG pair) and achieved TFLOP/s.

Usage: python scripts/bench_ablate.py [variant ...]
Variants: base xla scalar_ts flagship flagship_xla noattn
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from frameino_tpu.models import wan_dit


def zeros_params(cfg):
    shapes = jax.eval_shape(lambda k: wan_dit.init_wan_dit(k, cfg),
                            jax.random.key(0))
    return jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.bfloat16), shapes)


def forward_flops(cfg, S, text_len, batch):
    d = cfg.inner_dim
    f = cfg.ffn_dim
    per_block = (
        8 * S * d * d                      # self qkvo
        + 4 * S * S * d                    # self attn
        + 4 * S * d * d + 4 * text_len * d * d   # cross q,out + k,v
        + 4 * S * text_len * d             # cross attn
        + 4 * S * d * f                    # ffn
    )
    return batch * cfg.num_layers * per_block


def bench(name, cfg, F, H, W, text_len=512, per_token_ts=True,
          attn_impl="pallas", calls=3, int8=False, batch=2):
    """batch=2 is the CFG pair in one call; batch=1 models sequential
    CFG (the flagship 19k-token shape OOMs at batch 2 on one 16G chip)."""
    params = zeros_params(cfg)
    if int8:
        from frameino_tpu.models.quant import quantize_dit_int8
        # donate: the bf16 originals free as quantization runs
        params = quantize_dit_int8(params, donate=True)
    NB = batch
    S = F * (H // 2) * (W // 2)
    x = jnp.zeros((NB, cfg.in_channels, F, H, W), jnp.bfloat16)
    mask = None
    if per_token_ts == "mask":
        ts = jnp.full((NB,), 900.0, jnp.float32)
        mask = jnp.ones((NB, S), jnp.float32)
    elif per_token_ts:
        ts = jnp.full((NB, S), 900.0, jnp.float32)
    else:
        ts = jnp.full((NB,), 900.0, jnp.float32)
    text = jnp.zeros((NB, text_len, cfg.text_dim), jnp.bfloat16)

    @jax.jit
    def fwd(params, x, ts, text):
        out = wan_dit.wan_dit_forward(cfg, params, x, ts, text,
                                      timestep_mask=mask,
                                      attn_impl=attn_impl)
        return out[0, 0, 0, 0, 0]

    t0 = time.time()
    float(fwd(params, x, ts, text))
    compile_s = time.time() - t0
    times = []
    for _ in range(calls):
        t0 = time.time()
        float(fwd(params, x, ts, text))
        times.append(time.time() - t0)
    best = min(times)
    fl = forward_flops(cfg, S, text_len, NB)
    print(f"{name:16s} S={S:6d} best={best:.4f}s "
          f"tflops={fl / best / 1e12:7.1f} compile={compile_s:.1f}s")


def main():
    variants = sys.argv[1:] or ["base", "xla", "scalar_ts"]
    cfg = wan_dit.WAN22_TI2V_5B_MOTION
    for v in variants:
        if v == "base":
            bench("base", cfg, 14, 30, 52)
        elif v == "xla":
            bench("xla-attn", cfg, 14, 30, 52, attn_impl="xla")
        elif v == "scalar_ts":
            bench("scalar-ts", cfg, 14, 30, 52, per_token_ts=False)
        elif v == "mask_ts":
            bench("mask-ts", cfg, 14, 30, 52, per_token_ts="mask")
        elif v == "int8":
            bench("int8", cfg, 14, 30, 52, int8=True)
        elif v == "int8_mask":
            bench("int8+mask", cfg, 14, 30, 52, per_token_ts="mask",
                  int8=True)
        elif v == "flagship":
            bench("flagship-81f", cfg, 22, 44, 80, per_token_ts="mask",
                  batch=1)
        elif v == "flagship_int8":
            bench("flagship-int8", cfg, 22, 44, 80, per_token_ts="mask",
                  int8=True, batch=1)
        else:
            print(f"unknown variant {v}")


if __name__ == "__main__":
    main()
