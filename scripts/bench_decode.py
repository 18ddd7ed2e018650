"""Wan2.2 VAE decode-mode survey on one TPU chip.

Reproduces the e2e bench's memory regime (the 10GB bf16 5B DiT stays
resident) and times decode variants of a 13-latent-frame 448x832 clip:
spatial tiling at two tile sizes, temporal streaming at several chunk
sizes, and the streaming x tiled hybrid.

r1 state: full-sequence OOM; streaming chunk=1 58.0s; tiled 128/64
26.3s (72 tiles - heavy overlap redundancy).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from frameino_tpu.models import wan_dit, wan_vae
from frameino_tpu.models.wan_vae_streaming import streaming_decode
from frameino_tpu.models.wan_vae_tiling import (hybrid_decode,
                                                tiled_decode)

H, W, F_LAT = 448, 832, 13


def main():
    variants = sys.argv[1:] or ["tiled128", "tiled256", "stream2", "stream4"]
    dit_cfg = wan_dit.WAN22_TI2V_5B_MOTION
    vae_cfg = wan_vae.WAN22_VAE_CONFIG
    # resident DiT (memory pressure parity with the e2e pipeline)
    dit_params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16),
        jax.eval_shape(lambda k: wan_dit.init_wan_dit(k, dit_cfg),
                       jax.random.key(0)))
    vae_params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16),
        jax.eval_shape(lambda k: wan_vae.init_wan_vae(k, vae_cfg),
                       jax.random.key(0)))
    sc = vae_cfg.scale_factor_spatial
    z = jnp.zeros((1, vae_cfg.z_dim, F_LAT, H // sc, W // sc), jnp.bfloat16)

    def run(name, fn):
        try:
            t0 = time.time()
            v = fn()
            float(v[0, 0, 0, 0, 0])
            first = time.time() - t0
            t0 = time.time()
            v = fn()
            float(v[0, 0, 0, 0, 0])
            best = time.time() - t0
            print(f"{name:14s} {best:7.2f}s (first+compile {first:.0f}s) "
                  f"out={tuple(v.shape)}")
        except Exception as e:
            print(f"{name:14s} FAIL {str(e)[:120]}")

    for v in variants:
        if v == "tiled128":
            run("tiled-128/64", lambda: tiled_decode(
                vae_cfg, vae_params, z, tile_min=128, tile_stride=64))
        elif v == "tiled256":
            run("tiled-256/192", lambda: tiled_decode(
                vae_cfg, vae_params, z, tile_min=256, tile_stride=192))
        elif v.startswith("int8hybrid"):
            from frameino_tpu.models.quant import quantize_wan_vae_int8
            n = int(v.removeprefix("int8hybrid"))
            qvae = quantize_wan_vae_int8(vae_params)
            run(f"int8-hyb/c{n}", lambda n=n: hybrid_decode(
                vae_cfg, qvae, z, tile_min=256, tile_stride=192,
                chunk_latent_frames=n))
        elif v.startswith("hybrid"):
            n = int(v.removeprefix("hybrid"))
            run(f"hybrid-256/c{n}", lambda n=n: hybrid_decode(
                vae_cfg, vae_params, z, tile_min=256, tile_stride=192,
                chunk_latent_frames=n))
        elif v.startswith("stream"):
            n = int(v.removeprefix("stream"))
            run(f"stream-c{n}", lambda n=n: streaming_decode(
                vae_cfg, vae_params, z, chunk_latent_frames=n))
        else:
            print(f"unknown variant {v}")
    del dit_params


if __name__ == "__main__":
    main()
