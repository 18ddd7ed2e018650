#!/usr/bin/env python
"""End-to-end clip benchmark: seconds per 49-frame 480p FrameINO clip.

The BASELINE.md headline: text encode is excluded (prompt embeddings
precomputed, as the reference caches none but its cost is shared), so
the measurement covers VAE condition encodes + the full 50-step CFG
denoise scan + tiled VAE decode on one chip at 480x832x49f with the 5B
Wan2.2 DiT and the real Wan2.2 VAE architecture (zero weights; timing
is value-independent).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from frameino_tpu.models import wan_dit, wan_vae
from frameino_tpu.models.wan_vae_tiling import (hybrid_decode,
                                                hybrid_encode)
from frameino_tpu.pipelines import wan_i2v as P

# 448x832 gives UNIFORM 256/192 tiles (H,W = 192k+256), so the tiled
# VAE compiles one tile shape instead of four — the remote compiler is
# the bottleneck, not the chip. 448 is also the CogVideoX eval height.
# --flagship switches to the Wan2.2 paper shape 704x1280x81f with
# sequential CFG (batch-2 OOMs at 19.4k tokens on one chip).
H, W, F = 448, 832, 49
STEPS = int(os.environ.get("E2E_STEPS", 50))


def zeros_like_tree(shapes):
    return jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.bfloat16), shapes)


def main():
    global H, W, F
    int8 = "--int8" in sys.argv
    int8_vae = "--int8_vae" in sys.argv
    flagship = "--flagship" in sys.argv
    if flagship:
        H, W, F = 704, 1280, 81
    dit_cfg = wan_dit.WAN22_TI2V_5B_MOTION
    vae_cfg = wan_vae.WAN22_VAE_CONFIG
    dit_params = zeros_like_tree(jax.eval_shape(
        lambda k: wan_dit.init_wan_dit(k, dit_cfg), jax.random.key(0)))
    if int8:
        from frameino_tpu.models.quant import quantize_dit_int8
        dit_params = quantize_dit_int8(dit_params, donate=True)
    vae_params = zeros_like_tree(jax.eval_shape(
        lambda k: wan_vae.init_wan_vae(k, vae_cfg), jax.random.key(0)))
    if int8_vae:
        # w8a8 inner convs (measured hybrid decode 4.01 -> 2.78 s);
        # certify quality per checkpoint: certify_int8.py --quantize_vae
        from frameino_tpu.models.quant import quantize_wan_vae_int8
        vae_params = quantize_wan_vae_int8(vae_params)

    key = jax.random.key(0)
    image = jnp.zeros((1, 3, H, W), jnp.float32)
    traj = jnp.zeros((1, 3, F, H, W), jnp.float32)
    ids = jnp.zeros((1, 3, 1, H, W), jnp.float32)
    text = jnp.zeros((1, 512, dit_cfg.text_dim), jnp.bfloat16)

    def enc(v):
        # hybrid (tiled x streaming) encode bounds memory next to the
        # resident 10GB DiT; measured 1.4s vs 5.0s tiled for the 49f clip
        moments = hybrid_encode(vae_cfg, vae_params, v, tile_min=256,
                                tile_stride=192, chunk_pixel_frames=16)
        mean = moments[:, :vae_cfg.z_dim]
        return wan_vae.normalize_latents(vae_cfg, mean)

    def encode_and_denoise():
        cond = enc(image[:, :, None])
        traj_lat = enc(traj)
        id_lat = enc(ids[:, :, :1])
        traj_lat = jnp.concatenate(
            [traj_lat, jnp.zeros_like(id_lat)], axis=2)
        shape = P.latent_shape(vae_cfg, 1, F, H, W)
        mask = P.build_first_frame_mask(shape[2], shape[3], shape[4])
        latents = jax.random.normal(key, shape, jnp.float32)
        from frameino_tpu.schedulers.flow_match_euler import inference_sigmas
        sigmas_np, ts_np = inference_sigmas(
            P.WanPipelineConfig().scheduler, STEPS)
        sig = jnp.asarray(sigmas_np)
        ts = jnp.asarray(ts_np)
        chunk = int(os.environ.get("E2E_CHUNK", 0)) or STEPS
        lat = latents
        # chunked programs (idempotent re-blend; sidesteps the tunnel's
        # long-single-program watchdog at the flagship shape)
        for a in range(0, STEPS, chunk):
            b = min(STEPS, a + chunk)
            lat = P.denoise(dit_cfg, dit_params, lat, cond, traj_lat,
                            id_lat, mask, text, jnp.zeros_like(text),
                            sig[a:b + 1], ts[a:b],
                            guidance_scale=5.0,
                            cfg_mode="sequential" if flagship else "batch")
        return lat

    t0 = time.time()
    lat = encode_and_denoise()
    float(lat[0, 0, 0, 0, 0])                       # force
    compile_and_first = time.time() - t0

    t0 = time.time()
    lat = encode_and_denoise()
    float(lat[0, 0, 0, 0, 0])
    denoise_s = time.time() - t0

    # decode in bf16 (the reference casts latents to vae.dtype, pipeline
    # :916); fp32 decode activations would double HBM next to the DiT
    z = wan_vae.denormalize_latents(vae_cfg, lat).astype(jnp.bfloat16)
    # Decode-mode survey on this chip (resident 10GB DiT):
    #   full-sequence: OOM; streaming 1-frame chunks: 58.0s;
    #   128/64 spatial tiles (72 tiles, 3.2x overlap): 26.3s;
    #   hybrid 256/192 tiles x 2-latent-frame streaming: 4.1s  <- r2
    t0 = time.time()
    video = hybrid_decode(vae_cfg, vae_params, z, tile_min=256,
                          tile_stride=192, chunk_latent_frames=2)
    float(video[0, 0, 0, 0, 0])
    decode_first = time.time() - t0
    t0 = time.time()
    video = hybrid_decode(vae_cfg, vae_params, z, tile_min=256,
                          tile_stride=192, chunk_latent_frames=2)
    float(video[0, 0, 0, 0, 0])
    decode_s = time.time() - t0

    total = denoise_s + decode_s
    print(json.dumps({
        "metric": ("wan22_5b_frameino_sec_per_81f_704x1280_clip"
                   if flagship else
                   "wan22_5b_frameino_sec_per_49f_448x832_clip")
                  + ("_int8" if int8 else "")
                  + ("_int8vae" if int8_vae else ""),
        "value": round(total, 2),
        "unit": "seconds (VAE encodes + 50-step CFG denoise + hybrid decode)",
        "denoise_s": round(denoise_s, 2),
        "decode_s": round(decode_s, 2),
    }))
    print(f"# first-call: denoise+compile {compile_and_first:.0f}s, "
          f"decode+compile {decode_first:.0f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
