#!/usr/bin/env python
"""CogVideoX-5B FrameIn END-TO-END clip benchmark (one v5e chip).

The reference's *published* benchmark protocol
(test_code/run_cogvideox_FrameIn_mass_evaluation.py:46-51,206-213):
448x640 canvas, 49 frames, 50 inference steps, guidance 6 with
use_dynamic_cfg=True — run here through the full TPU pipeline
(CogVideoX VAE condition encodes + 50-step batch-doubled CFG denoise +
segmented VAE decode) with the FrameIn ID frame attached. Denoise runs
as watchdog-safe chunked programs (steps_per_program; exact — DPM x0
history carries across chunks, tests/test_cogvideox_pipeline.py).

The reference runs this protocol in fp16 with enable_model_cpu_offload
on an A100 (:101-108). Zero weights here; timing is value-independent.

Usage: python scripts/bench_cog_e2e.py [--int8] [--steps 50] [--spp 10]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from frameino_tpu.core import compilation_cache
from frameino_tpu.models import cogvideox_dit, cogvideox_vae
from frameino_tpu.pipelines import cogvideox_i2v as P

compilation_cache.enable()   # the VAE first-chunk program alone costs
                             # ~8 min of XLA compile; cache it

H, W, F = 448, 640, 49


def zeros_like_tree(shapes):
    return jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.bfloat16), shapes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--spp", type=int, default=10,
                    help="denoise steps per compiled program")
    args = ap.parse_args()

    import numpy as np

    dit_cfg = cogvideox_dit.COGVIDEOX_5B_I2V_FRAMEINO
    vae_cfg = cogvideox_vae.COGVIDEOX_VAE_CONFIG
    dit_shapes = jax.eval_shape(
        lambda k: cogvideox_dit.init_cogvideox_dit(k, dit_cfg),
        jax.random.key(0))
    # the DiT stays resident in both modes: the tiled streaming VAE's
    # per-tile chunk programs fit beside it (the published protocol —
    # the reference eval enables VAE tiling+slicing)
    dit_params = zeros_like_tree(dit_shapes)
    vae_params = zeros_like_tree(jax.eval_shape(
        lambda k: cogvideox_vae.init_cogvideox_vae(k, vae_cfg),
        jax.random.key(1)))
    pipe = P.CogVideoXImageToVideoPipeline(
        dit_cfg, dit_params, vae_cfg, vae_params,
        quantize="int8" if args.int8 else None)
    # the pipeline host-offloads the VAE during the bf16 denoise
    # (vae_offload below, mirroring the reference's cpu_offload at
    # :104) — drop our references so the HBM copy can actually free
    del dit_params, vae_params

    image = jnp.zeros((1, 3, H, W), jnp.float32)
    traj = jnp.zeros((1, 3, F, H, W), jnp.float32)
    idf = jnp.zeros((1, 3, H, W), jnp.float32)
    text = jnp.zeros((1, dit_cfg.max_text_seq_length,
                      dit_cfg.text_embed_dim), jnp.bfloat16)

    def run_latent():
        lat = pipe(image, prompt_embeds=text, traj_tensor=traj,
                   id_tensor=idf, height=H, width=W, num_frames=F,
                   num_inference_steps=args.steps, guidance_scale=6.0,
                   key=jax.random.key(0), output_type="latent",
                   attn_impl="pallas", steps_per_program=args.spp,
                   vae_offload=not args.int8)
        jnp.asarray(lat)[0, 0, 0, 0, 0].item()   # force (tunnel: no
        return lat                               # block_until_ready)

    t0 = time.time()
    lat = run_latent()
    first = time.time() - t0
    print(f"# first call (compiles + run): {first:.0f}s", file=sys.stderr,
          flush=True)
    t0 = time.time()
    lat = run_latent()
    denoise_s = time.time() - t0
    print(f"# steady encode+denoise: {denoise_s:.1f}s", file=sys.stderr,
          flush=True)

    if not args.int8:
        pipe.restore_vae()
    zlat = (lat.transpose(0, 2, 1, 3, 4)
            / vae_cfg.scaling_factor).astype(jnp.bfloat16)

    def run_decode():
        # tiled x streaming decode — the published protocol (the
        # reference eval enables VAE tiling+slicing, :95-96); the DiT
        # stays resident
        from frameino_tpu.models import cogvideox_vae_streaming
        from frameino_tpu.ops.conv import conv_accum_dtype
        with conv_accum_dtype(jnp.bfloat16):
            video = cogvideox_vae_streaming.tiled_streaming_decode(
                vae_cfg, pipe.vae_params, zlat)
        float(video[0, 0, 0, 0, 0])
        return video

    t0 = time.time()
    run_decode()
    decode_first = time.time() - t0
    t0 = time.time()
    run_decode()
    decode_s = time.time() - t0

    total = denoise_s + decode_s
    print(json.dumps({
        "metric": "cogvideox_5b_frameino_sec_per_49f_448x640_clip"
                  + ("_int8" if args.int8 else ""),
        "value": round(total, 2),
        "unit": (f"seconds (VAE encodes + {args.steps}-step dynamic-CFG-6 "
                 "batch-doubled denoise + VAE decode; reference protocol "
                 "run_cogvideox_FrameIn_mass_evaluation.py:46-51)"),
        "denoise_s": round(denoise_s, 2),
        "decode_s": round(decode_s, 2),
    }))
    print(f"# first-call: encode+denoise+compile {first:.0f}s, "
          f"decode+compile {decode_first:.0f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
