#!/usr/bin/env python
"""The A100 side of `vs_baseline`, made auditable (VERDICT r4 weak #2).

The reference publishes NO timings (BASELINE.md), so the baseline is a
cost MODEL: analytic FLOPs of the reference's own per-clip work (its
models, its protocol — computed here by tracing our numerically-matched
graphs with core/flops.py, which is the same arithmetic the torch
modules execute) divided by an assumed achievable A100 throughput.

Assumptions (stated, conservative-favoring-the-A100):
  - A100-80GB SXM dense peak: 312 TFLOP/s fp16/bf16.
  - Achieved MFU 40% for the DiT denoise loop (torch SDPA + eager
    diffusers module graph, fp16: flash-SDPA kernels reach 50-70% on
    pure attention, but the surrounding eager RoPE/AdaLN/FFN glue and
    Python-loop step overhead land whole-model throughput near 40% —
    consistent with public DiT serving numbers; pick 45% and the
    baseline moves 12% in the A100's favor, still leaving the
    conclusion unchanged; the sensitivity row is printed).
  - Achieved 25% for the VAE decoder/encoder (memory-bound causal 3D
    convs with chunked streaming cache: arithmetic intensity is low and
    the torch implementation materializes fp32 norm statistics; conv
    utilization on A100 for these shapes is bandwidth-limited).
  - enable_model_cpu_offload (the reference's eval/demo default,
    app.py:163, run_cogvideox_FrameIn_mass_evaluation.py:108) moves
    each component's weights host->device once per clip: ~10 GB fp16
    DiT over ~20 GB/s effective PCIe 4.0 = ~0.5 s, VAE ~0.3 GB — small
    but counted.
  - No CFG batching for Wan (the reference runs 2 SEQUENTIAL forwards,
    pipeline_wan_i2v_motion_FrameINO.py:862-882); CogVideoX batch-
    doubles (one call on 2B).

Prints the full derivation + JSON. CPU-only (abstract tracing).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

A100_PEAK = 312e12
DIT_MFU = 0.40
VAE_MFU = 0.25
PCIE_GBPS = 20.0


def wan_flops():
    import jax
    import jax.numpy as jnp

    from frameino_tpu.core.flops import count_flops
    from frameino_tpu.models import wan_dit, wan_vae

    cfg = wan_dit.WAN22_TI2V_5B_MOTION
    vcfg = wan_vae.WAN22_VAE_CONFIG
    B, F, H, W = 1, 13, 30, 52          # 49f @ 480x832 latents
    NID = 1
    S_frame = (H // 2) * (W // 2)
    S = (F + NID) * S_frame

    dit_struct = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, jnp.bfloat16),
        jax.eval_shape(lambda k: wan_dit.init_wan_dit(k, cfg),
                       jax.random.key(0)))
    x = jax.ShapeDtypeStruct((B, cfg.in_channels, F + NID, H, W),
                             jnp.bfloat16)
    ts = jax.ShapeDtypeStruct((B,), jnp.float32)
    text = jax.ShapeDtypeStruct((B, 512, cfg.text_dim), jnp.bfloat16)
    mask = jax.ShapeDtypeStruct((B, S), jnp.float32)
    fwd = count_flops(
        lambda p, a, t, e, m: wan_dit.wan_dit_forward(
            cfg, p, a, t, e, timestep_mask=m, attn_impl="xla"),
        dit_struct, x, ts, text, mask).flops

    vae_struct = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, jnp.bfloat16),
        jax.eval_shape(lambda k: wan_vae.init_wan_vae(k, vcfg),
                       jax.random.key(0)))
    z = jax.ShapeDtypeStruct((1, vcfg.z_dim, F, H, W), jnp.float32)
    dec = count_flops(lambda p, a: wan_vae.decode(vcfg, p, a),
                      vae_struct, z).flops
    px = jax.ShapeDtypeStruct((1, 3, 49, 480, 832), jnp.float32)
    enc = count_flops(
        lambda p, a: wan_vae.encode(vcfg, p, a, sample_mode="argmax"),
        vae_struct, px).flops
    return {"dit_fwd": fwd, "vae_decode": dec, "vae_encode_49f": enc}


def cog_flops():
    import jax
    import jax.numpy as jnp

    from frameino_tpu.core.flops import count_flops
    from frameino_tpu.models import cogvideox_dit, cogvideox_vae

    cfg = cogvideox_dit.COGVIDEOX_5B_I2V_FRAMEINO
    vcfg = cogvideox_vae.COGVIDEOX_VAE_CONFIG
    B, F, H, W = 2, 13, 56, 80          # CFG batch-doubled; 448x640/8
    NID = 1

    dit_struct = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, jnp.bfloat16),
        jax.eval_shape(lambda k: cogvideox_dit.init_cogvideox_dit(k, cfg),
                       jax.random.key(0)))
    x = jax.ShapeDtypeStruct((B, F + NID, cfg.in_channels, H, W),
                             jnp.bfloat16)
    ts = jax.ShapeDtypeStruct((B,), jnp.float32)
    text = jax.ShapeDtypeStruct((B, cfg.max_text_seq_length,
                                 cfg.text_embed_dim), jnp.bfloat16)
    cos, sin = cogvideox_dit.cogvideox_rope(
        cfg, F, H, W, duplicate_first_frame_for_id=True)
    fwd = count_flops(
        lambda p, a, t, e: cogvideox_dit.cogvideox_forward(
            cfg, p, a, e, t, image_rotary_emb=(cos, sin),
            attn_impl="xla"),
        dit_struct, x, ts, text).flops

    vae_struct = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, jnp.bfloat16),
        jax.eval_shape(
            lambda k: cogvideox_vae.init_cogvideox_vae(k, vcfg),
            jax.random.key(0)))
    z = jax.ShapeDtypeStruct((1, vcfg.latent_channels, F, H, W),
                             jnp.float32)
    dec = count_flops(lambda p, a: cogvideox_vae.decode(vcfg, p, a),
                      vae_struct, z).flops
    return {"dit_fwd_cfg_pair": fwd, "vae_decode": dec}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json_only", action="store_true")
    args = ap.parse_args()
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")

    w = wan_flops()
    c = cog_flops()

    # ---- Wan 49f@480x832 FrameINO (bench.py's config) ----
    wan_step = 2 * w["dit_fwd"]            # 2 sequential CFG forwards
    wan_step_s = wan_step / (A100_PEAK * DIT_MFU)
    wan_steps_per_s = 1.0 / wan_step_s
    wan_e2e = (50 * wan_step_s
               + (w["vae_decode"] + 2.2 * w["vae_encode_49f"])
               / (A100_PEAK * VAE_MFU)
               + 10.0 / PCIE_GBPS + 0.3 / PCIE_GBPS)
    # encodes: first frame + traj video + ID frame ~= 2.2x one 49f
    # encode (traj is full length; first/ID are single frames)

    # ---- Cog 49f@448x640 protocol (bench_cog_e2e's config) ----
    cog_step_s = c["dit_fwd_cfg_pair"] / (A100_PEAK * DIT_MFU)
    cog_e2e = (50 * cog_step_s
               + c["vae_decode"] / (A100_PEAK * VAE_MFU)
               + 10.0 / PCIE_GBPS + 0.3 / PCIE_GBPS)

    out = {
        "assumptions": {"a100_peak_tflops": A100_PEAK / 1e12,
                        "dit_mfu": DIT_MFU, "vae_mfu": VAE_MFU,
                        "pcie_gbps": PCIE_GBPS},
        "wan_49f_480x832": {
            "dit_fwd_tflop": round(w["dit_fwd"] / 1e12, 1),
            "cfg_step_tflop": round(wan_step / 1e12, 1),
            "a100_sec_per_step": round(wan_step_s, 3),
            "a100_denoise_steps_per_sec": round(wan_steps_per_s, 3),
            "vae_decode_tflop": round(w["vae_decode"] / 1e12, 1),
            "vae_encode_49f_tflop": round(w["vae_encode_49f"] / 1e12, 1),
            "a100_e2e_50step_s": round(wan_e2e, 1),
        },
        "cog_49f_448x640": {
            "cfg_pair_fwd_tflop": round(c["dit_fwd_cfg_pair"] / 1e12, 1),
            "a100_sec_per_step": round(cog_step_s, 3),
            "vae_decode_tflop": round(c["vae_decode"] / 1e12, 1),
            "a100_e2e_50step_s": round(cog_e2e, 1),
        },
        "sensitivity": {
            "dit_mfu_0.45_wan_steps_per_sec": round(
                (A100_PEAK * 0.45) / wan_step, 3),
            "dit_mfu_0.35_wan_steps_per_sec": round(
                (A100_PEAK * 0.35) / wan_step, 3),
        },
    }
    print(json.dumps(out, indent=None if args.json_only else 2))


if __name__ == "__main__":
    main()
