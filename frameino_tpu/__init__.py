"""FrameINO-TPU: a TPU-native (JAX/XLA/Pallas) controllable image-to-video framework.

A from-scratch rebuild of the capabilities of UVA-Computer-Vision-Lab/FrameINO
(NeurIPS 2025, arXiv 2505.21491) designed for TPU hardware:

- Wan2.2-TI2V-5B and CogVideoX-I2V-5B video DiT denoisers as pure-functional
  JAX models with Pallas flash attention over video-latent tokens.
- The causal-3D-conv Wan video VAE reformulated as full-sequence XLA ops that
  are numerically identical to the reference's chunked streaming semantics.
- FlowMatch-Euler / v-pred DDIM / CogVideoX-DPM schedulers as pure step
  functions usable inside ``lax.scan``.
- FrameINO condition algebra (unbounded canvas, ID-reference tokens,
  trajectory latents) compiled as a single ``lax.scan`` denoise loop.
- pjit/shard_map parallelism over a ``jax.sharding.Mesh`` (dp/fsdp/tp/sp).

Layout:
    core/        mesh & sharding, dtype policy, PRNG, config, checkpointing
    ops/         rope, norms, attention (Pallas + XLA), conv, patching
    models/      wan_dit, cogvideox_dit, wan_vae, t5_encoder
    schedulers/  flow_match_euler, ddim (v-pred), cogvideox_dpm
    pipelines/   wan/cogvideox motion + FrameINO inference pipelines
    training/    trainers, losses, optimizers, channel surgery
    data/        dataset, trajectory rasterizer, samplers
    evaluation/  mass-evaluation harness + metrics
    app/         interactive demo front end
"""

__version__ = "0.1.0"
