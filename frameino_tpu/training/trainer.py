"""Wan FrameINO trainer: pjit data/fsdp/tp-parallel flow-matching step.

Reference hot loop: ``train_code/train_wan_motion_FrameINO.py:1128-1253``.
Recipe reproduced exactly:
  1. frozen-VAE encodes of video / masked first frame / trajectory / ID
     (``video_tensor_to_vae_latent`` etc., ``:507-657``) — argmax mode,
     latents_mean/std normalization;
  2. first-frame substitution into BOTH x0 and the noisy input
     (``:1155, 1198``);
  3. rank-stratified SCALAR timesteps (``:1186-1188`` — note training
     uses 1-D timesteps even for Wan2.2 TI2V), sigma lookup, FM noising
     ``(1-σ)x0 + σε`` (``:1193-1194``);
  4. ID frame-concat + traj channel-concat (``:1204, 1210``);
  5. bf16 forward, drop ID predictions, fp32 MSE against ``ε − x0``
     (``:1215-1237``);
  6. global-norm clip 1.0 + AdamW (``:1245-1252``) — clip runs inside
     optax; the gradient all-reduce over dp is inserted by GSPMD.

TPU redesign: the whole step (VAE encodes included) is ONE jit program
over a (dp, fsdp, tp, sp, pp) mesh; no host round-trips inside the step.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from frameino_tpu.models import wan_dit, wan_vae
from frameino_tpu.parallel.sharding import (constrain, dit_param_specs,
                                            shard_pytree)
from frameino_tpu.schedulers.flow_match_euler import (FlowMatchEulerConfig,
                                                      flow_match_sigmas)
from frameino_tpu.training.noise_sampler import stratified_timestep_indices
from frameino_tpu.training.optim import OptimizerConfig, make_optimizer

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    scheduler: FlowMatchEulerConfig = FlowMatchEulerConfig()
    optimizer: OptimizerConfig = OptimizerConfig()
    train_sampling_steps: int = 1000
    use_frame_in: bool = True
    compute_dtype: Any = jnp.bfloat16
    remat: bool = True
    attn_impl: Optional[str] = None
    # Frozen-VAE encode conv materialization dtype. None = follow
    # compute_dtype (torch-autocast semantics: the reference's encode
    # runs inside the SAME bf16 autocast context as the DiT,
    # train_wan_motion_FrameINO.py:507-657). Under bf16 this halves the
    # near-full-res encoder activation temps: the 480x832x49f step
    # program drops from a 20.3 GB OOM to fitting a 16 GB v5e chip
    # (scripts/bench_train.py). An fp32-compute trainer keeps fp32
    # encodes.
    vae_encode_accum_dtype: Optional[Any] = None
    # In-graph chunked VAE encode (1 + 4k pixel-frame chunks, the
    # reference's own streaming protocol): None = full-sequence.
    vae_encode_chunk_frames: Optional[int] = 8


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Params
    opt_state: Any
    step: jax.Array


def init_train_state(dit_params: Params, opt: optax.GradientTransformation
                     ) -> TrainState:
    return TrainState(params=dit_params, opt_state=opt.init(dit_params),
                      step=jnp.zeros((), jnp.int32))


def encode_training_batch(vae_cfg: wan_vae.WanVAEConfig, vae_params: Params,
                          batch: Dict[str, jax.Array],
                          encode_chunk_frames: Optional[int] = 8):
    """Frozen-VAE encodes (reference :507-657, argmax + normalization).

    batch tensors, reference dataset layout:
      video_tensor       [B, F, C, H, W] in [-1, 1]
      first_frame_tensor [B, C, H, W]    masked unbounded canvas
      traj_tensor        [B, F, C, H, W]
      ID_tensor          [B, N_id, C, H, W] (optional)
    """
    def enc(v_cf):
        if v_cf.shape[2] > 1 and encode_chunk_frames:
            # in-graph chunked encode: peak activation memory = one
            # chunk, not the whole clip (16 GB OOM otherwise at
            # 480x832x49f — scripts/bench_train.py); numerics == the
            # full-sequence encode (chunk protocol equivalence,
            # tests/test_vae_streaming.py)
            from frameino_tpu.models import wan_vae_streaming
            moments = wan_vae_streaming.encode_moments_inline(
                vae_cfg, vae_params, v_cf,
                chunk_pixel_frames=encode_chunk_frames)
            z = jnp.split(moments, 2, axis=1)[0]   # argmax == mean
        else:
            z = wan_vae.encode(vae_cfg, vae_params, v_cf,
                               sample_mode="argmax")
        return wan_vae.normalize_latents(vae_cfg, z)

    def after(dep, x):
        # The three encodes are data-independent, so XLA's scheduler
        # overlaps them — tripling the live near-full-res encoder temps
        # and OOMing the 16 GB train-step program. Threading each
        # encode's OUTPUT through an optimization_barrier with the next
        # encode's INPUT forces them to run one at a time (peak = one
        # encode's temps, measured scripts/bench_train.py).
        return jax.lax.optimization_barrier((dep, x))[1] if dep is not None \
            else x

    video = batch["video_tensor"].transpose(0, 2, 1, 3, 4)   # -> B,C,F,H,W
    traj = batch["traj_tensor"].transpose(0, 2, 1, 3, 4)
    video_latents = enc(video)
    first_frame_latent = enc(after(video_latents,
                                   batch["first_frame_tensor"][:, :, None]))
    traj_latents = enc(after(first_frame_latent, traj))

    id_latents = None
    if batch.get("ID_tensor") is not None:
        idt = batch["ID_tensor"].transpose(0, 2, 1, 3, 4)    # B,C,N,H,W
        dep = traj_latents
        encoded = []
        for i in range(idt.shape[2]):
            encoded.append(enc(after(dep, idt[:, :, i:i + 1])))
            dep = encoded[-1]
        id_latents = jnp.concatenate(encoded, axis=2)
    return video_latents, first_frame_latent, traj_latents, id_latents


def wan_fm_loss(dit_cfg: wan_dit.WanDiTConfig, cfg: TrainerConfig,
                dit_params: Params,
                video_latents, first_frame_latent, traj_latents, id_latents,
                prompt_embeds, key, *, dp_size: int = 1, mesh=None):
    """Flow-matching loss (reference :1185-1237). Returns scalar fp32."""
    B = video_latents.shape[0]
    num_gen_frames = video_latents.shape[2]
    sigmas_table = jnp.asarray(flow_match_sigmas(cfg.scheduler))
    timesteps_table = sigmas_table * cfg.scheduler.num_train_timesteps

    k_idx, k_noise = jax.random.split(key)
    idx = stratified_timestep_indices(k_idx, B, cfg.train_sampling_steps,
                                      world_size=dp_size)
    timesteps = timesteps_table[idx]                       # [B] scalar ts
    sigma = sigmas_table[idx].reshape(B, 1, 1, 1, 1)

    # first-frame substitution into x0 (reference :1155)
    x0 = jnp.concatenate([first_frame_latent, video_latents[:, :, 1:]],
                         axis=2)
    noise = jax.random.normal(k_noise, x0.shape, jnp.float32)
    noisy = (1.0 - sigma) * x0 + sigma * noise
    # clean first frame in the model input (reference :1198)
    noisy = jnp.concatenate([first_frame_latent, noisy[:, :, 1:]], axis=2)

    if id_latents is not None:
        model_in = jnp.concatenate([noisy, id_latents], axis=2)
        traj_in = jnp.concatenate(
            [traj_latents, jnp.zeros_like(id_latents)], axis=2)
    else:
        model_in = noisy
        traj_in = traj_latents
    model_in = jnp.concatenate([model_in, traj_in], axis=1)
    model_in = constrain(model_in.astype(cfg.compute_dtype), mesh, "video")

    pred = wan_dit.wan_dit_forward(
        dit_cfg, dit_params, model_in, timesteps,
        prompt_embeds.astype(cfg.compute_dtype),
        attn_impl=cfg.attn_impl, differentiable=True, remat=cfg.remat,
        mesh=mesh)
    pred = pred[:, :, :num_gen_frames]

    target = (noise - x0).astype(jnp.float32)
    return jnp.mean(jnp.square(pred.astype(jnp.float32) - target))


def make_train_step(dit_cfg: wan_dit.WanDiTConfig,
                    vae_cfg: wan_vae.WanVAEConfig,
                    cfg: TrainerConfig,
                    opt: optax.GradientTransformation,
                    mesh=None, dp_size: int = 1):
    """Build the jitted train step: (state, vae_params, batch, key) ->
    (state, metrics). Batch may carry raw pixel tensors (VAE encode runs
    inside the step) or precomputed ``*_latents``."""

    def step_fn(state: TrainState, vae_params: Params,
                batch: Dict[str, jax.Array], key: jax.Array):
        if "video_latents" in batch:
            enc = (batch["video_latents"], batch["first_frame_latent"],
                   batch["traj_latents"], batch.get("id_latents"))
        else:
            from frameino_tpu.ops.conv import conv_accum_dtype
            enc_dtype = (cfg.vae_encode_accum_dtype
                         if cfg.vae_encode_accum_dtype is not None
                         else cfg.compute_dtype)
            with conv_accum_dtype(enc_dtype):
                enc = encode_training_batch(
                    vae_cfg, vae_params, batch,
                    encode_chunk_frames=cfg.vae_encode_chunk_frames)
        video_latents, first_frame_latent, traj_latents, id_latents = enc

        key = jax.random.fold_in(key, state.step)

        def loss_fn(params):
            return wan_fm_loss(dit_cfg, cfg, params, video_latents,
                               first_frame_latent, traj_latents, id_latents,
                               batch["prompt_embeds"], key,
                               dp_size=dp_size, mesh=mesh)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        if mesh is not None:
            from frameino_tpu.parallel.sharding import constrain_like_params
            grads = constrain_like_params(grads, mesh)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss,
                   "grad_norm": optax.global_norm(grads)}
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def make_sharded_train_state(dit_params: Params,
                             opt: optax.GradientTransformation,
                             mesh) -> TrainState:
    """Shard params first, THEN opt.init — the Adam moments inherit the
    fsdp/tp layout of their parameters automatically (ZeRO-3-style
    optimizer-state sharding with zero extra code)."""
    params = shard_pytree(dit_params, mesh)
    return init_train_state(params, opt)
