"""CogVideoX FrameINO trainer: v-prediction recipe.

Reference hot loop: ``train_code/train_cogvideox_motion_FrameINO.py:
995-1135``. Recipe reproduced exactly:
  1. frozen-VAE encodes (posterior SAMPLE * scaling_factor, frame-first
     [B, F, z, h, w]); the masked first frame and the ID reference get
     log-normal augment noise sigma = exp(N(-3, 0.5)) BEFORE encoding
     (``:462-468, 523-529``); first-frame latent zero-padded over time;
  2. uniform timesteps; ``scheduler.add_noise`` DDIM noising (``:1056``);
  3. clean ID latent frame-concatenated onto the NOISY stream; zero
     padding appended to the first-frame and trajectory streams
     (``:1017-1026``); channel concat [noisy(+ID), first_frame, traj]
     (``:1071``);
  4. RoPE for the video grid + a copy of the first frame's block for the
     ID tokens (``:1090-1095``);
  5. model v-output converted to an x0 prediction via
     ``get_velocity(model_output, noisy, t)``; loss = mean over batch of
     SNR-weighted MSE ``1/(1-acum) * (x0_pred - x0)^2`` (``:1113-1129``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from frameino_tpu.models import cogvideox_dit, cogvideox_vae
from frameino_tpu.schedulers.ddim import (DDIMConfig, ddim_add_noise,
                                          ddim_alphas_cumprod)
from frameino_tpu.training.trainer import TrainState, init_train_state

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class CogTrainerConfig:
    scheduler: DDIMConfig = DDIMConfig()
    use_frame_in: bool = True
    compute_dtype: Any = jnp.bfloat16
    remat: bool = True
    attn_impl: Optional[str] = None
    augment_noise: bool = True
    # Frozen-VAE encode materialization dtype; None = follow
    # compute_dtype (torch-autocast semantics — the reference's encode
    # runs inside the same bf16 autocast context as the DiT) and the
    # HBM fix that lets the full-res step fit one 16 GB chip; see
    # training/trainer.py TrainerConfig.vae_encode_accum_dtype.
    vae_encode_accum_dtype: Optional[Any] = None


def _augment(key, x):
    """log-normal augment noise sigma = exp(N(-3, 0.5)) (reference
    ``:462-466``)."""
    k1, k2 = jax.random.split(key)
    sigma = jnp.exp(-3.0 + 0.5 * jax.random.normal(k1, (1,)))
    return x + jax.random.normal(k2, x.shape, x.dtype) * sigma


def encode_training_batch(cfg: CogTrainerConfig,
                          vae_cfg: cogvideox_vae.CogVideoXVAEConfig,
                          vae_params: Params, batch: Dict[str, jax.Array],
                          key: jax.Array):
    """Frozen-VAE encodes, frame-first latents * scaling_factor."""
    sf = vae_cfg.scaling_factor
    ks = jax.random.split(key, 8)

    def enc(v_cf, k):
        z = cogvideox_vae.encode(vae_cfg, vae_params, v_cf,
                                 sample_mode="sample", key=k)
        return (z * sf).transpose(0, 2, 1, 3, 4)

    video = batch["video_tensor"].transpose(0, 2, 1, 3, 4)
    traj = batch["traj_tensor"].transpose(0, 2, 1, 3, 4)
    video_latents = enc(video, ks[0])
    traj_latents = enc(traj, ks[1])

    first = batch["first_frame_tensor"][:, :, None]
    if cfg.augment_noise:
        first = _augment(ks[2], first)
    first_lat = enc(first, ks[3])                       # [B,1,z,h,w]
    pad = jnp.zeros((first_lat.shape[0], video_latents.shape[1] - 1,
                     *first_lat.shape[2:]), first_lat.dtype)
    first_frame_latent = jnp.concatenate([first_lat, pad], axis=1)

    id_latent = None
    if cfg.use_frame_in and batch.get("ID_tensor") is not None:
        idf = batch["ID_tensor"]
        if idf.ndim == 5:                               # [B,N,C,H,W] -> first
            idf = idf[:, 0]
        idf = idf[:, :, None]
        if cfg.augment_noise:
            idf = _augment(ks[4], idf)
        id_latent = enc(idf, ks[5])                     # [B,1,z,h,w]
    return video_latents, first_frame_latent, traj_latents, id_latent


def cog_vpred_loss(dit_cfg: cogvideox_dit.CogVideoXConfig,
                   cfg: CogTrainerConfig, dit_params: Params,
                   video_latents, first_frame_latent, traj_latents,
                   id_latent, prompt_embeds, key, mesh=None) -> jax.Array:
    B, F, z, h, w = video_latents.shape
    ac = jnp.asarray(ddim_alphas_cumprod(cfg.scheduler), jnp.float32)

    k_t, k_n = jax.random.split(key)
    t = jax.random.randint(k_t, (B,), 0,
                           cfg.scheduler.num_train_timesteps)
    noise = jax.random.normal(k_n, video_latents.shape, jnp.float32)
    noisy = ddim_add_noise(ac, video_latents.astype(jnp.float32), noise, t)

    if id_latent is not None:
        model_in = jnp.concatenate([noisy, id_latent], axis=1)
        pad = jnp.zeros_like(id_latent)
        ff = jnp.concatenate([first_frame_latent, pad], axis=1)
        tj = jnp.concatenate([traj_latents, pad], axis=1)
    else:
        model_in = noisy
        ff, tj = first_frame_latent, traj_latents
    model_in = jnp.concatenate([model_in, ff, tj], axis=2)

    cos, sin = cogvideox_dit.cogvideox_rope(
        dit_cfg, F, h, w, duplicate_first_frame_for_id=id_latent is not None)

    pred = cogvideox_dit.cogvideox_forward(
        dit_cfg, dit_params, model_in.astype(cfg.compute_dtype),
        prompt_embeds.astype(cfg.compute_dtype), t.astype(jnp.float32),
        image_rotary_emb=(cos, sin), attn_impl=cfg.attn_impl,
        differentiable=True, remat=cfg.remat, mesh=mesh)
    pred = pred.astype(jnp.float32)[:, :F]

    # v-output -> x0 prediction (get_velocity(model_output, noisy, t))
    a = jnp.sqrt(ac[t]).reshape(B, 1, 1, 1, 1)
    b = jnp.sqrt(1.0 - ac[t]).reshape(B, 1, 1, 1, 1)
    x0_pred = a * noisy - b * pred
    weights = 1.0 / (1.0 - ac[t]).reshape(B, 1, 1, 1, 1)
    target = video_latents.astype(jnp.float32)
    per_example = jnp.mean(
        (weights * jnp.square(x0_pred - target)).reshape(B, -1), axis=1)
    return jnp.mean(per_example)


def make_cog_train_step(dit_cfg: cogvideox_dit.CogVideoXConfig,
                        vae_cfg: cogvideox_vae.CogVideoXVAEConfig,
                        cfg: CogTrainerConfig,
                        opt: optax.GradientTransformation,
                        mesh=None):
    def step_fn(state: TrainState, vae_params: Params,
                batch: Dict[str, jax.Array], key: jax.Array):
        key = jax.random.fold_in(key, state.step)
        k_enc, k_loss = jax.random.split(key)
        from frameino_tpu.ops.conv import conv_accum_dtype
        enc_dtype = (cfg.vae_encode_accum_dtype
                     if cfg.vae_encode_accum_dtype is not None
                     else cfg.compute_dtype)
        with conv_accum_dtype(enc_dtype):
            enc = encode_training_batch(cfg, vae_cfg, vae_params, batch,
                                        k_enc)
        video_latents, first_frame_latent, traj_latents, id_latent = enc

        def loss_fn(params):
            return cog_vpred_loss(dit_cfg, cfg, params, video_latents,
                                  first_frame_latent, traj_latents,
                                  id_latent, batch["prompt_embeds"], k_loss,
                                  mesh=mesh)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        if mesh is not None:
            from frameino_tpu.parallel.sharding import constrain_like_params
            grads = constrain_like_params(grads, mesh)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), \
            {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return jax.jit(step_fn, donate_argnums=(0,))
