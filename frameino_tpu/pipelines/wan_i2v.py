"""Wan image-to-video pipelines (motion-only and FrameINO) — TPU-native.

Reference: ``pipelines/pipeline_wan_i2v_motion.py`` and
``pipelines/pipeline_wan_i2v_motion_FrameINO.py``. The condition algebra
is reproduced exactly; the execution model is redesigned for TPU:

- The reference runs a Python loop over 50 denoise steps with TWO
  sequential transformer calls per step (cond, uncond — reference
  ``:862-882``) and an ``xm.mark_step`` per iteration (``:907``). Here
  the whole denoise loop is ONE ``lax.scan`` compiled by XLA, and CFG is
  batch-stacked so each step is a single forward over batch 2B.
- VAE condition encodes (canvas first frame, trajectory video, per-frame
  ID reference — reference ``prepare_latents`` ``:400-553``) run on
  device via the full-sequence WanVAE.
- Wan2.2 ``expand_timesteps`` path: per-step blend of the clean
  first-frame condition (``:829``) and the per-token timestep vector
  ``(mask[..., ::2, ::2] * t).flatten()`` (``:832-843``), ID latents
  appended on the frame axis (``:852-854``), trajectory latents
  concatenated on channels (``:857-858``), ID predictions discarded
  (``:886``), final re-blend (``:912-913``).
- Two-expert denoising (``transformer``/``transformer_2`` +
  ``boundary_ratio``, reference ``:804-823``) is handled by splitting
  the (statically known) timestep schedule into high/low-noise segments
  and scanning each expert over its own segment — no per-step branching
  inside the compiled graph.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from frameino_tpu.models import wan_dit, wan_vae
from frameino_tpu.schedulers.flow_match_euler import (FlowMatchEulerConfig,
                                                      euler_step,
                                                      inference_sigmas)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class WanPipelineConfig:
    expand_timesteps: bool = True          # Wan2.2 TI2V path
    boundary_ratio: Optional[float] = None
    scheduler: FlowMatchEulerConfig = FlowMatchEulerConfig()

    @property
    def vae_scale_factor_temporal(self) -> int:
        return 4


def latent_shape(vae_cfg: wan_vae.WanVAEConfig, batch: int, num_frames: int,
                 height: int, width: int) -> Tuple[int, ...]:
    f = (num_frames - 1) // vae_cfg.scale_factor_temporal + 1
    return (batch, vae_cfg.z_dim, f,
            height // vae_cfg.scale_factor_spatial,
            width // vae_cfg.scale_factor_spatial)


def round_num_frames(num_frames: int, temporal: int = 4) -> int:
    """Frame rounding to 4N+1 (reference ``:707-712``)."""
    if num_frames % temporal != 1:
        num_frames = num_frames // temporal * temporal + 1
    return max(num_frames, 1)


# ---------------------------------------------------------------------------
# Condition preparation (device; VAE encodes)
# ---------------------------------------------------------------------------

def prepare_conditions(vae_cfg: wan_vae.WanVAEConfig, vae_params: Params,
                       image: jax.Array,
                       traj_video: Optional[jax.Array],
                       id_frames: Optional[jax.Array]):
    """VAE-encode the FrameINO conditions (reference ``prepare_latents``
    ``:400-553``), all in argmax (posterior-mode) mode.

    image: [B, 3, H, W] in [-1, 1] (masked unbounded canvas).
    traj_video: [B, 3, T, H, W] rasterized trajectory video or None.
    id_frames: [B, 3, N_id, H, W] padded ID reference frames or None.

    Returns (condition_latent [B,z,1,h,w], traj_latents [B,z,f(+N),h,w],
    id_latents [B,z,N,h,w] or None) — all normalized by latents_mean/std.
    """
    def enc(v):
        z = wan_vae.encode(vae_cfg, vae_params, v, sample_mode="argmax")
        return wan_vae.normalize_latents(vae_cfg, z)

    def enc_clip(v):
        # multi-frame clips get the memory-bounded hybrid (tiled x
        # temporally-streamed) encode: a full-sequence 49f traj encode
        # at eval resolutions OOMs a 16 GB chip next to the resident
        # DiT (the trainer needed the same fix — encode_moments_inline).
        # hybrid == full numerically (tests/test_vae_tiling.py).
        B_, _C, T, Hp, Wp = v.shape
        if T <= 9 or Hp < 256 or Wp < 256:
            return enc(v)       # small clips/canvases: one program
        from frameino_tpu.models.wan_vae_tiling import hybrid_encode
        moments = hybrid_encode(vae_cfg, vae_params, v, tile_min=256,
                                tile_stride=192, chunk_pixel_frames=16)
        mean = moments[:, :vae_cfg.z_dim]                  # argmax mode
        return wan_vae.normalize_latents(vae_cfg, mean)

    condition = enc(image[:, :, None])                     # single frame
    traj_latents = enc_clip(traj_video) if traj_video is not None \
        else None

    id_latents = None
    if id_frames is not None and id_frames.shape[2] > 0:
        # each ID frame encoded independently as a single-frame clip
        # (reference ``:489-524``)
        n = id_frames.shape[2]
        encoded = [enc(id_frames[:, :, i:i + 1]) for i in range(n)]
        id_latents = jnp.concatenate(encoded, axis=2)
        if traj_latents is not None:
            pad = jnp.zeros_like(id_latents)
            traj_latents = jnp.concatenate([traj_latents, pad], axis=2)
    return condition, traj_latents, id_latents


def build_first_frame_mask(num_latent_frames: int, latent_h: int,
                           latent_w: int) -> jax.Array:
    """[1, 1, F, h, w]: 0 on frame 0 (clean condition), 1 elsewhere
    (reference ``:528-535``)."""
    mask = jnp.ones((1, 1, num_latent_frames, latent_h, latent_w),
                    jnp.float32)
    return mask.at[:, :, 0].set(0.0)


def prepare_conditions_wan21(vae_cfg: wan_vae.WanVAEConfig,
                             vae_params: Params,
                             image: jax.Array, num_frames: int,
                             traj_video: Optional[jax.Array] = None,
                             last_image: Optional[jax.Array] = None):
    """Wan2.1 I2V conditioning (reference ``:437-446, 539-553``): encode
    [image, zeros x (F-1)] as a full clip, then channel-concat the
    temporal condition mask (first frame 1, repeated into the 4x latent
    stride; 4 mask channels per latent frame).

    Returns (condition [B, 4+z, f, h, w], traj_latents or None).
    """
    B = image.shape[0]
    H, W = image.shape[2], image.shape[3]
    tscale = vae_cfg.scale_factor_temporal

    if last_image is None:
        video_condition = jnp.concatenate(
            [image[:, :, None],
             jnp.zeros((B, image.shape[1], num_frames - 1, H, W),
                       image.dtype)], axis=2)
    else:
        # first+last frame conditioning (reference :441-446)
        video_condition = jnp.concatenate(
            [image[:, :, None],
             jnp.zeros((B, image.shape[1], num_frames - 2, H, W),
                       image.dtype),
             last_image[:, :, None]], axis=2)
    z = wan_vae.encode(vae_cfg, vae_params, video_condition,
                       sample_mode="argmax")
    latent_condition = wan_vae.normalize_latents(vae_cfg, z)
    f_lat, lh, lw = latent_condition.shape[2:]

    # mask_lat_size construction (reference :540-552)
    mask = jnp.ones((B, 1, num_frames, lh, lw), jnp.float32)
    if last_image is None:
        mask = mask.at[:, :, 1:].set(0.0)
    else:
        mask = mask.at[:, :, 1:-1].set(0.0)
    first = jnp.repeat(mask[:, :, 0:1], tscale, axis=2)
    mask = jnp.concatenate([first, mask[:, :, 1:]], axis=2)
    mask = mask.reshape(B, -1, tscale, lh, lw).transpose(0, 2, 1, 3, 4)

    condition = jnp.concatenate([mask, latent_condition], axis=1)
    traj_latents = None
    if traj_video is not None:
        zt = wan_vae.encode(vae_cfg, vae_params, traj_video,
                            sample_mode="argmax")
        traj_latents = wan_vae.normalize_latents(vae_cfg, zt)
    return condition, traj_latents


def denoise_segment_wan21(dit_cfg: wan_dit.WanDiTConfig, dit_params: Params,
                          latents: jax.Array, condition: jax.Array,
                          traj_latents: Optional[jax.Array],
                          context_2b: jax.Array,
                          image_embeds: Optional[jax.Array],
                          sigmas: jax.Array, sigmas_next: jax.Array,
                          timesteps: jax.Array, guidance_scale: float,
                          attn_impl: Optional[str] = None) -> jax.Array:
    """Wan2.1 denoise segment (reference non-expand branch ``:845-848``):
    channel-concat conditioning, SCALAR timesteps, optional CLIP image
    embeds through the I2V cross-attention branch."""
    B = latents.shape[0]
    do_cfg = guidance_scale > 1.0

    # Text (and CLIP-image) K/V are loop-invariant across denoise steps:
    # project them once per segment instead of once per step
    # (wan_dit.precompute_text_kv; exact equality with the in-step path).
    if do_cfg:
        img2 = None if image_embeds is None else jnp.concatenate(
            [image_embeds, image_embeds], axis=0)
        text_kv = wan_dit.precompute_text_kv(
            dit_cfg, dit_params, context_2b, img2, dtype=latents.dtype)
    else:
        text_kv = wan_dit.precompute_text_kv(
            dit_cfg, dit_params, context_2b[:B], image_embeds,
            dtype=latents.dtype)

    def step(carry, xs):
        latents = carry
        sigma, sigma_next, t = xs
        latent_in = jnp.concatenate([latents, condition], axis=1)
        if traj_latents is not None:
            latent_in = jnp.concatenate([latent_in, traj_latents], axis=1)
        ts = jnp.broadcast_to(t, (B,))
        if do_cfg:
            model_in = jnp.concatenate([latent_in, latent_in], axis=0)
            ts2 = jnp.concatenate([ts, ts], axis=0)
            pred = wan_dit.wan_dit_forward(
                dit_cfg, dit_params, model_in, ts2, None,
                attn_impl=attn_impl, text_kv=text_kv)
            pred_cond, pred_uncond = jnp.split(pred, 2, axis=0)
            noise_pred = pred_uncond + guidance_scale * (pred_cond
                                                         - pred_uncond)
        else:
            noise_pred = wan_dit.wan_dit_forward(
                dit_cfg, dit_params, latent_in, ts, None,
                attn_impl=attn_impl, text_kv=text_kv)
        return euler_step(latents, noise_pred, sigma, sigma_next), None

    latents, _ = jax.lax.scan(step, latents,
                              (sigmas, sigmas_next, timesteps))
    return latents


# ---------------------------------------------------------------------------
# Denoise loop (jittable)
# ---------------------------------------------------------------------------

def _per_token_timesteps(mask_adjust: jax.Array, t, patch_hw: int = 2):
    """(mask[0,0][:, ::p, ::p] * t).flatten() (reference ``:832-843``)."""
    sub = mask_adjust[0, 0][:, ::patch_hw, ::patch_hw]
    return (sub * t).reshape(-1)


def denoise_segment(dit_cfg: wan_dit.WanDiTConfig, dit_params: Params,
                    latents: jax.Array,
                    condition: jax.Array,
                    traj_latents: Optional[jax.Array],
                    id_latents: Optional[jax.Array],
                    first_frame_mask: jax.Array,
                    context_2b: jax.Array,
                    sigmas: jax.Array, sigmas_next: jax.Array,
                    timesteps: jax.Array,
                    guidance_scale: float,
                    attn_impl: Optional[str] = None,
                    cfg_sequential: bool = False,
                    mesh=None) -> jax.Array:
    """Scan one expert over its timestep segment.

    latents: [B, z, F, h, w]; context_2b: [2B, L, text_dim] (cond; uncond).
    sigmas/sigmas_next/timesteps: [steps] fp32 arrays for this segment.
    ``cfg_sequential`` runs cond and uncond as two batch-B forwards
    instead of one batch-2B call — halves activation memory, required
    for the flagship 704x1280x81f shape on a single 16G chip (the
    reference always runs sequentially, ``:862-882``).
    """
    B = latents.shape[0]
    num_gen_frames = latents.shape[2]
    lat_h, lat_w = latents.shape[3], latents.shape[4]
    do_cfg = guidance_scale > 1.0

    if id_latents is not None:
        id_pad_mask = jnp.ones((1, 1, id_latents.shape[2], lat_h, lat_w),
                               jnp.float32)
        mask_adjust = jnp.concatenate([first_frame_mask, id_pad_mask], axis=2)
    else:
        mask_adjust = first_frame_mask

    # Per-token timesteps are (mask * t) with only two distinct values
    # (reference :832-843) — pass the mask once and let the DiT select
    # between the two embedded levels per token (wan_dit.timestep_mask;
    # measured ~12% faster than materializing the [B,S,6,D] modulation).
    ts_mask = _per_token_timesteps(mask_adjust, 1.0,
                                   patch_hw=dit_cfg.patch_size[1])
    ts_mask_b = jnp.broadcast_to(ts_mask[None], (B, ts_mask.shape[0]))
    ts_mask_2b = jnp.concatenate([ts_mask_b, ts_mask_b], axis=0)

    # Hoist the per-block text K/V out of the step scan (loop-invariant;
    # wan_dit.precompute_text_kv). Single-chip serving only — under a
    # mesh the kv tree would need its own sharding constraints, and the
    # per-step projections there are dwarfed by collectives.
    kv_cond = kv_uncond = kv_2b = None
    if mesh is None:
        if do_cfg and cfg_sequential:
            kv = wan_dit.precompute_text_kv(dit_cfg, dit_params, context_2b,
                                            dtype=latents.dtype)
            kv_cond = jax.tree.map(lambda a: a[:, :B], kv)
            kv_uncond = jax.tree.map(lambda a: a[:, B:], kv)
        elif do_cfg:
            kv_2b = wan_dit.precompute_text_kv(dit_cfg, dit_params,
                                               context_2b,
                                               dtype=latents.dtype)
        else:
            kv_cond = wan_dit.precompute_text_kv(dit_cfg, dit_params,
                                                 context_2b[:B],
                                                 dtype=latents.dtype)

    def step(carry, xs):
        latents = carry
        sigma, sigma_next, t = xs

        latent_in = (1.0 - first_frame_mask) * condition \
            + first_frame_mask * latents
        if id_latents is not None:
            latent_in = jnp.concatenate([latent_in, id_latents], axis=2)
        if traj_latents is not None:
            latent_in = jnp.concatenate([latent_in, traj_latents], axis=1)

        t_b = jnp.broadcast_to(t, (B,))

        if do_cfg and cfg_sequential:
            pred_cond = wan_dit.wan_dit_forward(
                dit_cfg, dit_params, latent_in, t_b, context_2b[:B],
                timestep_mask=ts_mask_b, attn_impl=attn_impl, mesh=mesh,
                text_kv=kv_cond)
            pred_uncond = wan_dit.wan_dit_forward(
                dit_cfg, dit_params, latent_in, t_b, context_2b[B:],
                timestep_mask=ts_mask_b, attn_impl=attn_impl, mesh=mesh,
                text_kv=kv_uncond)
            noise_pred = pred_uncond + guidance_scale * (pred_cond - pred_uncond)
        elif do_cfg:
            model_in = jnp.concatenate([latent_in, latent_in], axis=0)
            pred = wan_dit.wan_dit_forward(
                dit_cfg, dit_params, model_in,
                jnp.concatenate([t_b, t_b], axis=0), context_2b,
                timestep_mask=ts_mask_2b, attn_impl=attn_impl, mesh=mesh,
                text_kv=kv_2b)
            pred_cond, pred_uncond = jnp.split(pred, 2, axis=0)
            noise_pred = pred_uncond + guidance_scale * (pred_cond - pred_uncond)
        else:
            noise_pred = wan_dit.wan_dit_forward(
                dit_cfg, dit_params, latent_in, t_b, context_2b[:B],
                timestep_mask=ts_mask_b, attn_impl=attn_impl, mesh=mesh,
                text_kv=kv_cond)

        noise_pred = noise_pred[:, :, :num_gen_frames]     # drop ID frames
        latents = euler_step(latents, noise_pred, sigma, sigma_next)
        return latents, None

    latents, _ = jax.lax.scan(step, latents,
                              (sigmas, sigmas_next, timesteps))
    return latents


@functools.partial(
    jax.jit,
    static_argnames=("dit_cfg", "dit_cfg_2", "guidance_scale",
                     "guidance_scale_2", "attn_impl", "split_idx",
                     "cfg_mode", "mesh"))
def denoise(dit_cfg: wan_dit.WanDiTConfig, dit_params: Params,
            latents: jax.Array, condition: jax.Array,
            traj_latents: Optional[jax.Array],
            id_latents: Optional[jax.Array],
            first_frame_mask: jax.Array,
            context: jax.Array, neg_context: jax.Array,
            sigmas: jax.Array, timesteps: jax.Array,
            guidance_scale: float = 5.0,
            attn_impl: Optional[str] = None,
            dit_cfg_2: Optional[wan_dit.WanDiTConfig] = None,
            dit_params_2: Optional[Params] = None,
            guidance_scale_2: Optional[float] = None,
            split_idx: int = 0,
            cfg_mode: str = "batch",
            mesh=None) -> jax.Array:
    """Full CFG denoise loop. sigmas: [steps+1]; timesteps: [steps].

    ``split_idx`` > 0 routes steps [0, split_idx) to ``dit_params`` (high
    noise) and the rest to ``dit_params_2`` (low noise) — the two-expert
    Wan2.2 path (reference ``:804-823``). With a ``mesh``, the DiT
    forwards run sharded (dp/fsdp/tp/sp/pp per the mesh axes); sharding
    BOTH expert param trees is the expert-parallel serving layout
    (per-chip params halve — ``parallel/sharding.py`` EP note).
    """
    context_2b = jnp.concatenate([context, neg_context], axis=0)
    seg = functools.partial(
        denoise_segment, condition=condition, traj_latents=traj_latents,
        id_latents=id_latents, first_frame_mask=first_frame_mask,
        context_2b=context_2b, attn_impl=attn_impl,
        cfg_sequential=cfg_mode == "sequential", mesh=mesh)

    if split_idx and dit_params_2 is not None:
        latents = seg(dit_cfg, dit_params, latents,
                      sigmas=sigmas[:split_idx],
                      sigmas_next=sigmas[1:split_idx + 1],
                      timesteps=timesteps[:split_idx],
                      guidance_scale=guidance_scale)
        latents = seg(dit_cfg_2 or dit_cfg, dit_params_2, latents,
                      sigmas=sigmas[split_idx:-1],
                      sigmas_next=sigmas[split_idx + 1:],
                      timesteps=timesteps[split_idx:],
                      guidance_scale=guidance_scale_2 or guidance_scale)
    else:
        latents = seg(dit_cfg, dit_params, latents,
                      sigmas=sigmas[:-1], sigmas_next=sigmas[1:],
                      timesteps=timesteps, guidance_scale=guidance_scale)

    # final re-blend (reference :912-913)
    return (1.0 - first_frame_mask) * condition + first_frame_mask * latents


# ---------------------------------------------------------------------------
# High-level pipeline
# ---------------------------------------------------------------------------

class WanImageToVideoPipeline:
    """User-facing pipeline mirroring the reference ``__call__`` contract
    (``pipeline_wan_i2v_motion_FrameINO.py:581-936``): masked-canvas image,
    trajectory tensor, optional ID frames, prompt embeddings -> video.

    Text encoding is pluggable: pass ``prompt_embeds`` directly or set
    ``text_encoder_fn`` (e.g. the UMT5 JAX encoder).
    """

    def __init__(self, dit_cfg: wan_dit.WanDiTConfig, dit_params: Params,
                 vae_cfg: wan_vae.WanVAEConfig, vae_params: Params,
                 pipe_cfg: WanPipelineConfig = WanPipelineConfig(),
                 text_encoder_fn=None,
                 image_encoder_fn=None,
                 dit_params_2: Optional[Params] = None,
                 quantize: Optional[str] = None,
                 quantize_vae: bool = False,
                 mesh=None):
        if quantize == "int8":
            # w8a8 serving config: 2x MXU throughput on v5e (measured
            # 1.39 vs 1.05 denoise steps/s on the 5B; models/quant.py)
            from frameino_tpu.models.quant import quantize_dit_int8
            dit_params = quantize_dit_int8(dit_params, donate=True)
            if dit_params_2 is not None:
                dit_params_2 = quantize_dit_int8(dit_params_2, donate=True)
        elif quantize is not None:
            raise ValueError(f"unsupported quantize={quantize!r}")
        if quantize_vae:
            # separate opt-in: pixel-facing, so certify per checkpoint
            # (scripts/certify_int8.py --quantize_vae); inner resblock/
            # resample convs only — conv_in/conv_out stay full precision
            from frameino_tpu.models.quant import quantize_wan_vae_int8
            vae_params = quantize_wan_vae_int8(vae_params)
        self.dit_cfg = dit_cfg
        self.dit_params = dit_params
        self.dit_params_2 = dit_params_2
        self.vae_cfg = vae_cfg
        self.vae_params = vae_params
        self.pipe_cfg = pipe_cfg
        self.text_encoder_fn = text_encoder_fn
        # CLIP vision tower for the Wan2.1 I2V image-KV branch (reference
        # pipeline_wan_i2v_motion.py:22,65-66); see
        # frameino_tpu/models/clip_vision.make_image_encoder_fn
        self.image_encoder_fn = image_encoder_fn
        # multi-chip serving: denoise forwards run sharded over this
        # mesh (dp/fsdp/tp/sp/pp); shard dit_params (and params_2) with
        # parallel.sharding.shard_pytree before constructing
        self.mesh = mesh

    def __call__(self,
                 image: jax.Array,
                 prompt_embeds: Optional[jax.Array] = None,
                 negative_prompt_embeds: Optional[jax.Array] = None,
                 prompt: Optional[str] = None,
                 negative_prompt: Optional[str] = None,
                 traj_tensor: Optional[jax.Array] = None,
                 id_tensor: Optional[jax.Array] = None,
                 height: int = 704,
                 width: int = 1280,
                 num_frames: int = 81,
                 num_inference_steps: int = 50,
                 guidance_scale: float = 5.0,
                 guidance_scale_2: Optional[float] = None,
                 key: Optional[jax.Array] = None,
                 latents: Optional[jax.Array] = None,
                 image_embeds: Optional[jax.Array] = None,
                 last_image: Optional[jax.Array] = None,
                 output_type: str = "np",
                 decode_mode: str = "full",
                 cfg_mode: str = "batch",
                 steps_per_program: Optional[int] = None,
                 attn_impl: Optional[str] = None):
        vae_cfg = self.vae_cfg
        num_frames = round_num_frames(num_frames,
                                      vae_cfg.scale_factor_temporal)

        if prompt_embeds is None:
            if self.text_encoder_fn is None:
                raise ValueError("need prompt_embeds or a text_encoder_fn")
            prompt_embeds = self.text_encoder_fn([prompt])
            negative_prompt_embeds = self.text_encoder_fn(
                [negative_prompt or ""])
        if negative_prompt_embeds is None:
            negative_prompt_embeds = jnp.zeros_like(prompt_embeds)

        B = prompt_embeds.shape[0]
        shape = latent_shape(vae_cfg, B, num_frames, height, width)
        if latents is None:
            key = key if key is not None else jax.random.key(0)
            latents = jax.random.normal(key, shape, jnp.float32)

        # traj tensor arrives [F, C, H, W] like the dataset emits; convert
        if traj_tensor is not None and traj_tensor.ndim == 4:
            traj_tensor = traj_tensor.transpose(1, 0, 2, 3)[None]
        if id_tensor is not None and id_tensor.ndim == 4:
            id_tensor = id_tensor[None]

        sched = self.pipe_cfg.scheduler
        sigmas_np, timesteps_np = inference_sigmas(sched, num_inference_steps)
        sigmas = jnp.asarray(sigmas_np)
        timesteps = jnp.asarray(timesteps_np)

        if (image_embeds is None and self.image_encoder_fn is not None
                and self.dit_cfg.image_dim is not None):
            image_embeds = self.image_encoder_fn(image)

        if not self.pipe_cfg.expand_timesteps:
            # Wan2.1 I2V path: mask+latent channel conditioning, scalar
            # timesteps (reference non-expand branch :437-446, :845-848)
            condition, traj_latents = prepare_conditions_wan21(
                vae_cfg, self.vae_params, image, num_frames, traj_tensor,
                last_image=last_image)
            context_2b = jnp.concatenate(
                [prompt_embeds, negative_prompt_embeds], axis=0)
            latents = jax.jit(
                denoise_segment_wan21,
                static_argnames=("dit_cfg", "guidance_scale", "attn_impl"))(
                dit_cfg=self.dit_cfg, dit_params=self.dit_params,
                latents=latents, condition=condition,
                traj_latents=traj_latents, context_2b=context_2b,
                image_embeds=image_embeds, sigmas=sigmas[:-1],
                sigmas_next=sigmas[1:], timesteps=timesteps,
                guidance_scale=float(guidance_scale), attn_impl=attn_impl)
        else:
            condition, traj_latents, id_latents = prepare_conditions(
                vae_cfg, self.vae_params, image, traj_tensor, id_tensor)
            mask = build_first_frame_mask(shape[2], shape[3], shape[4])

            split_idx = 0
            if self.pipe_cfg.boundary_ratio is not None and \
                    self.dit_params_2 is not None:
                boundary_t = self.pipe_cfg.boundary_ratio \
                    * sched.num_train_timesteps
                split_idx = int(np.sum(timesteps_np >= boundary_t))

            common = dict(guidance_scale=float(guidance_scale),
                          attn_impl=attn_impl, cfg_mode=cfg_mode,
                          mesh=self.mesh)
            if steps_per_program and split_idx == 0:
                # chunk the schedule into bounded XLA programs: the final
                # per-chunk re-blend is idempotent under the binary mask,
                # so chunked denoising is exactly equal to one program
                # (also sidesteps runtime watchdogs on very long single
                # program executions)
                n = num_inference_steps
                for a in range(0, n, int(steps_per_program)):
                    b = min(n, a + int(steps_per_program))
                    latents = denoise(
                        self.dit_cfg, self.dit_params, latents, condition,
                        traj_latents, id_latents, mask, prompt_embeds,
                        negative_prompt_embeds, sigmas[a:b + 1],
                        timesteps[a:b], **common)
            else:
                latents = denoise(
                    self.dit_cfg, self.dit_params, latents, condition,
                    traj_latents, id_latents, mask, prompt_embeds,
                    negative_prompt_embeds, sigmas, timesteps,
                    dit_params_2=self.dit_params_2,
                    guidance_scale_2=(None if guidance_scale_2 is None
                                      else float(guidance_scale_2)),
                    split_idx=split_idx, **common)

        if output_type == "latent":
            return latents
        z = wan_vae.denormalize_latents(vae_cfg, latents)
        if decode_mode == "streaming":
            # bounded-memory decode next to a resident DiT
            from frameino_tpu.models.wan_vae_streaming import streaming_decode
            video = streaming_decode(vae_cfg, self.vae_params, z)
        elif decode_mode == "tiled":
            from frameino_tpu.models.wan_vae_tiling import tiled_decode
            video = tiled_decode(vae_cfg, self.vae_params, z)
        elif decode_mode == "hybrid":
            # large spatial tiles + in-tile temporal streaming: lowest
            # overlap redundancy that fits next to the resident DiT
            from frameino_tpu.models.wan_vae_tiling import hybrid_decode
            video = hybrid_decode(vae_cfg, self.vae_params, z)
        else:
            video = wan_vae.decode(vae_cfg, self.vae_params, z)
        if output_type == "np":
            return np.asarray(video)
        return video
