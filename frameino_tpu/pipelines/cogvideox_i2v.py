"""CogVideoX image-to-video pipelines (motion + FrameINO) — TPU-native.

Reference: ``pipelines/pipeline_cogvideox_i2v_motion.py`` and
``pipelines/pipeline_cogvideox_i2v_motion_FrameINO.py``. Condition
algebra reproduced exactly:

- ``prepare_latents`` (reference ``:350-423``): first-frame VAE latent
  (posterior sample * scaling_factor) + zero padding over time; noise
  latents [B, F, z, h, w] frame-first.
- trajectory video latents (sample * scaling, ``:803-811``); ID frame as
  a single-frame latent via the trainer's ``img_tensor_to_vae_latent``
  (``train_code/train_cogvideox_motion_FrameINO.py:515-546``), augment
  noise off at inference.
- 3D RoPE precomputed once, first-frame block duplicated for the ID
  frame (``:834-839``); batch-doubled CFG (``:856-896``); ID frame
  appended on the frame axis with zero padding added to the image and
  trajectory streams (``:866-877``); channel concat
  [noisy, image, traj] -> 48 channels (``:881``); ID predictions dropped
  (``:900-902``); dynamic CFG schedule (``:906-909``); DDIM or
  CogVideoX-DPM step (``:914-926``).

The denoise loop is ONE ``lax.scan``; the (static) per-step dynamic-CFG
scales and DPM step pairs ride the scan xs.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from frameino_tpu.models import cogvideox_dit, cogvideox_vae
from frameino_tpu.schedulers.ddim import (DDIMConfig, ddim_alphas_cumprod,
                                          ddim_step, inference_timesteps)
from frameino_tpu.schedulers.cogvideox_dpm import dpm_step_pair

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class CogPipelineConfig:
    scheduler: DDIMConfig = DDIMConfig()
    scheduler_type: str = "ddim"            # 'ddim' | 'dpm'
    use_dynamic_cfg: bool = True


def dynamic_cfg_scales(guidance_scale: float, timesteps: np.ndarray,
                       num_inference_steps: int) -> np.ndarray:
    """Reference ``:906-909``: cosine-ramped guidance per step."""
    return np.array([
        1.0 + guidance_scale * (
            (1 - math.cos(math.pi * ((num_inference_steps - float(t))
                                     / num_inference_steps) ** 5.0)) / 2)
        for t in timesteps], dtype=np.float32)


def prepare_conditions(vae_cfg: cogvideox_vae.CogVideoXVAEConfig,
                       vae_params: Params,
                       image: jax.Array,
                       traj_video: Optional[jax.Array],
                       id_frame: Optional[jax.Array],
                       num_latent_frames: int,
                       key: jax.Array):
    """Returns (image_latents [B,F,z,h,w], traj_latents, id_latent or
    None) — frame-first, scaled by scaling_factor."""
    sf = vae_cfg.scaling_factor
    k1, k2, k3 = jax.random.split(key, 3)
    # Encode in the VAE's own param dtype AND accumulate convs there:
    # with bf16 serving params, fp32 conv outputs ([1,128,chunk,448,640]
    # temps at the reference eval shape) on top of the resident bf16 5B
    # DiT tip a 16 GB chip over. The reference serves its whole VAE in
    # fp16 (run_cogvideox_FrameIn_mass_evaluation.py:101-108) — bf16
    # encode compute IS the torch-parity serving semantics. fp32 params
    # keep fp32 encodes bit-exactly as before.
    pdt = next(l.dtype for l in jax.tree.leaves(vae_params)
               if hasattr(l, "dtype") and jnp.issubdtype(l.dtype,
                                                         jnp.floating))

    def enc(v, k):
        # every condition encodes through the tiled streaming walker
        # (cogvideox_vae_streaming.streaming_encode): spatial tiles +
        # frame-chunk conv-cache walk — the reference protocol itself
        # (its eval enables VAE tiling+slicing,
        # run_cogvideox_FrameIn_mass_evaluation.py:95-96), and peak
        # activation memory = one frame chunk of one 256px tile, which
        # coexists with the resident 5B DiT on a 16 GB chip. Small
        # canvases / single frames fall back to untiled single-chunk
        # programs inside the walker (identical numerics there).
        from frameino_tpu.models import cogvideox_vae_streaming
        from frameino_tpu.ops.conv import conv_accum_dtype
        v = v.astype(pdt)
        with conv_accum_dtype(pdt):
            z = cogvideox_vae_streaming.streaming_encode(
                vae_cfg, vae_params, v, sample_mode="sample", key=k)
        return (z * sf).transpose(0, 2, 1, 3, 4)        # -> [B,F,z,h,w]

    img_lat = enc(image[:, :, None], k1)                # [B,1,z,h,w]
    pad = jnp.zeros((img_lat.shape[0], num_latent_frames - 1,
                     *img_lat.shape[2:]), img_lat.dtype)
    image_latents = jnp.concatenate([img_lat, pad], axis=1)

    traj_latents = enc(traj_video, k2) if traj_video is not None else None
    id_latent = enc(id_frame[:, :, None], k3) if id_frame is not None else None
    return image_latents, traj_latents, id_latent


@functools.partial(jax.jit, static_argnames=("dit_cfg", "sched_cfg",
                                             "scheduler_type",
                                             "num_inference_steps",
                                             "attn_impl", "mesh",
                                             "return_x0"))
def denoise(dit_cfg: cogvideox_dit.CogVideoXConfig, dit_params: Params,
            sched_cfg: DDIMConfig,
            latents: jax.Array,
            image_latents: jax.Array,
            traj_latents: Optional[jax.Array],
            id_latent: Optional[jax.Array],
            context: jax.Array, neg_context: jax.Array,
            rope_cos: jax.Array, rope_sin: jax.Array,
            timesteps: jax.Array, timesteps_back: jax.Array,
            guidance_scales: jax.Array,
            num_inference_steps: int,
            scheduler_type: str = "ddim",
            attn_impl: Optional[str] = None,
            mesh=None,
            old_x0: Optional[jax.Array] = None,
            return_x0: bool = False) -> jax.Array:
    """CFG denoise scan. latents: [B, F, z, h, w] frame-first.

    ``mesh``: run the DiT forwards sharded (dp/fsdp/tp/sp/pp per the
    mesh axes) for multi-chip serving.

    ``old_x0``/``return_x0``: chunked-program support (the tunneled
    TPU's watchdog kills single programs >~4 min, ROADMAP r2). Pass the
    previous chunk's x0 carry and slice timesteps/timesteps_back/
    guidance_scales per chunk; the DPM multistep history then crosses
    program boundaries exactly (t_back's -1 sentinel marks the true
    first step). DDIM ignores the carry."""
    B, F, z, h, w = latents.shape
    ac = jnp.asarray(ddim_alphas_cumprod(sched_cfg), jnp.float32)
    context_2b = jnp.concatenate([neg_context, context], axis=0)
    compute = context.dtype

    def model_input(lat):
        x = jnp.concatenate([lat, lat], axis=0)          # CFG double
        img = jnp.concatenate([image_latents, image_latents], axis=0)
        if traj_latents is not None:
            trj = jnp.concatenate([traj_latents, traj_latents], axis=0)
        if id_latent is not None:
            idl = jnp.concatenate([id_latent, id_latent], axis=0)
            x = jnp.concatenate([x, idl], axis=1)        # frame axis
            zpad = jnp.zeros_like(idl)
            img = jnp.concatenate([img, zpad], axis=1)
            if traj_latents is not None:
                trj = jnp.concatenate([trj, zpad], axis=1)
        streams = [x, img] + ([trj] if traj_latents is not None else [])
        return jnp.concatenate(streams, axis=2)          # channel axis

    def step(carry, xs):
        lat, old_x0 = carry
        t, t_back, g = xs
        x_in = model_input(lat).astype(compute)
        ts = jnp.broadcast_to(t, (2 * B,)).astype(jnp.float32)
        pred = cogvideox_dit.cogvideox_forward(
            dit_cfg, dit_params, x_in, context_2b, ts,
            image_rotary_emb=(rope_cos, rope_sin), attn_impl=attn_impl,
            mesh=mesh)
        pred = pred.astype(jnp.float32)[:, :F]           # drop ID frames
        uncond, cond = jnp.split(pred, 2, axis=0)
        noise_pred = uncond + g * (cond - uncond)
        if scheduler_type == "dpm":
            lat, x0 = dpm_step_pair(sched_cfg, ac, lat, noise_pred,
                                    t.astype(jnp.int32),
                                    t_back.astype(jnp.int32), old_x0,
                                    num_inference_steps)
        else:
            lat = ddim_step(sched_cfg, ac, lat, noise_pred,
                            t.astype(jnp.int32), num_inference_steps)
            x0 = old_x0
        return (lat, x0), None

    old_x0_init = jnp.zeros_like(latents) if old_x0 is None else old_x0
    # first step must use the first-order DPM path: t_back = -1 sentinel
    (latents, x0), _ = jax.lax.scan(
        step, (latents, old_x0_init),
        (timesteps, timesteps_back, guidance_scales))
    return (latents, x0) if return_x0 else latents


class CogVideoXImageToVideoPipeline:
    """Mirrors the reference ``__call__`` contract
    (``pipeline_cogvideox_i2v_motion_FrameINO.py:604-959``)."""

    def __init__(self, dit_cfg: cogvideox_dit.CogVideoXConfig,
                 dit_params: Params,
                 vae_cfg: cogvideox_vae.CogVideoXVAEConfig,
                 vae_params: Params,
                 pipe_cfg: CogPipelineConfig = CogPipelineConfig(),
                 text_encoder_fn=None,
                 quantize: Optional[str] = None):
        if quantize == "int8":
            # w8a8 serving config (models/quant.py; v5e 2x MXU)
            from frameino_tpu.models.quant import quantize_dit_int8
            # donate: serving hands the tree off; streaming per-leaf
            # quantization keeps CogVideoX-5B under one chip's HBM
            dit_params = quantize_dit_int8(dit_params, donate=True)
        elif quantize is not None:
            raise ValueError(f"unsupported quantize={quantize!r}")
        self.dit_cfg = dit_cfg
        self.dit_params = dit_params
        self.vae_cfg = vae_cfg
        self.vae_params = vae_params
        self.pipe_cfg = pipe_cfg
        self.text_encoder_fn = text_encoder_fn
        self._dit_host = None     # host master copies (offload_*)
        self._vae_host = None

    def offload_vae(self) -> None:
        """Free the VAE's HBM (~0.4 GB) during denoise. Host-master
        design like offload_dit: snapshot to host numpy once, then every
        offload just drops the device tree — repeated device->host
        param fetches have crashed the tunneled TPU worker."""
        if self._vae_host is None:
            flat, treedef = jax.tree.flatten(self.vae_params)
            self.vae_params = None
            self._vae_host = jax.tree.unflatten(
                treedef, [jax.device_get(x) for x in flat])
        else:
            self.vae_params = None

    def restore_vae(self, group: int = 16) -> Params:
        """Bring offloaded VAE params back to the accelerator."""
        if self.vae_params is not None:
            return self.vae_params
        dev = jax.devices()[0]
        flat, treedef = jax.tree.flatten(self._vae_host)
        out = []
        for i in range(0, len(flat), group):
            chunk = [jax.device_put(leaf, dev)
                     for leaf in flat[i:i + group]]
            float(chunk[-1].ravel()[0])
            out.extend(chunk)
        self.vae_params = jax.tree.unflatten(treedef, out)
        return self.vae_params

    def offload_dit(self) -> None:
        """Free the DiT's HBM during the VAE condition encodes — the
        heavyweight half of the reference's enable_model_cpu_offload
        recipe (run_cogvideox_FrameIn_mass_evaluation.py:104). The bf16
        5B tree + the VAE encoder's conv caches + chunk temps do not
        coexist in 16 GB at the protocol shape even with bf16 conv
        accumulation.

        Host-MASTER design: the first offload snapshots the tree to
        host numpy once; every later offload just DROPS the device tree
        (no transfer) and restore_dit re-uploads from the master. Per
        clip that is one 11.2 GB host->device upload — the price of
        bf16 single-chip serving (int8 fits resident and avoids it)."""
        if self._dit_host is None:
            flat, treedef = jax.tree.flatten(self.dit_params)
            self.dit_params = None
            host = []
            for leaf in flat:
                host.append(jax.device_get(leaf))
            self._dit_host = jax.tree.unflatten(treedef, host)
        else:
            self.dit_params = None

    def restore_dit(self, group: int = 16) -> Params:
        if self.dit_params is not None:
            return self.dit_params
        dev = jax.devices()[0]
        flat, treedef = jax.tree.flatten(self._dit_host)
        out = []
        for i in range(0, len(flat), group):
            chunk = [jax.device_put(leaf, dev)
                     for leaf in flat[i:i + group]]
            float(chunk[-1].ravel()[0])    # tunnel-safe sync per group
            out.extend(chunk)
        self.dit_params = jax.tree.unflatten(treedef, out)
        return self.dit_params

    def __call__(self,
                 image: jax.Array,
                 prompt_embeds: Optional[jax.Array] = None,
                 negative_prompt_embeds: Optional[jax.Array] = None,
                 traj_tensor: Optional[jax.Array] = None,
                 id_tensor: Optional[jax.Array] = None,
                 height: int = 480,
                 width: int = 720,
                 num_frames: int = 49,
                 num_inference_steps: int = 50,
                 guidance_scale: float = 6.0,
                 key: Optional[jax.Array] = None,
                 latents: Optional[jax.Array] = None,
                 output_type: str = "np",
                 attn_impl: Optional[str] = None,
                 decode_mode: str = "streaming",
                 steps_per_program: Optional[int] = None,
                 vae_offload: bool = False):
        # decode_mode: "streaming" (default — the reference's own
        # chunk/conv-cache protocol as a host loop of 2-latent-frame
        # programs, peak activation = one chunk) or "full" (one
        # segmented full-sequence program; identical numerics, OOMs a
        # 16 GB chip at 448x640x49f). Other Wan modes map to streaming.
        #
        # vae_offload: park the VAE params in host RAM between the
        # condition encodes and the final decode — the TPU-native
        # counterpart of the reference's enable_model_cpu_offload
        # (run_cogvideox_FrameIn_mass_evaluation.py:104). The bf16 5B
        # DiT + 49f@448x640 denoise working set leaves <0.5 GB HBM
        # headroom on a 16 GB chip; the resident VAE tips it over.
        # Callers must not hold other references to self.vae_params or
        # the HBM copy cannot free.
        vae_cfg = self.vae_cfg
        key = key if key is not None else jax.random.key(0)
        k_lat, k_cond = jax.random.split(key)

        if negative_prompt_embeds is None:
            negative_prompt_embeds = jnp.zeros_like(prompt_embeds)
        B = prompt_embeds.shape[0]

        F = (num_frames - 1) // vae_cfg.temporal_compression_ratio + 1
        h = height // vae_cfg.spatial_compression_ratio
        w = width // vae_cfg.spatial_compression_ratio
        z = vae_cfg.latent_channels
        if latents is None:
            latents = jax.random.normal(k_lat, (B, F, z, h, w), jnp.float32)

        if traj_tensor is not None and traj_tensor.ndim == 4:
            traj_tensor = traj_tensor.transpose(1, 0, 2, 3)[None]
        if id_tensor is not None:
            # accept [3,H,W], [B,3,H,W] or the Wan-style [B,3,N,H,W]
            if id_tensor.ndim == 3:
                id_tensor = id_tensor[None]
            elif id_tensor.ndim == 5:
                id_tensor = id_tensor[:, :, 0]
        if self.dit_params is None:
            self.restore_dit()      # left parked by a prior offload call
        image_latents, traj_latents, id_latent = prepare_conditions(
            vae_cfg, self.vae_params, image, traj_tensor, id_tensor, F,
            k_cond)
        if vae_offload:
            # cheap half of the reference's cpu-offload recipe: park the
            # VAE (~0.4 GB) during denoise. The DiT never needs to move:
            # the tiled streaming encode/decode fit beside it.
            self.offload_vae()

        has_id = id_latent is not None
        cos, sin = cogvideox_dit.cogvideox_rope(
            self.dit_cfg, F, h, w, duplicate_first_frame_for_id=has_id)

        sched = self.pipe_cfg.scheduler
        ts_np = inference_timesteps(sched, num_inference_steps)
        ts_back_np = np.concatenate([[-1], ts_np[:-1]])
        if self.pipe_cfg.use_dynamic_cfg:
            g_np = dynamic_cfg_scales(guidance_scale, ts_np,
                                      num_inference_steps)
        else:
            g_np = np.full(len(ts_np), guidance_scale, np.float32)

        ts_j = jnp.asarray(ts_np, jnp.float32)
        ts_back_j = jnp.asarray(ts_back_np, jnp.float32)
        g_j = jnp.asarray(g_np)
        # chunked programs (watchdog-safe on the tunneled chip): the
        # DPM x0 history carries across chunks, so chunking is exact
        spp = steps_per_program or num_inference_steps
        x0 = None
        for a in range(0, num_inference_steps, spp):
            b = min(num_inference_steps, a + spp)
            latents, x0 = denoise(
                self.dit_cfg, self.dit_params, sched, latents,
                image_latents, traj_latents, id_latent, prompt_embeds,
                negative_prompt_embeds, cos, sin, ts_j[a:b],
                ts_back_j[a:b], g_j[a:b],
                num_inference_steps=num_inference_steps,
                scheduler_type=self.pipe_cfg.scheduler_type,
                attn_impl=attn_impl, old_x0=x0, return_x0=True)

        if output_type == "latent":
            return latents
        if vae_offload:
            self.restore_vae()
        from frameino_tpu.ops.conv import conv_accum_dtype
        pdt = next(l.dtype for l in jax.tree.leaves(self.vae_params)
                   if hasattr(l, "dtype")
                   and jnp.issubdtype(l.dtype, jnp.floating))
        zlat = (latents.transpose(0, 2, 1, 3, 4)
                / vae_cfg.scaling_factor).astype(pdt)
        # decode in the VAE's own dtype (fp32 params: bit-identical to
        # before; bf16 serving params: the reference's own fp16-VAE
        # serving semantics, and the full-res fp32 conv temps would not
        # fit beside the resident DiT anyway)
        with conv_accum_dtype(pdt):
            if decode_mode == "full":
                video = cogvideox_vae.decode(vae_cfg, self.vae_params, zlat)
            else:
                from frameino_tpu.models import cogvideox_vae_streaming
                video = cogvideox_vae_streaming.tiled_streaming_decode(
                    vae_cfg, self.vae_params, zlat)
        video = jnp.clip(video.astype(jnp.float32), -1.0, 1.0)
        return np.asarray(video) if output_type == "np" else video
