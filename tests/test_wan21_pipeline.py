"""Wan2.1 (non-expand-timesteps) pipeline path + profiling utils."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from frameino_tpu.models import wan_dit, wan_vae
from frameino_tpu.pipelines import wan_i2v as P

pytestmark = pytest.mark.slow

VAE_CFG = wan_vae.WanVAEConfig(
    base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
    temperal_downsample=(True,), is_residual=False,
    scale_factor_temporal=2, scale_factor_spatial=2,
    latents_mean=tuple([0.0] * 4), latents_std=tuple([1.0] * 4))
# Wan2.1-style input: noisy z(4) + mask(2=temporal scale) + cond z(4)
# + traj z(4) = 14 channels
DIT_CFG = wan_dit.tiny_config(in_channels=14, out_channels=4)


def test_wan21_channel_conditioning_pipeline():
    vae_params = wan_vae.init_wan_vae(jax.random.key(0), VAE_CFG)
    dit_params = wan_dit.init_wan_dit(jax.random.key(1), DIT_CFG)
    pipe = P.WanImageToVideoPipeline(
        DIT_CFG, dit_params, VAE_CFG, vae_params,
        P.WanPipelineConfig(expand_timesteps=False))
    image = jnp.tanh(jax.random.normal(jax.random.key(2), (1, 3, 16, 16)))
    traj = jnp.tanh(jax.random.normal(jax.random.key(3), (1, 3, 9, 16, 16)))
    text = jax.random.normal(jax.random.key(4), (1, 7, DIT_CFG.text_dim))
    video = pipe(image, prompt_embeds=text, traj_tensor=traj,
                 height=16, width=16, num_frames=9, num_inference_steps=2,
                 guidance_scale=3.0, key=jax.random.key(5),
                 attn_impl="xla")
    assert video.shape == (1, 3, 9, 16, 16)
    assert np.isfinite(video).all()


def test_wan21_condition_mask_layout():
    vae_params = wan_vae.init_wan_vae(jax.random.key(0), VAE_CFG)
    image = jnp.tanh(jax.random.normal(jax.random.key(2), (1, 3, 16, 16)))
    cond, traj = P.prepare_conditions_wan21(VAE_CFG, vae_params, image, 9)
    # mask channels (scale_factor_temporal=2) + z channels
    assert cond.shape == (1, 2 + 4, 5, 8, 8)
    mask = np.asarray(cond[:, :2])
    assert mask[0, :, 0].min() == 1.0           # first latent frame: ones
    assert mask[0, :, 1:].max() == 0.0          # later frames: zeros
    assert traj is None


def test_profiling_utils():
    from frameino_tpu.core.profiling import StepTimer, MetricsLogger, mfu
    t = StepTimer(skip_first=1)
    for _ in range(3):
        t.start()
        x = jnp.ones((8, 8)) * 2
        t.stop(sync_value=x)
    assert t.mean > 0 and t.best > 0 and len(t.times) == 2
    assert 0 < mfu(1e12, 1.0) < 1

    import tempfile, os, json
    path = os.path.join(tempfile.mkdtemp(), "m.jsonl")
    ml = MetricsLogger(path)
    ml.log(1, {"loss": jnp.float32(0.5)})
    rec = json.loads(open(path).read())
    assert rec == {"step": 1, "loss": 0.5}


def test_wan21_image_encoder_fn_wiring():
    """image_encoder_fn (the CLIP vision tower hook) is invoked when the
    DiT has an image-KV branch and no precomputed image_embeds given."""
    import dataclasses
    cfg = dataclasses.replace(DIT_CFG, image_dim=8)
    vae_params = wan_vae.init_wan_vae(jax.random.key(0), VAE_CFG)
    dit_params = wan_dit.init_wan_dit(jax.random.key(1), cfg)
    calls = []

    def fake_clip(image):
        calls.append(np.asarray(image).shape)
        return jnp.zeros((1, 5, 8))          # [B, tokens, image_dim]

    pipe = P.WanImageToVideoPipeline(
        cfg, dit_params, VAE_CFG, vae_params,
        P.WanPipelineConfig(expand_timesteps=False),
        image_encoder_fn=fake_clip)
    image = jnp.tanh(jax.random.normal(jax.random.key(2), (1, 3, 16, 16)))
    traj = jnp.tanh(jax.random.normal(jax.random.key(3), (1, 3, 9, 16, 16)))
    text = jax.random.normal(jax.random.key(4), (1, 7, cfg.text_dim))
    video = pipe(image, prompt_embeds=text, traj_tensor=traj,
                 height=16, width=16,
                 num_frames=9, num_inference_steps=2, guidance_scale=3.0,
                 key=jax.random.key(5), attn_impl="xla")
    assert calls == [(1, 3, 16, 16)]
    assert np.isfinite(video).all()
