"""End-to-end Wan FrameINO pipeline tests on tiny models (CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frameino_tpu.models import wan_dit, wan_vae
from frameino_tpu.pipelines import wan_i2v as P
from frameino_tpu.schedulers.flow_match_euler import FlowMatchEulerConfig

pytestmark = pytest.mark.slow

VAE_CFG = dataclasses.replace(
    wan_vae.WanVAEConfig(
        base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
        temperal_downsample=(True,), is_residual=False, patch_size=None,
        scale_factor_temporal=2, scale_factor_spatial=2,
        latents_mean=tuple([0.0] * 4), latents_std=tuple([1.0] * 4),
    ))
# z=4 latent + 4 traj channels -> 8 input channels; output = z = 4
DIT_CFG = wan_dit.tiny_config(in_channels=8, out_channels=4)


@pytest.fixture(scope="module")
def pipe():
    vae_params = wan_vae.init_wan_vae(jax.random.key(0), VAE_CFG)
    dit_params = wan_dit.init_wan_dit(jax.random.key(1), DIT_CFG)
    return P.WanImageToVideoPipeline(
        DIT_CFG, dit_params, VAE_CFG, vae_params,
        P.WanPipelineConfig(scheduler=FlowMatchEulerConfig()))


def _conditions(key=7, B=1, H=16, W=16, F=9):
    ks = jax.random.split(jax.random.key(key), 4)
    image = jnp.tanh(jax.random.normal(ks[0], (B, 3, H, W)))
    traj = jnp.tanh(jax.random.normal(ks[1], (B, 3, F, H, W)))
    ids = jnp.tanh(jax.random.normal(ks[2], (B, 3, 1, H, W)))
    text = jax.random.normal(ks[3], (B, 7, DIT_CFG.text_dim))
    return image, traj, ids, text


class TestFrameINOPipeline:
    def test_full_generation(self, pipe):
        image, traj, ids, text = _conditions()
        video = pipe(image, prompt_embeds=text, traj_tensor=traj,
                     id_tensor=ids, height=16, width=16, num_frames=9,
                     num_inference_steps=4, guidance_scale=5.0,
                     key=jax.random.key(0), attn_impl="xla")
        # one temporal level: 9 frames -> 5 latent frames -> 9 decoded
        assert video.shape == (1, 3, 9, 16, 16)
        assert np.isfinite(video).all()
        assert video.min() >= -1.0 and video.max() <= 1.0

    def test_first_frame_is_condition(self, pipe):
        """output_type='latent': frame 0 must be exactly the clean
        condition latent (reference final re-blend :912-913)."""
        image, traj, ids, text = _conditions()
        lat = pipe(image, prompt_embeds=text, traj_tensor=traj,
                   id_tensor=ids, height=16, width=16, num_frames=9,
                   num_inference_steps=2, guidance_scale=1.0,
                   key=jax.random.key(1), output_type="latent",
                   attn_impl="xla")
        cond, _, _ = P.prepare_conditions(VAE_CFG, pipe.vae_params,
                                          image, None, None)
        np.testing.assert_allclose(np.asarray(lat[:, :, 0]),
                                   np.asarray(cond[:, :, 0]), atol=1e-5)

    def test_deterministic(self, pipe):
        image, traj, ids, text = _conditions()
        kw = dict(prompt_embeds=text, traj_tensor=traj, id_tensor=ids,
                  height=16, width=16, num_frames=9, num_inference_steps=2,
                  guidance_scale=3.0, key=jax.random.key(5),
                  output_type="latent", attn_impl="xla")
        a = pipe(image, **kw)
        b = pipe(image, **kw)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_motion_only_no_id(self, pipe):
        """Stage-1 motion pipeline: no ID frames."""
        image, traj, _, text = _conditions()
        lat = pipe(image, prompt_embeds=text, traj_tensor=traj,
                   id_tensor=None, height=16, width=16, num_frames=9,
                   num_inference_steps=2, guidance_scale=2.0,
                   key=jax.random.key(2), output_type="latent",
                   attn_impl="xla")
        assert lat.shape == (1, 4, 5, 8, 8)
        assert np.isfinite(np.asarray(lat)).all()

    def test_id_frames_change_output(self, pipe):
        """The ID branch must influence the generation."""
        image, traj, ids, text = _conditions()
        kw = dict(prompt_embeds=text, traj_tensor=traj, height=16, width=16,
                  num_frames=9, num_inference_steps=2, guidance_scale=2.0,
                  key=jax.random.key(3), output_type="latent",
                  attn_impl="xla")
        a = pipe(image, id_tensor=ids, **kw)
        b = pipe(image, id_tensor=None, **kw)
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestConditionPrep:
    def test_traj_padded_for_id_frames(self, pipe):
        image, traj, ids, _ = _conditions()
        cond, traj_lat, id_lat = P.prepare_conditions(
            VAE_CFG, pipe.vae_params, image, traj, ids)
        assert cond.shape[2] == 1
        assert id_lat.shape[2] == 1
        # traj latents extended with zero padding on the frame axis
        assert traj_lat.shape[2] == 5 + 1
        np.testing.assert_allclose(np.asarray(traj_lat[:, :, -1]), 0.0)

    def test_mask(self):
        m = P.build_first_frame_mask(3, 2, 2)
        assert m.shape == (1, 1, 3, 2, 2)
        assert float(m[0, 0, 0].sum()) == 0.0
        assert float(m[0, 0, 1:].sum()) == 8.0


def test_two_expert_boundary_split(pipe):
    """Wan2.2 two-expert denoising: high-noise steps route to
    transformer, low-noise to transformer_2 (reference :804-823)."""
    from frameino_tpu.models import wan_dit
    image, traj, ids, text = _conditions()
    params2 = wan_dit.init_wan_dit(jax.random.key(77), DIT_CFG)
    pipe2 = P.WanImageToVideoPipeline(
        DIT_CFG, pipe.dit_params, VAE_CFG, pipe.vae_params,
        P.WanPipelineConfig(boundary_ratio=0.9),
        dit_params_2=params2)
    kw = dict(prompt_embeds=text, traj_tensor=traj, id_tensor=ids,
              height=16, width=16, num_frames=9, num_inference_steps=4,
              guidance_scale=2.0, key=jax.random.key(4),
              output_type="latent", attn_impl="xla")
    a = pipe2(image, guidance_scale_2=3.0, **kw)
    assert np.isfinite(np.asarray(a)).all()
    # a single-expert run with the same params differs (expert 2 kicked in)
    b = pipe(image, **kw)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_sequential_cfg_matches_batch(pipe):
    """cfg_mode='sequential' (two batch-B forwards; the single-chip
    flagship-shape config) == batch-doubled CFG exactly."""
    import jax
    import jax.numpy as jnp
    image = jnp.tanh(jax.random.normal(jax.random.key(2), (1, 3, 16, 16)))
    traj = jnp.tanh(jax.random.normal(jax.random.key(3), (1, 3, 9, 16, 16)))
    text = jax.random.normal(jax.random.key(4), (1, 7, DIT_CFG.text_dim))
    kw = dict(prompt_embeds=text, traj_tensor=traj, height=16, width=16,
              num_frames=9, num_inference_steps=2, guidance_scale=3.0,
              key=jax.random.key(5), attn_impl="xla")
    a = pipe(image, cfg_mode="batch", **kw)
    b = pipe(image, cfg_mode="sequential", **kw)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-4, atol=1e-4)


def test_chunked_denoise_matches_single_program(pipe):
    """steps_per_program chunking == one compiled program exactly (the
    per-chunk final re-blend is idempotent under the binary mask)."""
    import jax
    import jax.numpy as jnp
    image = jnp.tanh(jax.random.normal(jax.random.key(2), (1, 3, 16, 16)))
    traj = jnp.tanh(jax.random.normal(jax.random.key(3), (1, 3, 9, 16, 16)))
    text = jax.random.normal(jax.random.key(4), (1, 7, DIT_CFG.text_dim))
    kw = dict(prompt_embeds=text, traj_tensor=traj, height=16, width=16,
              num_frames=9, num_inference_steps=4, guidance_scale=3.0,
              key=jax.random.key(5), attn_impl="xla")
    a = pipe(image, **kw)
    b = pipe(image, steps_per_program=2, **kw)
    c = pipe(image, steps_per_program=3, **kw)   # uneven tail chunk
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                               rtol=1e-5, atol=1e-5)
