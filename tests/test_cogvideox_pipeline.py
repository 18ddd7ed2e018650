"""End-to-end CogVideoX FrameINO pipeline tests on tiny models (CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frameino_tpu.models import cogvideox_dit, cogvideox_vae
from frameino_tpu.pipelines import cogvideox_i2v as P

pytestmark = pytest.mark.slow

VAE_CFG = cogvideox_vae.tiny_vae_config()
# z=4: noisy 4 + image 4 + traj 4 = 12 input channels; out 4
DIT_CFG = cogvideox_dit.tiny_config()


@pytest.fixture(scope="module")
def pipe():
    vae_params = cogvideox_vae.init_cogvideox_vae(jax.random.key(0), VAE_CFG)
    dit_params = cogvideox_dit.init_cogvideox_dit(jax.random.key(1), DIT_CFG)
    return P.CogVideoXImageToVideoPipeline(
        DIT_CFG, dit_params, VAE_CFG, vae_params)


def _conditions(key=7, B=1, H=16, W=16, F=9):
    ks = jax.random.split(jax.random.key(key), 4)
    image = jnp.tanh(jax.random.normal(ks[0], (B, 3, H, W)))
    traj = jnp.tanh(jax.random.normal(ks[1], (B, 3, F, H, W)))
    idf = jnp.tanh(jax.random.normal(ks[2], (B, 3, H, W)))
    text = jax.random.normal(ks[3], (B, DIT_CFG.max_text_seq_length,
                                     DIT_CFG.text_embed_dim))
    return image, traj, idf, text


class TestCogFrameINO:
    @pytest.mark.parametrize("sched", ["ddim", "dpm"])
    def test_full_generation(self, pipe, sched):
        pipe.pipe_cfg = P.CogPipelineConfig(scheduler_type=sched)
        image, traj, idf, text = _conditions()
        video = pipe(image, prompt_embeds=text, traj_tensor=traj,
                     id_tensor=idf, height=16, width=16, num_frames=9,
                     num_inference_steps=4, guidance_scale=6.0,
                     key=jax.random.key(0), attn_impl="xla")
        # tiny VAE: 4x temporal (9 -> 3 latents -> 9 decoded), 4x spatial
        assert video.shape == (1, 3, 9, 16, 16)
        assert np.isfinite(video).all()

    def test_motion_only(self, pipe):
        pipe.pipe_cfg = P.CogPipelineConfig(scheduler_type="ddim")
        image, traj, _, text = _conditions()
        lat = pipe(image, prompt_embeds=text, traj_tensor=traj,
                   id_tensor=None, height=16, width=16, num_frames=9,
                   num_inference_steps=2, guidance_scale=2.0,
                   key=jax.random.key(1), output_type="latent",
                   attn_impl="xla")
        assert lat.shape == (1, 3, 4, 4, 4)   # [B, F_lat, z, h, w]
        assert np.isfinite(np.asarray(lat)).all()

    def test_dynamic_cfg_scales(self):
        """Reproduces the reference formula verbatim (:906-909) — note it
        feeds the raw timestep (0..999) into a ramp scaled by
        num_inference_steps, a quirk inherited from CogVideoX."""
        import math
        ts = np.array([999, 500, 100, 19])
        g = P.dynamic_cfg_scales(6.0, ts, 50)
        for gi, t in zip(g, ts):
            ref = 1 + 6.0 * ((1 - math.cos(
                math.pi * ((50 - float(t)) / 50) ** 5.0)) / 2)
            np.testing.assert_allclose(gi, ref, rtol=1e-6)
        assert np.all(g >= 1.0) and np.all(g <= 7.0)

    def test_id_changes_output(self, pipe):
        pipe.pipe_cfg = P.CogPipelineConfig(scheduler_type="ddim")
        image, traj, idf, text = _conditions()
        kw = dict(prompt_embeds=text, traj_tensor=traj, height=16, width=16,
                  num_frames=9, num_inference_steps=2, guidance_scale=2.0,
                  key=jax.random.key(2), output_type="latent",
                  attn_impl="xla")
        a = pipe(image, id_tensor=idf, **kw)
        b = pipe(image, id_tensor=None, **kw)
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestCondPrep:
    def test_image_latents_padded(self, pipe):
        image, traj, idf, _ = _conditions()
        img_lat, traj_lat, id_lat = P.prepare_conditions(
            VAE_CFG, pipe.vae_params, image, traj, idf, 3,
            jax.random.key(3))
        assert img_lat.shape == (1, 3, 4, 4, 4)
        np.testing.assert_allclose(np.asarray(img_lat[:, 1:]), 0.0)
        assert traj_lat.shape == (1, 3, 4, 4, 4)
        assert id_lat.shape == (1, 1, 4, 4, 4)


class TestChunkedPrograms:
    @pytest.mark.parametrize("sched", ["ddim", "dpm"])
    def test_steps_per_program_exact(self, pipe, sched):
        """Chunked denoise programs (watchdog-safe serving) match the
        single-scan result exactly — the DPM x0 multistep history
        crosses program boundaries via the old_x0 carry."""
        pipe.pipe_cfg = P.CogPipelineConfig(scheduler_type=sched)
        image, traj, idf, text = _conditions()
        kw = dict(prompt_embeds=text, traj_tensor=traj, id_tensor=idf,
                  height=16, width=16, num_frames=9,
                  num_inference_steps=5, guidance_scale=6.0,
                  output_type="latent", attn_impl="xla")
        one = pipe(image, key=jax.random.key(3), **kw)
        chunked = pipe(image, key=jax.random.key(3),
                       steps_per_program=2, **kw)
        np.testing.assert_array_equal(np.asarray(one), np.asarray(chunked))


class TestCpuOffload:
    def test_vae_offload_matches_resident(self, pipe):
        """The cpu-offload choreography (DiT parked on host during VAE
        encodes, VAE parked during denoise — the reference's
        enable_model_cpu_offload parity) must not change a single bit
        of the output, and the param trees must be back on-device
        afterwards."""
        pipe.pipe_cfg = P.CogPipelineConfig(scheduler_type="ddim")
        image, traj, idf, text = _conditions(key=11)
        kwargs = dict(prompt_embeds=text, traj_tensor=traj, id_tensor=idf,
                      height=16, width=16, num_frames=9,
                      num_inference_steps=2, guidance_scale=6.0,
                      attn_impl="xla")
        ref = pipe(image, key=jax.random.key(3), **kwargs)
        out = pipe(image, key=jax.random.key(3), vae_offload=True,
                   **kwargs)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        # restore_vae ran before decode; dit restored after encodes
        dev = jax.devices()[0]
        assert jax.tree.leaves(pipe.vae_params)[0].devices() == {dev}
        assert jax.tree.leaves(pipe.dit_params)[0].devices() == {dev}
