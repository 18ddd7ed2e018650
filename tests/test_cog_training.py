"""CogVideoX trainer + channel surgery tests."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from frameino_tpu.models import cogvideox_dit, cogvideox_vae, wan_dit
from frameino_tpu.training.cog_trainer import (CogTrainerConfig,
                                               make_cog_train_step)
from frameino_tpu.training.optim import OptimizerConfig, make_optimizer
from frameino_tpu.training.surgery import (cogvideox_stage1_surgery,
                                           wan_stage1_surgery)
from frameino_tpu.training.trainer import init_train_state

pytestmark = pytest.mark.slow

VAE_CFG = cogvideox_vae.tiny_vae_config()
DIT_CFG = cogvideox_dit.tiny_config()  # in 12 = 4 noisy + 4 image + 4 traj
TCFG = CogTrainerConfig(compute_dtype=jnp.float32, remat=False,
                        attn_impl="xla", augment_noise=True)


def _batch(key=0, B=1, F=9, H=16, W=16):
    ks = jax.random.split(jax.random.key(key), 5)
    return {
        "video_tensor": jnp.tanh(jax.random.normal(ks[0], (B, F, 3, H, W))),
        "first_frame_tensor": jnp.tanh(jax.random.normal(ks[1], (B, 3, H, W))),
        "traj_tensor": jnp.tanh(jax.random.normal(ks[2], (B, F, 3, H, W))),
        "ID_tensor": jnp.tanh(jax.random.normal(ks[3], (B, 3, H, W))),
        "prompt_embeds": jax.random.normal(
            ks[4], (B, DIT_CFG.max_text_seq_length, DIT_CFG.text_embed_dim)),
    }


def test_cog_train_loss_decreases():
    vae_params = cogvideox_vae.init_cogvideox_vae(jax.random.key(0), VAE_CFG)
    dit_params = cogvideox_dit.init_cogvideox_dit(jax.random.key(1), DIT_CFG)
    opt = make_optimizer(OptimizerConfig(learning_rate=1e-3,
                                         lr_warmup_steps=1))
    state = init_train_state(dit_params, opt)
    step = make_cog_train_step(DIT_CFG, VAE_CFG, TCFG, opt)
    batch = _batch()
    losses = []
    for _ in range(6):
        state, m = step(state, vae_params, batch, jax.random.key(7))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


class TestSurgery:
    def test_wan_surgery_preserves_function(self):
        """Widened patch embedding must produce identical outputs when the
        extra channels are zero (zero-init no-op property)."""
        cfg = wan_dit.tiny_config()
        params = wan_dit.init_wan_dit(jax.random.key(0), cfg)
        new_params = wan_stage1_surgery(params, cfg.in_channels,
                                        cfg.in_channels + 4,
                                        cfg.patch_size)
        x = jax.random.normal(jax.random.key(1), (1, cfg.in_channels, 4, 8, 8))
        x_ext = jnp.concatenate(
            [x, jax.random.normal(jax.random.key(2), (1, 4, 4, 8, 8))], axis=1)

        toks = wan_dit._patchify_tokens(x, cfg.patch_size)
        old = toks @ params["patch_embedding"]["kernel"] \
            + params["patch_embedding"]["bias"]
        toks_ext = wan_dit._patchify_tokens(x_ext, cfg.patch_size)
        new = toks_ext @ new_params["patch_embedding"]["kernel"] \
            + new_params["patch_embedding"]["bias"]
        np.testing.assert_allclose(np.asarray(new), np.asarray(old),
                                   atol=1e-5)

    def test_cog_surgery_shapes(self):
        cfg = cogvideox_dit.tiny_config()
        params = cogvideox_dit.init_cogvideox_dit(jax.random.key(0), cfg)
        new_params = cogvideox_stage1_surgery(params, cfg.in_channels,
                                              cfg.in_channels + 4,
                                              cfg.patch_size)
        old_k = params["patch_embed"]["proj"]["kernel"]
        new_k = new_params["patch_embed"]["proj"]["kernel"]
        per = cfg.patch_size ** 2
        assert new_k.shape[0] == old_k.shape[0] + 4 * per
        # appended rows are zero
        np.testing.assert_allclose(
            np.asarray(new_k.reshape(-1, per, old_k.shape[1])
                       [cfg.in_channels:]), 0.0)
