"""Training step tests: loss decreases, stratified sampling, and the full
sharded (dp x fsdp x tp) train step on the 8-device CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frameino_tpu.core.meshes import MeshConfig, make_mesh
from frameino_tpu.models import wan_dit, wan_vae
from frameino_tpu.training import (OptimizerConfig, TrainerConfig,
                                   init_train_state, make_optimizer,
                                   make_sharded_train_state, make_train_step,
                                   stratified_timestep_indices)

pytestmark = pytest.mark.slow

VAE_CFG = wan_vae.WanVAEConfig(
    base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
    temperal_downsample=(True,), is_residual=False, patch_size=None,
    scale_factor_temporal=2, scale_factor_spatial=2,
    latents_mean=tuple([0.0] * 4), latents_std=tuple([1.0] * 4))
DIT_CFG = wan_dit.tiny_config(in_channels=8, out_channels=4)
TCFG = TrainerConfig(compute_dtype=jnp.float32, remat=False,
                     attn_impl="xla")


def _batch(key=0, B=2, F=9, H=16, W=16):
    ks = jax.random.split(jax.random.key(key), 5)
    return {
        "video_tensor": jnp.tanh(jax.random.normal(ks[0], (B, F, 3, H, W))),
        "first_frame_tensor": jnp.tanh(jax.random.normal(ks[1], (B, 3, H, W))),
        "traj_tensor": jnp.tanh(jax.random.normal(ks[2], (B, F, 3, H, W))),
        "ID_tensor": jnp.tanh(jax.random.normal(ks[3], (B, 1, 3, H, W))),
        "prompt_embeds": jax.random.normal(ks[4], (B, 7, DIT_CFG.text_dim)),
    }


class TestStratifiedSampling:
    def test_single_shard_uniform(self):
        idx = stratified_timestep_indices(jax.random.key(0), 4096, 1000, 1)
        assert idx.shape == (4096,)
        assert int(idx.min()) >= 0 and int(idx.max()) < 1000

    def test_strata_cover_schedule(self):
        """With W=4 ranks and 1000 idx: G=4 strata of 250; examples land
        in their rank's stratum (reference noise_sampler.py:14-47)."""
        B, W = 8, 4
        idx = np.asarray(stratified_timestep_indices(
            jax.random.key(1), B, 1000, W))
        per_rank = B // W
        for b in range(B):
            stratum = (b // per_rank)
            lo, hi = stratum * 250, (stratum + 1) * 250
            assert lo <= idx[b] < hi, (b, idx[b], lo, hi)

    def test_world_size_not_dividing(self):
        # W=3: G must divide 1000 -> i loop picks G=1 (3//3) -> full range
        idx = np.asarray(stratified_timestep_indices(
            jax.random.key(2), 6, 1000, 3))
        assert idx.min() >= 0 and idx.max() < 1000


class TestTrainStep:
    @pytest.fixture(scope="class")
    def setup(self):
        vae_params = wan_vae.init_wan_vae(jax.random.key(0), VAE_CFG)
        dit_params = wan_dit.init_wan_dit(jax.random.key(1), DIT_CFG)
        opt = make_optimizer(OptimizerConfig(learning_rate=1e-3,
                                             lr_warmup_steps=1))
        return vae_params, dit_params, opt

    def test_loss_decreases_on_fixed_batch(self, setup):
        vae_params, dit_params, opt = setup
        # donate_argnums deletes the state buffers each step; give this
        # test its own copy so the fixture survives for later tests
        state = init_train_state(jax.tree.map(jnp.array, dit_params), opt)
        step = make_train_step(DIT_CFG, VAE_CFG, TCFG, opt)
        batch = _batch()
        losses = []
        key = jax.random.key(42)
        for i in range(8):
            state, m = step(state, vae_params, batch, key)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses
        assert int(state.step) == 8

    def test_sharded_train_step_8dev(self, setup):
        """Full dp2 x fsdp2 x tp2 train step on the virtual CPU mesh —
        the same path __graft_entry__.dryrun_multichip exercises."""
        vae_params, dit_params, opt = setup
        mesh = make_mesh(MeshConfig(dp=2, fsdp=2, tp=2, sp=1))
        with mesh:
            state = make_sharded_train_state(
                jax.tree.map(jnp.array, dit_params), opt, mesh)
            step = make_train_step(DIT_CFG, VAE_CFG, TCFG, opt,
                                   mesh=mesh, dp_size=2)
            batch = _batch(B=2)
            state, m = step(state, vae_params, batch, jax.random.key(0))
            assert np.isfinite(float(m["loss"]))
            # params remain sharded after the update
            leaf = state.params["blocks"]["attn1"]["to_q"]["kernel"]
            assert not leaf.sharding.is_fully_replicated


def test_nonfinite_gradient_guard():
    """skip_nonfinite_updates leaves params untouched on a NaN batch."""
    import optax
    from frameino_tpu.training.optim import OptimizerConfig, make_optimizer
    # constant schedule: the skipped NaN step must not consume warmup
    opt = make_optimizer(OptimizerConfig(learning_rate=1e-2,
                                         lr_scheduler="constant",
                                         skip_nonfinite_updates=True))
    params = {"w": jnp.ones((4,))}
    state = opt.init(params)
    bad_grads = {"w": jnp.full((4,), jnp.nan)}
    updates, state = opt.update(bad_grads, state, params)
    new = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(new["w"]), 1.0)
    good = {"w": jnp.ones((4,))}
    updates, state = opt.update(good, state, params)
    new = optax.apply_updates(params, updates)
    assert not np.allclose(np.asarray(new["w"]), 1.0)


def test_prodigy_optimizer_steps():
    """Prodigy option (reference get_optimizer prodigy path,
    train_wan_motion_FrameINO.py:455-487): loss decreases on a toy
    quadratic and the d estimate grows off its d0 floor."""
    import jax
    import jax.numpy as jnp
    import optax
    from frameino_tpu.training.optim import OptimizerConfig, make_optimizer

    opt = make_optimizer(OptimizerConfig(optimizer="prodigy",
                                         learning_rate=1.0,
                                         lr_warmup_steps=1,
                                         beta2=0.99, epsilon=1e-8))
    params = {"w": jnp.ones((4,)) * 5.0}
    state = opt.init(params)

    def loss_fn(p):
        return jnp.sum(jnp.square(p["w"]))

    loss0 = float(loss_fn(params))
    for _ in range(50):
        g = jax.grad(loss_fn)(params)
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
    assert float(loss_fn(params)) < loss0
