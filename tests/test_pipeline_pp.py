"""Pipeline parallelism (pp mesh axis): GPipe over stacked blocks.

The reference has no pipeline parallelism (single-node DDP only, SURVEY
§2.8); ``parallel/pipeline.py`` adds it TPU-natively — the scan-stacked
'layers' axis sharded into stages, fill-drain schedule under a
partial-manual shard_map, ppermute hops between stages. These tests
pin exact equality with the plain ``lax.scan`` sweep (forward AND
gradients — the backward pipeline is the ppermute transpose) and the
integration into both DiT forwards and the sharded train step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frameino_tpu.core.meshes import MeshConfig, make_mesh
from frameino_tpu.models import cogvideox_dit, wan_dit, wan_vae
from frameino_tpu.parallel.pipeline import (pipeline_blocks, stage_params,
                                            supports_pp)
from frameino_tpu.parallel.sharding import dit_param_specs, shard_pytree


def _toy(L=8, B=4, S=16, D=32):
    ks = jax.random.split(jax.random.key(0), 4)
    W = jax.random.normal(ks[0], (L, D, D)) * 0.1
    b = jax.random.normal(ks[1], (L, D)) * 0.1
    x = jax.random.normal(ks[2], (B, S, D))
    ctx = jax.random.normal(ks[3], (B, 1, D))
    rope = jnp.linspace(0.0, 1.0, D)

    def block_fn(lp, h, aux, shared):
        w, bb = lp
        return jnp.tanh(h @ w + bb + aux + shared)

    return (W, b), x, ctx, rope, block_fn


def _plain(stacked, x, ctx, rope, block_fn):
    def body(c, lp):
        return block_fn(lp, c, ctx, rope), None

    h, _ = jax.lax.scan(body, x, stacked)
    return h


@pytest.mark.parametrize("pp,m", [(2, 2), (2, 4), (4, 4), (4, 8)])
def test_pipeline_matches_scan(pp, m):
    stacked, x, ctx, rope, block_fn = _toy(B=8)
    want = _plain(stacked, x, ctx, rope, block_fn)
    mesh = make_mesh(MeshConfig(dp=8 // pp, pp=pp))
    got = jax.jit(lambda x: pipeline_blocks(
        mesh, stacked, x, ctx, rope, block_fn, microbatches=m))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_pipeline_gradients_match(pp=4, m=4):
    stacked, x, ctx, rope, block_fn = _toy()
    mesh = make_mesh(MeshConfig(dp=8 // pp, pp=pp))

    def loss_plain(stacked):
        return jnp.sum(_plain(stacked, x, ctx, rope, block_fn) ** 2)

    def loss_pp(stacked):
        h = pipeline_blocks(mesh, stacked, x, ctx, rope, block_fn,
                            microbatches=m, remat=True)
        return jnp.sum(h ** 2)

    g1 = jax.jit(jax.grad(loss_plain))(stacked)
    g2 = jax.jit(jax.grad(loss_pp))(stacked)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_stage_params_and_support():
    stacked, x, *_ = _toy(L=6)
    st = stage_params(stacked, 3)
    assert st[0].shape[:2] == (3, 2)
    with pytest.raises(ValueError):
        stage_params(stacked, 4)
    mesh = make_mesh(MeshConfig(dp=4, pp=2))
    assert supports_pp(mesh, num_layers=6, batch=4)
    assert not supports_pp(mesh, num_layers=5, batch=4)
    assert not supports_pp(mesh, num_layers=6, batch=3)
    assert not supports_pp(None, num_layers=6, batch=4)
    assert not supports_pp(make_mesh(MeshConfig(dp=8)), 6, 4)


def _wan_tiny():
    return wan_dit.WanDiTConfig(
        num_attention_heads=4, attention_head_dim=24, in_channels=8,
        out_channels=4, text_dim=32, freq_dim=32, ffn_dim=128, num_layers=4)


def test_wan_forward_pp_matches_plain():
    cfg = _wan_tiny()
    params = wan_dit.init_wan_dit(jax.random.key(0), cfg)
    B, C, F, H, W = 2, 8, 3, 8, 8
    x = jax.random.normal(jax.random.key(1), (B, C, F, H, W), jnp.float32)
    t = jnp.array([500.0, 700.0])
    text = jax.random.normal(jax.random.key(2), (B, 16, 32), jnp.float32)
    S = F * (H // 2) * (W // 2)
    mask = jnp.broadcast_to(
        (jnp.arange(S)[None, :] >= S // 3).astype(jnp.float32), (B, S))

    want = wan_dit.wan_dit_forward(cfg, params, x, t, text,
                                   timestep_mask=mask, attn_impl="xla")
    # pp composed with tp: block params shard P('pp', ..., 'tp')
    mesh = make_mesh(MeshConfig(dp=2, tp=2, pp=2))
    specs = dit_param_specs(params, mesh)
    ps = shard_pytree(params, mesh, specs)
    got = jax.jit(lambda p: wan_dit.wan_dit_forward(
        cfg, p, x, t, text, timestep_mask=mask, attn_impl="xla",
        mesh=mesh))(ps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_wan_forward_pp_rejects_bad_shapes():
    cfg = _wan_tiny()
    params = wan_dit.init_wan_dit(jax.random.key(0), cfg)
    x = jnp.zeros((1, 8, 3, 8, 8), jnp.float32)          # batch 1 < M=2
    t = jnp.array([500.0])
    text = jnp.zeros((1, 16, 32), jnp.float32)
    mesh = make_mesh(MeshConfig(dp=4, pp=2))
    with pytest.raises(ValueError, match="pp=2 needs"):
        wan_dit.wan_dit_forward(cfg, params, x, t, text, attn_impl="xla",
                                mesh=mesh)
    mesh_sp = make_mesh(MeshConfig(dp=2, sp=2, pp=2))
    with pytest.raises(ValueError, match="pp and sp"):
        wan_dit.wan_dit_forward(cfg, params, jnp.zeros((2, 8, 3, 8, 8)),
                                jnp.zeros((2,)), jnp.zeros((2, 16, 32)),
                                attn_impl="xla", mesh=mesh_sp)


def test_cog_forward_pp_matches_plain():
    cfg = cogvideox_dit.tiny_config(num_layers=4)
    params = cogvideox_dit.init_cogvideox_dit(jax.random.key(0), cfg)
    B, F, H, W = 2, 2, 8, 8
    x = jax.random.normal(jax.random.key(1),
                          (B, F, cfg.in_channels, H, W), jnp.float32)
    text = jax.random.normal(jax.random.key(2), (B, 8, cfg.text_embed_dim),
                             jnp.float32)
    ts = jnp.array([300.0, 600.0])
    cos, sin = cogvideox_dit.cogvideox_rope(cfg, F, H, W)
    want = cogvideox_dit.cogvideox_forward(
        cfg, params, x, text, ts, image_rotary_emb=(cos, sin),
        attn_impl="xla")
    mesh = make_mesh(MeshConfig(dp=2, fsdp=2, pp=2))
    ps = shard_pytree(params, mesh)
    got = jax.jit(lambda p: cogvideox_dit.cogvideox_forward(
        cfg, p, x, text, ts, image_rotary_emb=(cos, sin), attn_impl="xla",
        mesh=mesh))(ps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_train_step_on_pp_mesh():
    """Full sharded train step (VAE encodes in-graph) on a dp2/tp2/pp2
    mesh: one step runs, loss finite, params update."""
    from frameino_tpu.training import (OptimizerConfig, TrainerConfig,
                                       make_optimizer,
                                       make_sharded_train_state,
                                       make_train_step)

    dit_cfg = _wan_tiny()
    vae_cfg = wan_vae.WanVAEConfig(
        base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
        temperal_downsample=(True,), is_residual=False, patch_size=None,
        scale_factor_temporal=2, scale_factor_spatial=2,
        latents_mean=tuple([0.0] * 4), latents_std=tuple([1.0] * 4))
    tcfg = TrainerConfig(compute_dtype=jnp.float32, remat=True,
                         attn_impl="xla")
    mesh = make_mesh(MeshConfig(dp=2, tp=2, pp=2))
    dit_params = wan_dit.init_wan_dit(jax.random.key(0), dit_cfg)
    vae_params = wan_vae.init_wan_vae(jax.random.key(1), vae_cfg)
    opt = make_optimizer(OptimizerConfig(lr_warmup_steps=1))
    state = make_sharded_train_state(dit_params, opt, mesh)
    step = make_train_step(dit_cfg, vae_cfg, tcfg, opt, mesh=mesh,
                           dp_size=2)
    B, F, H, W = 2, 5, 16, 16
    ks = jax.random.split(jax.random.key(9), 4)
    batch = {
        "video_tensor": jax.random.normal(ks[0], (B, F, 3, H, W)),
        "first_frame_tensor": jax.random.normal(ks[1], (B, 3, H, W)),
        "traj_tensor": jax.random.normal(ks[2], (B, F, 3, H, W)),
        "prompt_embeds": jax.random.normal(ks[3], (B, 16, 32)),
    }
    state, metrics = step(state, vae_params, batch, jax.random.key(2))
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    assert float(metrics["grad_norm"]) > 0.0
    assert int(state.step) == 1
