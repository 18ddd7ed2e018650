"""Sequence parallelism integrated into the Wan DiT forward.

VERDICT r1 item 2: ``sp_attention`` must be wired into the model (not a
standalone op) and an sp>1 mesh must produce numerically equal results to
the unsharded forward. Runs on the 8-device virtual CPU mesh (conftest).

Reference counterpart: none — the reference is single-device SDPA
(``architecture/transformer_wan.py:108-110``); SP is TPU headroom.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frameino_tpu.core.meshes import MeshConfig, make_mesh
from frameino_tpu.models import wan_dit


def _setup(seq_frames=4, hw=(8, 8)):
    cfg = wan_dit.tiny_config(num_attention_heads=4, attention_head_dim=16,
                              num_layers=2)
    params = wan_dit.init_wan_dit(jax.random.key(0), cfg)
    B, F, H, W = 2, seq_frames, *hw
    ks = jax.random.split(jax.random.key(1), 3)
    x = jax.random.normal(ks[0], (B, cfg.in_channels, F, H, W))
    t = jnp.full((B,), 500.0)
    text = jax.random.normal(ks[2], (B, 8, cfg.text_dim))
    return cfg, params, (x, t, text)


@pytest.mark.parametrize("mcfg", [
    MeshConfig(dp=2, fsdp=1, tp=2, sp=2),
    MeshConfig(dp=1, fsdp=2, tp=1, sp=4),
    MeshConfig(dp=1, fsdp=1, tp=1, sp=8),
])
def test_sp_forward_matches_unsharded(mcfg):
    cfg, params, args = _setup()
    ref = jax.jit(lambda p, *a: wan_dit.wan_dit_forward(cfg, p, *a))(
        params, *args)

    mesh = make_mesh(mcfg, devices=jax.devices()[:mcfg.size])
    with mesh:
        out = jax.jit(lambda p, *a: wan_dit.wan_dit_forward(
            cfg, p, *a, mesh=mesh))(params, *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sp_forward_per_token_timesteps():
    """Wan2.2 TI2V per-token timesteps under an sp mesh."""
    cfg, params, (x, _, text) = _setup()
    B = x.shape[0]
    S = (x.shape[2] // 1) * (x.shape[3] // 2) * (x.shape[4] // 2)
    t2d = jnp.tile(jnp.linspace(0.0, 900.0, S)[None], (B, 1))
    ref = jax.jit(lambda p: wan_dit.wan_dit_forward(cfg, p, x, t2d, text))(
        params)
    mesh = make_mesh(MeshConfig(dp=2, fsdp=1, tp=2, sp=2),
                     devices=jax.devices()[:8])
    with mesh:
        out = jax.jit(lambda p: wan_dit.wan_dit_forward(
            cfg, p, x, t2d, text, mesh=mesh))(params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sp_gradients_match_unsharded():
    """Backward through the shard_map (all_gather → psum_scatter)."""
    cfg, params, args = _setup()

    def loss(p, mesh):
        out = wan_dit.wan_dit_forward(cfg, p, *args, differentiable=True,
                                      mesh=mesh)
        return jnp.mean(jnp.square(out.astype(jnp.float32)))

    g_ref = jax.jit(jax.grad(lambda p: loss(p, None)))(params)
    mesh = make_mesh(MeshConfig(dp=2, fsdp=1, tp=2, sp=2),
                     devices=jax.devices()[:8])
    with mesh:
        g_sp = jax.jit(jax.grad(lambda p: loss(p, mesh)))(params)

    flat_ref = jax.tree.leaves(g_ref)
    flat_sp = jax.tree.leaves(g_sp)
    for a, b in zip(flat_ref, flat_sp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-5, atol=5e-5)


def test_sp_falls_back_when_indivisible():
    """Sequence not divisible by sp -> regular attention, same result."""
    cfg, params, _ = _setup()
    B = 2
    # F=3, H=W=6 -> S = 3*3*3 = 27, not divisible by sp=2
    x = jax.random.normal(jax.random.key(5), (B, cfg.in_channels, 3, 6, 6))
    t = jnp.full((B,), 500.0)
    text = jax.random.normal(jax.random.key(6), (B, 8, cfg.text_dim))
    ref = wan_dit.wan_dit_forward(cfg, params, x, t, text)
    mesh = make_mesh(MeshConfig(dp=2, fsdp=1, tp=2, sp=2),
                     devices=jax.devices()[:8])
    with mesh:
        out = jax.jit(lambda p: wan_dit.wan_dit_forward(
            cfg, p, x, t, text, mesh=mesh))(params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sp_attention_with_pallas_kernel_interpret():
    """shard_map x pallas_call composition (VERDICT r1 weak #3): the
    Pallas flash kernel runs INSIDE the sp shard_map, in interpret mode
    on the CPU mesh, and matches global XLA attention."""
    from frameino_tpu.ops import attention as attn_ops

    mesh = make_mesh(MeshConfig(dp=2, fsdp=1, tp=2, sp=2),
                     devices=jax.devices()[:8])
    ks = jax.random.split(jax.random.key(11), 3)
    q = jax.random.normal(ks[0], (2, 4, 256, 16))
    k = jax.random.normal(ks[1], (2, 4, 256, 16))
    v = jax.random.normal(ks[2], (2, 4, 256, 16))
    ref = attn_ops.attention_xla(q, k, v)
    attn_ops.FORCE_INTERPRET = True
    try:
        with mesh:
            out = jax.jit(lambda q, k, v: attn_ops.sp_attention(
                q, k, v, mesh, impl="pallas"))(q, k, v)
    finally:
        attn_ops.FORCE_INTERPRET = False
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sp_cogvideox_forward_matches_unsharded():
    """CogVideoX joint [text; video] sequence under an sp>1 mesh equals
    the unsharded forward (text length chosen so L+S divides sp)."""
    from frameino_tpu.models import cogvideox_dit

    cfg = cogvideox_dit.tiny_config(num_attention_heads=4,
                                    max_text_seq_length=8)
    params = cogvideox_dit.init_cogvideox_dit(jax.random.key(0), cfg)
    B, F, H, W = 2, 3, 8, 8
    x = jax.random.normal(jax.random.key(1), (B, F, cfg.in_channels, H, W))
    text = jax.random.normal(jax.random.key(2),
                             (B, 8, cfg.text_embed_dim))
    t = jnp.asarray([500.0, 300.0])
    cos, sin = cogvideox_dit.cogvideox_rope(cfg, F, H, W)
    # joint S = 8 text + 3*4*4 video = 56 = 8*7 -> sp 2/4 divide
    ref = cogvideox_dit.cogvideox_forward(cfg, params, x, text, t,
                                          image_rotary_emb=(cos, sin))
    mesh = make_mesh(MeshConfig(dp=2, fsdp=1, tp=2, sp=2),
                     devices=jax.devices()[:8])
    with mesh:
        out = jax.jit(lambda p: cogvideox_dit.cogvideox_forward(
            cfg, p, x, text, t, image_rotary_emb=(cos, sin),
            mesh=mesh))(params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sp_ring_method_in_dit_forward():
    """Full Wan DiT forward with the ring sp method == unsharded."""
    from frameino_tpu.ops import attention as attn_ops

    cfg, params, args = _setup()
    ref = jax.jit(lambda p, *a: wan_dit.wan_dit_forward(cfg, p, *a))(
        params, *args)
    mesh = make_mesh(MeshConfig(dp=2, fsdp=1, tp=2, sp=2),
                     devices=jax.devices()[:8])
    prev = attn_ops.DEFAULT_SP_METHOD
    attn_ops.DEFAULT_SP_METHOD = "ring"
    try:
        with mesh:
            out = jax.jit(lambda p, *a: wan_dit.wan_dit_forward(
                cfg, p, *a, mesh=mesh))(params, *args)
    finally:
        attn_ops.DEFAULT_SP_METHOD = prev
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_tp_only_mesh_forward_matches_unsharded():
    """sp == 1 multi-device meshes (the tp/fsdp serving layouts): the
    forward must route attention through the shard_map or XLA — never a
    bare pallas_call for GSPMD to replicate — and equal the unsharded
    forward. Regression for the fused-producer guard, which used to
    activate on any sp == 1 mesh."""
    cfg, params, args = _setup()
    ref = jax.jit(lambda p, *a: wan_dit.wan_dit_forward(cfg, p, *a))(
        params, *args)
    for mcfg in (MeshConfig(dp=2, fsdp=2, tp=2, sp=1),
                 MeshConfig(dp=1, fsdp=1, tp=4, sp=1)):
        mesh = make_mesh(mcfg, devices=jax.devices()[:mcfg.size])
        with mesh:
            out = jax.jit(lambda p, *a: wan_dit.wan_dit_forward(
                cfg, p, *a, mesh=mesh))(params, *args)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_tp_only_mesh_pallas_kernel_in_shard_map_interpret():
    """Explicit attn_impl='pallas' on a tp-only mesh runs the kernel
    INSIDE the shard_map on local head shards (interpret mode on CPU)."""
    from frameino_tpu.ops import attention as attn_ops

    cfg, params, args = _setup()
    ref = jax.jit(lambda p, *a: wan_dit.wan_dit_forward(cfg, p, *a))(
        params, *args)
    mesh = make_mesh(MeshConfig(dp=2, fsdp=1, tp=2, sp=1),
                     devices=jax.devices()[:4])
    attn_ops.FORCE_INTERPRET = True
    try:
        with mesh:
            out = jax.jit(lambda p, *a: wan_dit.wan_dit_forward(
                cfg, p, *a, attn_impl="pallas", mesh=mesh))(params, *args)
    finally:
        attn_ops.FORCE_INTERPRET = False
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_dispatch_falls_back_to_xla_when_indivisible():
    """B=1 on a dp=2 mesh cannot shard_map -> XLA attention (GSPMD
    partitions einsums; a bare pallas_call would be replicated)."""
    from frameino_tpu.ops import attention as attn_ops

    mesh = make_mesh(MeshConfig(dp=2, fsdp=1, tp=1, sp=1),
                     devices=jax.devices()[:2])
    assert attn_ops.needs_sharded_attention(mesh)
    assert not attn_ops.needs_sharded_attention(None)
    assert not attn_ops.needs_sharded_attention(
        make_mesh(MeshConfig(dp=1, fsdp=1, tp=1, sp=1),
                  devices=jax.devices()[:1]))
    ks = jax.random.split(jax.random.key(3), 3)
    q = jax.random.normal(ks[0], (1, 4, 64, 16))
    k = jax.random.normal(ks[1], (1, 4, 64, 16))
    v = jax.random.normal(ks[2], (1, 4, 64, 16))
    ref = attn_ops.attention_xla(q, k, v)
    with mesh:
        out = jax.jit(lambda q, k, v: attn_ops.dispatch_attention(
            q, k, v, mesh=mesh, impl="pallas"))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_tp_only_mesh_gradients_match_unsharded():
    """Training meshes are typically fsdp/tp with sp == 1 — backward
    through the batch/head-sharded attention shard_map must equal the
    unsharded gradients (the default attn_impl=None path)."""
    cfg, params, args = _setup()

    def loss(p, mesh):
        out = wan_dit.wan_dit_forward(cfg, p, *args, differentiable=True,
                                      mesh=mesh)
        return jnp.mean(jnp.square(out.astype(jnp.float32)))

    g_ref = jax.jit(jax.grad(lambda p: loss(p, None)))(params)
    mesh = make_mesh(MeshConfig(dp=2, fsdp=2, tp=2, sp=1),
                     devices=jax.devices()[:8])
    with mesh:
        g_tp = jax.jit(jax.grad(lambda p: loss(p, mesh)))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_tp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-5, atol=5e-5)


# ---------------------------------------------------------------------------
# Fused producers under sharded meshes (VERDICT r3 weak #5 / next #6):
# the qk-norm+RoPE Pallas producers previously ran single-device only,
# silently losing their step win on every sharded mesh.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mcfg", [
    MeshConfig(dp=2, fsdp=1, tp=2, sp=1),     # tp: psum'd RMS statistic
    MeshConfig(dp=1, fsdp=1, tp=4, sp=1),     # tp-only, all heads split
    MeshConfig(dp=1, fsdp=2, tp=1, sp=1),     # batch-only: full-row kernel
])
def test_fused_sharded_matches_single_device_fused(mcfg):
    """fused_qk_flash_attention_sharded == fused_qk_flash_attention on
    the same global tensors (interpret-mode pallas inside shard_map)."""
    from frameino_tpu.ops import attention as attn_ops

    B, H, S, D = 2, 4, 256, 16
    ks = jax.random.split(jax.random.key(21), 5)
    q_raw = jax.random.normal(ks[0], (B, S, H * D))
    k_raw = jax.random.normal(ks[1], (B, S, H * D))
    v = jax.random.normal(ks[2], (B, H, S, D))
    w_q = 1.0 + 0.1 * jax.random.normal(ks[3], (H * D,))
    w_k = 1.0 + 0.1 * jax.random.normal(ks[4], (H * D,))
    cos = jnp.cos(jnp.linspace(0, 3, S * (D // 2)).reshape(S, D // 2))
    sin = jnp.sin(jnp.linspace(0, 3, S * (D // 2)).reshape(S, D // 2))
    eps = 1e-6

    ref = attn_ops.fused_qk_flash_attention(
        q_raw, k_raw, v, w_q, w_k, cos, sin, num_heads=H, eps=eps,
        interpret=True)
    mesh = make_mesh(mcfg, devices=jax.devices()[:mcfg.size])
    assert attn_ops.fused_sharded_supported(mesh, B, H)
    with mesh:
        out = jax.jit(lambda *a: attn_ops.fused_qk_flash_attention_sharded(
            *a, mesh, num_heads=H, eps=eps, interpret=True))(
            q_raw, k_raw, v, w_q, w_k, cos, sin)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_sharded_supported_gates():
    from frameino_tpu.ops import attention as attn_ops

    assert not attn_ops.fused_sharded_supported(None, 2, 4)
    sp_mesh = make_mesh(MeshConfig(dp=1, fsdp=1, tp=1, sp=2),
                        devices=jax.devices()[:2])
    assert not attn_ops.fused_sharded_supported(sp_mesh, 2, 4)
    tp_mesh = make_mesh(MeshConfig(dp=1, fsdp=1, tp=4, sp=1),
                        devices=jax.devices()[:4])
    assert not attn_ops.fused_sharded_supported(tp_mesh, 2, 3)  # H % tp
    dp_mesh = make_mesh(MeshConfig(dp=2, fsdp=1, tp=1, sp=1),
                        devices=jax.devices()[:2])
    assert not attn_ops.fused_sharded_supported(dp_mesh, 1, 4)  # B % dp


def test_wan_forward_takes_fused_sharded_path(monkeypatch):
    """With attn_impl='pallas' on an fsdp/tp mesh the forward must route
    through the SHARDED fused producers (not the unfused shard_map path)
    and still equal the unsharded forward."""
    from frameino_tpu.ops import attention as attn_ops

    cfg, params, args = _setup()
    ref = jax.jit(lambda p, *a: wan_dit.wan_dit_forward(cfg, p, *a))(
        params, *args)

    calls = {"n": 0}
    orig = attn_ops.fused_qk_flash_attention_sharded

    def spy(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(attn_ops, "fused_qk_flash_attention_sharded", spy)
    mesh = make_mesh(MeshConfig(dp=1, fsdp=2, tp=2, sp=1),
                     devices=jax.devices()[:4])
    attn_ops.FORCE_INTERPRET = True
    try:
        with mesh:
            out = jax.jit(lambda p, *a: wan_dit.wan_dit_forward(
                cfg, p, *a, attn_impl="pallas", mesh=mesh))(params, *args)
    finally:
        attn_ops.FORCE_INTERPRET = False
    assert calls["n"] > 0, "sharded fused producer path was not taken"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_cog_forward_takes_fused_sharded_path(monkeypatch):
    """CogVideoX per-head-LN fused producers under a dp/tp mesh (no
    collective needed — LN stats are head-local) equal the unsharded
    forward."""
    from frameino_tpu.models import cogvideox_dit
    from frameino_tpu.ops import attention as attn_ops

    cfg = cogvideox_dit.tiny_config(num_attention_heads=4,
                                    max_text_seq_length=8)
    params = cogvideox_dit.init_cogvideox_dit(jax.random.key(0), cfg)
    B, F, H, W = 2, 2, 8, 8
    ks = jax.random.split(jax.random.key(1), 2)
    x = jax.random.normal(ks[0], (B, F, cfg.in_channels, H, W))
    text = jax.random.normal(ks[1], (B, 8, cfg.text_embed_dim))
    t = jnp.full((B,), 500.0)
    cos, sin = cogvideox_dit.cogvideox_rope(cfg, F, H, W)

    calls = {"n": 0}
    orig = attn_ops.fused_ln_qk_flash_attention_sharded

    def spy(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    attn_ops.FORCE_INTERPRET = True
    try:
        ref = jax.jit(lambda p: cogvideox_dit.cogvideox_forward(
            cfg, p, x, text, t, image_rotary_emb=(cos, sin),
            attn_impl="pallas"))(params)
        monkeypatch.setattr(attn_ops, "fused_ln_qk_flash_attention_sharded",
                            spy)
        mesh = make_mesh(MeshConfig(dp=2, fsdp=1, tp=2, sp=1),
                         devices=jax.devices()[:4])
        with mesh:
            out = jax.jit(lambda p: cogvideox_dit.cogvideox_forward(
                cfg, p, x, text, t, image_rotary_emb=(cos, sin),
                attn_impl="pallas", mesh=mesh))(params)
    finally:
        attn_ops.FORCE_INTERPRET = False
    assert calls["n"] > 0, "sharded LN fused producer path was not taken"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
