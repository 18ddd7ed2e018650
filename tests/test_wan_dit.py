"""Wan DiT tests: shapes, patch-embed == Conv3d, per-token timesteps,
unpatchify inverse, gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from frameino_tpu.models import wan_dit as M

CFG = M.tiny_config()


def _params():
    return M.init_wan_dit(jax.random.key(0), CFG)


def _inputs(key=1, B=2, F_=4, H=8, W=8):
    ks = jax.random.split(jax.random.key(key), 3)
    x = jax.random.normal(ks[0], (B, CFG.in_channels, F_, H, W))
    t = jnp.array([100.0, 500.0])[:B]
    text = jax.random.normal(ks[1], (B, 7, CFG.text_dim))
    return x, t, text


class TestForward:
    def test_output_shape(self):
        p = _params()
        x, t, text = _inputs()
        out = M.wan_dit_forward(CFG, p, x, t, text, attn_impl="xla")
        assert out.shape == (2, CFG.out_channels, 4, 8, 8)
        assert np.isfinite(np.asarray(out)).all()

    def test_per_token_timestep_matches_scalar(self):
        """A constant per-token timestep vector must equal the scalar path
        (reference transformer_wan.py:489-504 expand_timesteps)."""
        p = _params()
        x, t, text = _inputs(B=1)
        S = (4 // 1) * (8 // 2) * (8 // 2)
        out_scalar = M.wan_dit_forward(CFG, p, x, t[:1], text, attn_impl="xla")
        t2d = jnp.full((1, S), float(t[0]))
        out_2d = M.wan_dit_forward(CFG, p, x, t2d, text, attn_impl="xla")
        np.testing.assert_allclose(np.asarray(out_scalar), np.asarray(out_2d),
                                   atol=1e-4, rtol=1e-4)

    def test_patch_embed_equals_conv3d(self):
        """Dense patchify == torch Conv3d(kernel=stride=patch)."""
        p = _params()
        x, _, _ = _inputs(B=1)
        tokens = M._patchify_tokens(x, CFG.patch_size)
        got = np.asarray(tokens @ p["patch_embedding"]["kernel"]
                         + p["patch_embedding"]["bias"])

        # torch conv with weight reconstructed from the dense kernel
        d = CFG.inner_dim
        pt, ph, pw = CFG.patch_size
        wk = np.asarray(p["patch_embedding"]["kernel"])  # [C*pt*ph*pw, D]
        w = wk.T.reshape(d, CFG.in_channels, pt, ph, pw)
        ref = F.conv3d(torch.from_numpy(np.asarray(x)),
                       torch.from_numpy(w),
                       torch.from_numpy(np.asarray(p["patch_embedding"]["bias"])),
                       stride=(pt, ph, pw))
        ref = ref.flatten(2).transpose(1, 2).numpy()  # [B, S, D]
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_unpatchify_inverse(self):
        x = jax.random.normal(jax.random.key(3), (2, 8, 4, 8, 8))
        toks = M._patchify_tokens(x, (1, 2, 2))
        # _patchify emits (C, pt, ph, pw)-last vectors; _unpatchify expects
        # the proj_out layout (..., pt, ph, pw, C) per the reference
        # reshape — permute accordingly, then the roundtrip must be exact.
        B, S, D = toks.shape
        y = toks.reshape(B, 4, 4, 4, 8, 1, 2, 2)      # B,f,h,w,C,pt,ph,pw
        y = y.transpose(0, 1, 2, 3, 5, 6, 7, 4)       # -> pt,ph,pw,C last
        y = y.reshape(B, S, 32)
        back = M._unpatchify_tokens(y, (4, 4, 4), (1, 2, 2), 8)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)

    def test_grad_flows(self):
        p = _params()
        x, t, text = _inputs(B=1)

        def loss(params):
            out = M.wan_dit_forward(CFG, params, x, t[:1], text,
                                    attn_impl="xla", differentiable=True)
            return jnp.mean(out ** 2)

        g = jax.grad(loss)(p)
        leaves = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        # scale_shift_table and attention weights get nonzero grads
        assert float(jnp.abs(g["blocks"]["scale_shift_table"]).sum()) > 0
        assert float(jnp.abs(g["blocks"]["attn1"]["to_q"]["kernel"]).sum()) > 0

    def test_remat_matches(self):
        p = _params()
        x, t, text = _inputs(B=1)
        a = M.wan_dit_forward(CFG, p, x, t[:1], text, attn_impl="xla")
        b = M.wan_dit_forward(CFG, p, x, t[:1], text, attn_impl="xla",
                              remat=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestAdaLNMath:
    def test_block_adaln_against_torch(self):
        """The 6-way AdaLN modulation (reference :329-336) re-enacted in
        torch on random tensors."""
        rs = np.random.RandomState(0)
        B, S, D = 1, 5, 8
        x = rs.randn(B, S, D).astype(np.float32)
        table = rs.randn(1, 6, D).astype(np.float32)
        tproj = rs.randn(B, 6, D).astype(np.float32)

        # torch path
        xt = torch.from_numpy(x)
        mod = torch.from_numpy(table) + torch.from_numpy(tproj)
        shift, scale, gate = mod.chunk(6, dim=1)[:3]
        normed = F.layer_norm(xt, (D,), eps=1e-6)
        ref = normed * (1 + scale) + shift

        # jax path (mirrors _block_forward's modulation)
        from frameino_tpu.ops.norms import layer_norm
        modj = jnp.asarray(table)[None] + jnp.asarray(tproj).reshape(B, 1, 6, D)
        sh, sc = [m[:, :, 0] for m in jnp.split(modj, 6, axis=2)][:2]
        got = layer_norm(jnp.asarray(x), eps=1e-6) * (1 + sc) + sh
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-5)


def test_timestep_mask_two_level_equivalence():
    """timestep_mask fast path == explicit per-token (mask * t) vector.

    The Wan2.2 expand path's per-token timesteps take only two values
    (reference pipeline_wan_i2v_motion_FrameINO.py:832-843); the
    two-level select must match the general [B, S] path exactly.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from frameino_tpu.models import wan_dit

    cfg = wan_dit.tiny_config()
    params = wan_dit.init_wan_dit(jax.random.key(0), cfg)
    B, F, H, W = 2, 3, 4, 4
    S = F * (H // 2) * (W // 2)
    x = jax.random.normal(jax.random.key(1), (B, cfg.in_channels, F, H, W))
    text = jax.random.normal(jax.random.key(2), (B, 4, cfg.text_dim))
    t = jnp.asarray([700.0, 300.0])
    mask = (jax.random.uniform(jax.random.key(3), (B, S)) > 0.4
            ).astype(jnp.float32)

    ref = wan_dit.wan_dit_forward(cfg, params, x, mask * t[:, None], text)
    fast = wan_dit.wan_dit_forward(cfg, params, x, t, text,
                                   timestep_mask=mask)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_producer_attention_matches_unfused():
    """wan_dit forward with the fused-producer pallas path (in-kernel
    qk-norm + RoPE, interpret mode) == the unfused XLA path."""
    from frameino_tpu.models import wan_dit
    from frameino_tpu.ops import attention as attn_ops
    cfg = wan_dit.tiny_config()
    params = wan_dit.init_wan_dit(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1),
                          (1, cfg.in_channels, 2, 8, 8), jnp.float32)
    t = jnp.full((1,), 500.0)
    text = jax.random.normal(jax.random.key(2), (1, 8, cfg.text_dim))
    ref = wan_dit.wan_dit_forward(cfg, params, x, t, text,
                                  attn_impl="xla")
    attn_ops.FORCE_INTERPRET = True
    try:
        fused = wan_dit.wan_dit_forward(cfg, params, x, t, text,
                                        attn_impl="pallas")
    finally:
        attn_ops.FORCE_INTERPRET = False
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_precompute_text_kv_matches_in_step_projection():
    """wan_dit_forward(text_kv=precompute_text_kv(...)) == the plain
    forward — the hoisted projections are the same ops in the same
    order, so equality is exact (serving hoists them out of the
    denoise scan; pipelines/wan_i2v.py denoise_segment)."""
    cfg = M.tiny_config()
    params = M.init_wan_dit(jax.random.key(0), cfg)
    x, t, text = _inputs(B=2)
    ref = M.wan_dit_forward(cfg, params, x, t, text, attn_impl="xla")
    kv = M.precompute_text_kv(cfg, params, text, dtype=x.dtype)
    assert kv["k"].shape == (cfg.num_layers, 2, cfg.num_attention_heads,
                             text.shape[1], cfg.attention_head_dim)
    got = M.wan_dit_forward(cfg, params, x, t, None, attn_impl="xla",
                            text_kv=kv)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_precompute_text_kv_image_branch():
    """Wan2.1 I2V: the CLIP image-KV branch (add_k_proj) rides in the
    precomputed tree as k_img/v_img and matches the in-step path."""
    cfg = M.tiny_config(image_dim=12, added_kv_proj_dim=48)
    params = M.init_wan_dit(jax.random.key(0), cfg)
    x, t, text = _inputs(B=2)
    img = jax.random.normal(jax.random.key(9), (2, 5, cfg.image_dim))
    ref = M.wan_dit_forward(cfg, params, x, t, text,
                            encoder_hidden_states_image=img,
                            attn_impl="xla")
    kv = M.precompute_text_kv(cfg, params, text, img, dtype=x.dtype)
    assert "k_img" in kv and "v_img" in kv
    got = M.wan_dit_forward(cfg, params, x, t, None, attn_impl="xla",
                            text_kv=kv)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
