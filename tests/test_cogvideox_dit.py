"""CogVideoX DiT tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import torch

from frameino_tpu.models import cogvideox_dit as M

CFG = M.tiny_config()


def _params():
    return M.init_cogvideox_dit(jax.random.key(0), CFG)


def _inputs(key=1, B=2, F=3, H=8, W=8):
    ks = jax.random.split(jax.random.key(key), 3)
    video = jax.random.normal(ks[0], (B, F, CFG.in_channels, H, W))
    text = jax.random.normal(ks[1], (B, CFG.max_text_seq_length,
                                     CFG.text_embed_dim))
    t = jnp.array([100.0, 900.0])[:B]
    return video, text, t


class TestForward:
    def test_output_shape(self):
        p = _params()
        video, text, t = _inputs()
        rope = M.cogvideox_rope(CFG, 3, 8, 8)
        out = M.cogvideox_forward(CFG, p, video, text, t,
                                  image_rotary_emb=rope, attn_impl="xla")
        assert out.shape == (2, 3, CFG.out_channels, 8, 8)
        assert np.isfinite(np.asarray(out)).all()

    def test_rope_optional(self):
        p = _params()
        video, text, t = _inputs(B=1)
        a = M.cogvideox_forward(CFG, p, video[:1], text[:1], t[:1],
                                attn_impl="xla")
        rope = M.cogvideox_rope(CFG, 3, 8, 8)
        b = M.cogvideox_forward(CFG, p, video[:1], text[:1], t[:1],
                                image_rotary_emb=rope, attn_impl="xla")
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_frame_in_rope_duplicates_first_frame(self):
        cos, sin = M.cogvideox_rope(CFG, 3, 8, 8,
                                    duplicate_first_frame_for_id=True)
        per_frame = 4 * 4
        assert cos.shape[0] == 4 * per_frame
        np.testing.assert_allclose(np.asarray(cos[-per_frame:]),
                                   np.asarray(cos[:per_frame]))

    def test_variable_resolution_pos_resize(self):
        """Non-default resolution triggers the trilinear pos-embed resize
        (embeddings.py:781-798)."""
        p = _params()
        B, F, H, W = 1, 3, 12, 12
        video = jax.random.normal(jax.random.key(2),
                                  (B, F, CFG.in_channels, H, W))
        text = jax.random.normal(jax.random.key(3),
                                 (B, CFG.max_text_seq_length,
                                  CFG.text_embed_dim))
        rope = M.cogvideox_rope(CFG, F, H, W)
        out = M.cogvideox_forward(CFG, p, video, text, jnp.array([500.0]),
                                  image_rotary_emb=rope, attn_impl="xla")
        assert out.shape == (B, F, CFG.out_channels, H, W)
        assert np.isfinite(np.asarray(out)).all()

    def test_frame_in_pos_append(self):
        """use_frame_in appends one frame of positional embeddings for the
        ID frame (with the reference's text-offset quirk)."""
        cfg = dataclasses.replace(CFG, use_frame_in=True)
        p = M.init_cogvideox_dit(jax.random.key(0), cfg)
        B, F, H, W = 1, 4, 8, 8   # 3 video latent frames + 1 ID frame
        video = jax.random.normal(jax.random.key(4),
                                  (B, F, cfg.in_channels, H, W))
        text = jax.random.normal(jax.random.key(5),
                                 (B, cfg.max_text_seq_length,
                                  cfg.text_embed_dim))
        rope = M.cogvideox_rope(cfg, 3, 8, 8,
                                duplicate_first_frame_for_id=True)
        out = M.cogvideox_forward(cfg, p, video, text, jnp.array([500.0]),
                                  image_rotary_emb=rope, attn_impl="xla")
        assert out.shape == (B, F, cfg.out_channels, H, W)

    def test_unpatchify_against_torch(self):
        """proj-out reshape path == the reference permutation."""
        B, F, Hp, Wp, C, p = 1, 2, 3, 3, 4, 2
        rs = np.random.RandomState(0)
        h = rs.randn(B, F * Hp * Wp, C * p * p).astype(np.float32)

        ht = torch.from_numpy(h)
        ref = ht.reshape(B, F, Hp, Wp, -1, p, p)
        ref = ref.permute(0, 1, 4, 2, 5, 3, 6).flatten(5, 6).flatten(3, 4)

        x = jnp.asarray(h).reshape(B, F, Hp, Wp, -1, p, p)
        x = x.transpose(0, 1, 4, 2, 5, 3, 6).reshape(B, F, C, Hp * p, Wp * p)
        np.testing.assert_allclose(np.asarray(x), ref.numpy())

    def test_grad_flows(self):
        p = _params()
        video, text, t = _inputs(B=1)
        rope = M.cogvideox_rope(CFG, 3, 8, 8)

        def loss(params):
            out = M.cogvideox_forward(CFG, params, video[:1], text[:1],
                                      t[:1], image_rotary_emb=rope,
                                      attn_impl="xla", differentiable=True)
            return jnp.mean(out ** 2)

        g = jax.grad(loss)(p)
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree.leaves(g))
        assert float(jnp.abs(g["blocks"]["attn1"]["to_q"]["kernel"]).sum()) > 0


def test_fused_ln_producer_attention_matches_unfused():
    """Cog forward with the fused per-head-LayerNorm + joint-RoPE pallas
    producers (interpret mode) == the unfused XLA path."""
    from frameino_tpu.models import cogvideox_dit as M
    from frameino_tpu.ops import attention as attn_ops
    cfg = M.tiny_config()
    params = M.init_cogvideox_dit(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1),
                          (1, 3, cfg.in_channels, 8, 8), jnp.float32)
    text = jax.random.normal(jax.random.key(2),
                             (1, cfg.max_text_seq_length,
                              cfg.text_embed_dim))
    t = jnp.array([500.0])
    rope = tuple(jnp.asarray(r) for r in M.cogvideox_rope(cfg, 3, 8, 8))
    ref = M.cogvideox_forward(cfg, params, x, text, t,
                              image_rotary_emb=rope, attn_impl="xla")
    attn_ops.FORCE_INTERPRET = True
    try:
        fused = M.cogvideox_forward(cfg, params, x, text, t,
                                    image_rotary_emb=rope,
                                    attn_impl="pallas")
    finally:
        attn_ops.FORCE_INTERPRET = False
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)
