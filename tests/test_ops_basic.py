"""Tests for norms, rope, conv, embeddings against torch semantics.

torch (CPU) is available in the test environment, so the primitive ops
are checked directly against the torch functions the reference uses
(F.layer_norm, F.normalize, nn.Conv3d with causal padding, etc.) without
importing any reference code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from frameino_tpu.ops import conv as conv_ops
from frameino_tpu.ops import norms, rope
from frameino_tpu.ops import embeddings as emb_ops


class TestNorms:
    def test_layer_norm_vs_torch(self):
        x = np.random.RandomState(0).randn(2, 5, 32).astype(np.float32)
        w = np.random.RandomState(1).randn(32).astype(np.float32)
        b = np.random.RandomState(2).randn(32).astype(np.float32)
        got = norms.layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                               eps=1e-6)
        ref = F.layer_norm(torch.from_numpy(x), (32,), torch.from_numpy(w),
                           torch.from_numpy(b), eps=1e-6).numpy()
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)

    def test_rms_norm_vs_torch(self):
        x = np.random.RandomState(0).randn(2, 7, 64).astype(np.float32)
        w = np.random.RandomState(1).rand(64).astype(np.float32)
        got = norms.rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-6)
        xt = torch.from_numpy(x)
        var = xt.pow(2).mean(-1, keepdim=True)
        ref = (xt * torch.rsqrt(var + 1e-6) * torch.from_numpy(w)).numpy()
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)

    def test_l2_normalize_channel_vs_torch(self):
        # WanRMS_norm: F.normalize(x, dim=-1 for channels-last) * sqrt(dim) * gamma
        x = np.random.RandomState(0).randn(2, 3, 4, 4, 16).astype(np.float32)
        gamma = np.random.RandomState(1).randn(16).astype(np.float32)
        got = norms.l2_normalize_channel(jnp.asarray(x), 16 ** 0.5,
                                         jnp.asarray(gamma), axis=-1)
        xt = torch.from_numpy(x)
        ref = (F.normalize(xt, dim=-1) * (16 ** 0.5)
               * torch.from_numpy(gamma)).numpy()
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


class TestCausalConv3d:
    @pytest.mark.parametrize("stride", [(1, 1, 1), (2, 1, 1), (1, 2, 2)])
    def test_vs_torch_causal(self, stride):
        """Channels-last causal conv == torch Conv3d with (2pt,0,ph,ph,pw,pw)
        asymmetric padding (the WanCausalConv3d recipe)."""
        rs = np.random.RandomState(0)
        cin, cout, kt, kh, kw = 4, 6, 3, 3, 3
        pt, ph, pw = 1, 1, 1
        x = rs.randn(1, 9, 8, 8, cin).astype(np.float32)
        w = rs.randn(cout, cin, kt, kh, kw).astype(np.float32) * 0.2
        b = rs.randn(cout).astype(np.float32)

        got = conv_ops.causal_conv3d(
            jnp.asarray(x),
            jnp.asarray(w).transpose(2, 3, 4, 1, 0),  # OIDHW -> DHWIO
            jnp.asarray(b), stride=stride, padding=(pt, ph, pw))

        xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)  # NTHWC->NCTHW
        xt = F.pad(xt, (pw, pw, ph, ph, 2 * pt, 0))
        ref = F.conv3d(xt, torch.from_numpy(w), torch.from_numpy(b),
                       stride=stride)
        ref = ref.permute(0, 2, 3, 4, 1).numpy()
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)

    def test_causality(self):
        """Output at frame t must not depend on frames > t."""
        rs = np.random.RandomState(1)
        w = jnp.asarray(rs.randn(3, 3, 3, 2, 2).astype(np.float32))
        x = jnp.asarray(rs.randn(1, 8, 4, 4, 2).astype(np.float32))
        y1 = conv_ops.causal_conv3d(x, w, padding=(1, 1, 1))
        x2 = x.at[:, 5:].set(99.0)
        y2 = conv_ops.causal_conv3d(x2, w, padding=(1, 1, 1))
        np.testing.assert_allclose(np.asarray(y1[:, :5]),
                                   np.asarray(y2[:, :5]), atol=1e-5)

    def test_nearest_exact_upsample(self):
        x = np.arange(8.0).reshape(1, 2, 2, 2, 1).astype(np.float32)
        got = conv_ops.nearest_exact_upsample2d(jnp.asarray(x))
        xt = torch.from_numpy(x).reshape(2, 2, 2, 1).permute(0, 3, 1, 2)
        ref = F.interpolate(xt, scale_factor=2.0, mode="nearest-exact")
        ref = ref.permute(0, 2, 3, 1).reshape(1, 2, 4, 4, 1).numpy()
        np.testing.assert_allclose(np.asarray(got), ref)


class TestRope:
    def test_interleaved_rotation_vs_torch_recipe(self):
        """apply_rope_interleaved == the Wan processor's inline function
        (reference transformer_wan.py:75-87) given repeat-interleaved
        cos/sin tables."""
        rs = np.random.RandomState(0)
        S, D = 12, 16
        x = rs.randn(1, 2, S, D).astype(np.float32)
        ang = rs.rand(S, D // 2).astype(np.float32)
        cos_half, sin_half = np.cos(ang), np.sin(ang)

        got = rope.apply_rope_interleaved(jnp.asarray(x),
                                          jnp.asarray(cos_half),
                                          jnp.asarray(sin_half))

        # torch re-enactment with repeat-interleaved [S, D] tables
        freqs_cos = torch.from_numpy(cos_half).repeat_interleave(2, dim=1)
        freqs_sin = torch.from_numpy(sin_half).repeat_interleave(2, dim=1)
        xt = torch.from_numpy(x)
        xr = xt.view(*xt.shape[:-1], -1, 2)
        x1, x2 = xr[..., 0], xr[..., 1]
        cos = freqs_cos[..., 0::2]
        sin = freqs_sin[..., 1::2]
        out = torch.empty_like(xt)
        out[..., 0::2] = x1 * cos - x2 * sin
        out[..., 1::2] = x1 * sin + x2 * cos
        np.testing.assert_allclose(np.asarray(got), out.numpy(), atol=1e-5)

    def test_cogvideox_rotation_equivalence(self):
        """The CogVideoX apply_rotary_emb (x*cos + rotate(x)*sin with
        repeat-interleaved tables, reference embeddings.py:1239-1258) equals
        the same interleaved rotation."""
        rs = np.random.RandomState(3)
        S, D = 6, 8
        x = rs.randn(1, 1, S, D).astype(np.float32)
        ang = rs.rand(S, D // 2).astype(np.float32)

        got = rope.apply_rope_interleaved(jnp.asarray(x),
                                          jnp.asarray(np.cos(ang)),
                                          jnp.asarray(np.sin(ang)))

        cos = torch.from_numpy(np.cos(ang)).repeat_interleave(2, dim=1)
        sin = torch.from_numpy(np.sin(ang)).repeat_interleave(2, dim=1)
        xt = torch.from_numpy(x)
        x_real, x_imag = xt.reshape(*xt.shape[:-1], -1, 2).unbind(-1)
        x_rot = torch.stack([-x_imag, x_real], dim=-1).flatten(3)
        ref = (xt * cos[None, None] + x_rot * sin[None, None]).numpy()
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)

    def test_wan_table_dims(self):
        cos, sin = rope.wan_rope_table(128, f=3, h=4, w=5)
        assert cos.shape == (60, 64) and sin.shape == (60, 64)
        # t/h/w angle split: 22 + 21 + 21 halves
        assert np.allclose(cos[0, :], cos[0, :])  # smoke
        # temporal frequency changes along f only
        c3d = cos.reshape(3, 4, 5, 64)
        assert not np.allclose(c3d[0, 0, 0, :22], c3d[1, 0, 0, :22])
        assert np.allclose(c3d[0, 0, 0, 22:], c3d[1, 0, 0, 22:])


class TestTimestepEmbedding:
    def test_vs_torch_diffusers_formula(self):
        """Matches diffusers get_timestep_embedding(flip_sin_to_cos=True,
        downscale_freq_shift=0) re-enacted in torch."""
        t = np.array([0.0, 1.0, 500.0, 999.0], np.float32)
        dim = 64
        got = emb_ops.sinusoidal_timestep_embedding(jnp.asarray(t), dim)

        half = dim // 2
        exponent = -np.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
        emb = torch.exp(exponent)[None] * torch.from_numpy(t)[:, None]
        emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
        emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)  # flip
        np.testing.assert_allclose(np.asarray(got), emb.numpy(), atol=1e-5)
