"""Wan VAE: full-sequence implementation == reference chunked streaming.

The production model (``frameino_tpu/models/wan_vae.py``) runs each causal
conv once over the whole clip. The reference streams through 1/4-frame
chunks with a per-conv ``feat_cache`` (reference
``architecture/autoencoder_kl_wan.py:1145-1169`` encode, ``:1198-1227``
frame-by-frame decode). This file re-enacts the reference's cache
protocol literally (same parameters, channels-last) and asserts both
paths agree to float tolerance — validating the closed-form equivalences
(frame-0 bypass at downsample3d, "Rep" zeroing at upsample3d, DupUp3D
first-chunk crop) the production model relies on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frameino_tpu.core.tree import unmeta
from frameino_tpu.models import wan_vae as M
from frameino_tpu.ops import conv as cops

pytestmark = pytest.mark.slow

CACHE_T = 2


# ---------------------------------------------------------------------------
# Chunked emulator (mirrors the reference call-site cache protocol)
# ---------------------------------------------------------------------------

def _triple(p):
    return (p, p, p) if isinstance(p, int) else p


def _cconv_fwd(x, p, cache, padding, stride=(1, 1, 1)):
    """WanCausalConv3d.forward (reference :169-176), channels-last."""
    pt, ph, pw = _triple(padding)
    front = 2 * pt
    if cache is not None and front > 0:
        x = jnp.concatenate([cache, x], axis=1)
        front -= cache.shape[1]
    st, sh, sw = _triple(stride) if not isinstance(stride, tuple) else stride
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], window_strides=(st, sh, sw),
        padding=((front, 0), (ph, ph), (pw, pw)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y + p["bias"]


def _cconv_call(x, p, cache, idx, padding):
    """Standard cached call-site (reference resblock :350-358 etc.)."""
    i = idx[0]
    cache_x = x[:, -CACHE_T:]
    if cache_x.shape[1] < 2 and cache[i] is not None:
        cache_x = jnp.concatenate([cache[i][:, -1:], cache_x], axis=1)
    out = _cconv_fwd(x, p, cache[i], padding)
    cache[i] = cache_x
    idx[0] += 1
    return out


def _res_chunk(p, x, cache, idx):
    if "conv_shortcut" in p:
        h = _cconv_fwd(x, p["conv_shortcut"], None, 0)
    else:
        h = x
    x = jax.nn.silu(M._rms(x, p["norm1"]))
    x = _cconv_call(x, p["conv1"], cache, idx, 1)
    x = jax.nn.silu(M._rms(x, p["norm2"]))
    x = _cconv_call(x, p["conv2"], cache, idx, 1)
    return x + h


def _down3d_chunk(p, x, cache, idx):
    x = M.spatial_resample_apply(p, x, "downsample3d")
    i = idx[0]
    if cache[i] is None:
        cache[i] = x
        idx[0] += 1
        return x
    cache_x = x[:, -1:]
    x = _cconv_fwd(jnp.concatenate([cache[i][:, -1:], x], axis=1),
                   p["time_conv"], None, 0, stride=(2, 1, 1))
    cache[i] = cache_x
    idx[0] += 1
    return x


def _up3d_chunk(p, x, cache, idx):
    B, T, H, W, C = x.shape
    i = idx[0]
    if cache[i] is None:
        cache[i] = "Rep"
        idx[0] += 1
    else:
        cache_x = x[:, -CACHE_T:]
        if cache_x.shape[1] < 2 and not isinstance(cache[i], str):
            cache_x = jnp.concatenate([cache[i][:, -1:], cache_x], axis=1)
        if cache_x.shape[1] < 2 and isinstance(cache[i], str):
            cache_x = jnp.concatenate([jnp.zeros_like(cache_x), cache_x],
                                      axis=1)
        if isinstance(cache[i], str):
            x = _cconv_fwd(x, p["time_conv"], None, (1, 0, 0))
        else:
            x = _cconv_fwd(x, p["time_conv"], cache[i], (1, 0, 0))
        cache[i] = cache_x
        idx[0] += 1
        # interleave channel halves -> frame pairs (reference :289-291)
        t = x.shape[1]
        x = x.reshape(B, t, H, W, 2, C)
        x = x.transpose(0, 1, 4, 2, 3, 5).reshape(B, 2 * t, H, W, C)
    return M.spatial_resample_apply(p, x, "upsample3d")


def _encoder_chunk(cfg, params, x, cache, idx):
    x = _cconv_call(x, params["conv_in"], cache, idx, 1)
    for blk in params["down_blocks"]:
        kind = unmeta(blk["kind"])
        if kind == "res":
            x = _res_chunk(blk, x, cache, idx)
        elif kind == "attn":
            x = M.attn_block_apply(blk, x)
        elif kind == "downsample2d":
            x = M.downsample2d_apply(blk, x)
        elif kind == "downsample3d":
            x = _down3d_chunk(blk, x, cache, idx)
        elif kind == "res_down":
            x_copy = x
            for r in blk["resnets"]:
                x = _res_chunk(r, x, cache, idx)
            if blk.get("downsampler") is not None:
                if unmeta(blk["down_mode"]) == "downsample3d":
                    x = _down3d_chunk(blk["downsampler"], x, cache, idx)
                else:
                    x = M.downsample2d_apply(blk["downsampler"], x)
            x = x + M.avg_down3d(x_copy, unmeta(blk["out_dim"]),
                                 unmeta(blk["factor_t"]),
                                 unmeta(blk["factor_s"]))
    x = _res_chunk(params["mid"]["res1"], x, cache, idx)
    x = M.attn_block_apply(params["mid"]["attn"], x)
    x = _res_chunk(params["mid"]["res2"], x, cache, idx)
    x = jax.nn.silu(M._rms(x, params["norm_out"]))
    x = _cconv_call(x, params["conv_out"], cache, idx, 1)
    return x


def chunked_encode(cfg, params, video_cf):
    """Reference _encode (:1145-1169): chunks of 1, 4, 4, ... frames."""
    x = M._to_cl(video_cf)
    if cfg.patch_size is not None:
        x = M.patchify(x, cfg.patch_size)
    T = x.shape[1]
    cache = [None] * 512
    outs = []
    for i in range(1 + (T - 1) // 4):
        idx = [0]
        chunk = x[:, :1] if i == 0 else x[:, 1 + 4 * (i - 1):1 + 4 * i]
        outs.append(_encoder_chunk(cfg, params["encoder"], chunk, cache, idx))
    out = jnp.concatenate(outs, axis=1)
    out = cops.causal_conv3d(out, **params["quant_conv"])
    return M._to_cf(out)


def _decoder_chunk(cfg, params, x, cache, idx, first_chunk):
    x = _cconv_call(x, params["conv_in"], cache, idx, 1)
    x = _res_chunk(params["mid"]["res1"], x, cache, idx)
    x = M.attn_block_apply(params["mid"]["attn"], x)
    x = _res_chunk(params["mid"]["res2"], x, cache, idx)
    for blk in params["up_blocks"]:
        x_copy = x
        for r in blk["resnets"]:
            x = _res_chunk(r, x, cache, idx)
        if blk.get("upsampler") is not None:
            if unmeta(blk["up_mode"]) == "upsample3d":
                x = _up3d_chunk(blk["upsampler"], x, cache, idx)
            else:
                x = M.upsample2d_apply(blk["upsampler"], x)
        if unmeta(blk.get("has_dup_shortcut", False)):
            x = x + M.dup_up3d(x_copy, unmeta(blk["out_dim"]),
                               unmeta(blk["factor_t"]), 2,
                               first_chunk=first_chunk)
    x = jax.nn.silu(M._rms(x, params["norm_out"]))
    x = _cconv_call(x, params["conv_out"], cache, idx, 1)
    return x


def chunked_decode(cfg, params, z_cf):
    """Reference _decode (:1198-1227): frame-by-frame."""
    x = M._to_cl(z_cf)
    x = cops.causal_conv3d(x, **params["post_quant_conv"])
    cache = [None] * 512
    outs = []
    for i in range(x.shape[1]):
        idx = [0]
        outs.append(_decoder_chunk(cfg, params["decoder"], x[:, i:i + 1],
                                   cache, idx, first_chunk=(i == 0)))
    out = jnp.concatenate(outs, axis=1)
    if cfg.patch_size is not None:
        out = M.unpatchify(out, cfg.patch_size)
    out = jnp.clip(M._to_cf(out), -1.0, 1.0)
    return out


# ---------------------------------------------------------------------------
# Tiny configs (2.1-style and 2.2-style)
# ---------------------------------------------------------------------------

TINY_21 = M.WanVAEConfig(
    base_dim=8, z_dim=4, dim_mult=(1, 2, 4), num_res_blocks=1,
    temperal_downsample=(False, True), is_residual=False, patch_size=None,
    latents_mean=tuple([0.0] * 4), latents_std=tuple([1.0] * 4),
)
# Like the real Wan2.2 config, the last (non-downsampling) block must
# have in_dim == out_dim (AvgDown3D asserts in*factor % out == 0).
TINY_22 = M.WanVAEConfig(
    base_dim=8, decoder_base_dim=12, z_dim=4, dim_mult=(1, 2, 2),
    num_res_blocks=1, temperal_downsample=(True, True), is_residual=True,
    in_channels=12, out_channels=12, patch_size=2,
    latents_mean=tuple([0.0] * 4), latents_std=tuple([1.0] * 4),
)


@pytest.fixture(scope="module")
def params21():
    return M.init_wan_vae(jax.random.key(0), TINY_21)


@pytest.fixture(scope="module")
def params22():
    return M.init_wan_vae(jax.random.key(1), TINY_22)


class TestChunkEquivalence:
    def test_encode_21(self, params21):
        video = jax.random.normal(jax.random.key(2), (1, 3, 9, 16, 16))
        full = M.encode_moments(TINY_21, params21, video)
        chunked = chunked_encode(TINY_21, params21, video)
        np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                                   atol=1e-4, rtol=1e-4)

    def test_decode_21(self, params21):
        z = jax.random.normal(jax.random.key(3), (1, 4, 3, 4, 4))
        full = M.decode(TINY_21, params21, z)
        chunked = chunked_decode(TINY_21, params21, z)
        np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                                   atol=1e-4, rtol=1e-4)

    def test_encode_22_residual_patchify(self, params22):
        # raw RGB video; encoder in_channels=12 is post-patchify (3*2*2)
        video = jax.random.normal(jax.random.key(4), (1, 3, 9, 16, 16))
        full = M.encode_moments(TINY_22, params22, video)
        chunked = chunked_encode(TINY_22, params22, video)
        np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                                   atol=1e-4, rtol=1e-4)

    def test_decode_22_residual_patchify(self, params22):
        z = jax.random.normal(jax.random.key(5), (1, 4, 3, 2, 2))
        full = M.decode(TINY_22, params22, z)
        chunked = chunked_decode(TINY_22, params22, z)
        np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                                   atol=1e-4, rtol=1e-4)


class TestShapes:
    def test_encode_decode_roundtrip_shapes_21(self, params21):
        video = jnp.zeros((1, 3, 9, 16, 16))
        z = M.encode(TINY_21, params21, video)
        # 2x temporal (one downsample3d level: 9 -> 5), 4x spatial (16 -> 4)
        assert z.shape == (1, 4, 5, 4, 4)
        out = M.decode(TINY_21, params21, z)
        assert out.shape == (1, 3, 9, 16, 16)

    def test_encode_decode_roundtrip_shapes_22(self, params22):
        video = jnp.zeros((1, 3, 9, 16, 16))
        z = M.encode(TINY_22, params22, video)
        # patchify 2x then 2-level -> 8x total spatial here
        assert z.shape == (1, 4, 3, 2, 2)
        out = M.decode(TINY_22, params22, z)
        assert out.shape == (1, 3, 9, 16, 16)

    def test_causality_of_encoder(self, params21):
        """Changing late frames must not affect early latent frames."""
        v1 = jax.random.normal(jax.random.key(6), (1, 3, 9, 16, 16))
        v2 = v1.at[:, :, 5:].set(0.123)
        z1 = M.encode_moments(TINY_21, params21, v1)
        z2 = M.encode_moments(TINY_21, params21, v2)
        np.testing.assert_allclose(np.asarray(z1[:, :, :2]),
                                   np.asarray(z2[:, :, :2]), atol=1e-5)

    def test_normalize_roundtrip(self):
        z = jax.random.normal(jax.random.key(7), (1, 16, 3, 4, 4))
        cfg = M.WAN21_VAE_CONFIG
        zn = M.normalize_latents(cfg, z)
        zd = M.denormalize_latents(cfg, zn)
        np.testing.assert_allclose(np.asarray(zd), np.asarray(z), atol=1e-5)
