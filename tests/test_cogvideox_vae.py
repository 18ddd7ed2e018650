"""CogVideoX VAE: segmented full-sequence form == chunked reference
protocol (conv caches + per-chunk Group/Spatial norm statistics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frameino_tpu.models import cogvideox_vae as M

pytestmark = pytest.mark.slow

CFG = M.tiny_vae_config()


# ---------------------------------------------------------------------------
# Chunked emulator (diffusers AutoencoderKLCogVideoX chunk/cache protocol)
# ---------------------------------------------------------------------------

def _cconv_chunk(x, p, cache, idx, kt):
    i = idx[0]
    idx[0] += 1
    if kt > 1:
        if cache[i] is None:
            front = jnp.repeat(x[:, :1], kt - 1, axis=1)
        else:
            front = cache[i]
        xx = jnp.concatenate([front, x], axis=1)
        cache[i] = xx[:, -(kt - 1):]
    else:
        xx = x
    kh = p["kernel"].shape[1]
    ph = kh // 2
    y = jax.lax.conv_general_dilated(
        xx, p["kernel"], window_strides=(1, 1, 1),
        padding=((0, 0), (ph, ph), (ph, ph)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y + p["bias"]


def _gn_plain(x, gamma, beta, groups, eps=1e-6):
    # nn.GroupNorm on 5D: stats over (T, H, W, C/G) for the whole chunk
    B, T, H, W, C = x.shape
    g = x.reshape(B, T, H, W, groups, C // groups)
    axes = (1, 2, 3, 5)
    mean = g.mean(axis=axes, keepdims=True)
    var = ((g - mean) ** 2).mean(axis=axes, keepdims=True)
    out = ((g - mean) * jax.lax.rsqrt(var + eps)).reshape(B, T, H, W, C)
    return out * gamma + beta


def _align_zq_chunk(zq, f_shape):
    Tf, Hf, Wf = f_shape[1], f_shape[2], f_shape[3]
    Tz, Hz, Wz = zq.shape[1], zq.shape[2], zq.shape[3]
    if Tf != Tz:
        if Tf > 1 and Tf % 2 == 1:
            r = (Tf - 1) // (Tz - 1)
            zq = jnp.concatenate([zq[:, :1],
                                  jnp.repeat(zq[:, 1:], r, axis=1)], axis=1)
        else:
            zq = jnp.repeat(zq, Tf // Tz, axis=1)
    if Hf != Hz:
        zq = jnp.repeat(jnp.repeat(zq, Hf // Hz, axis=2), Wf // Wz, axis=3)
    return zq


def _sn_chunk(p, f, zq, cache, idx, groups):
    zq = _align_zq_chunk(zq, f.shape)
    nf = _gn_plain(f, p["norm"]["weight"], p["norm"]["bias"], groups)
    y = _cconv_chunk(zq, p["conv_y"], cache, idx, 1)
    b = _cconv_chunk(zq, p["conv_b"], cache, idx, 1)
    return nf * y + b


def _resnet_chunk(cfg, p, x, cache, idx, zq):
    g = cfg.norm_num_groups

    def norm(np_, h):
        if zq is None:
            return _gn_plain(h, np_["weight"], np_["bias"], g)
        return _sn_chunk(np_, h, zq, cache, idx, g)

    h = jax.nn.silu(norm(p["norm1"], x))
    h = _cconv_chunk(h, p["conv1"], cache, idx, 3)
    h = jax.nn.silu(norm(p["norm2"], h))
    h = _cconv_chunk(h, p["conv2"], cache, idx, 3)
    if "conv_shortcut" in p:
        x = _cconv_chunk(x, p["conv_shortcut"], cache, idx, 1)
    return x + h


def _temporal_pool_chunk(x):
    B, T, H, W, C = x.shape
    if T % 2 == 1:
        rest = x[:, 1:]
        if rest.shape[1] > 0:
            rest = rest.reshape(B, (T - 1) // 2, 2, H, W, C).mean(axis=2)
            return jnp.concatenate([x[:, :1], rest], axis=1)
        return x
    return x.reshape(B, T // 2, 2, H, W, C).mean(axis=2)


def _upsample_chunk(p, x, compress_time):
    B, T, H, W, C = x.shape
    if compress_time and T > 1:
        if T % 2 == 1:
            rest = jnp.repeat(x[:, 1:], 2, axis=1)
            x = jnp.concatenate([x[:, :1], rest], axis=1)
        else:
            x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
    from frameino_tpu.ops import conv as cops
    B, T, H, W, C = x.shape
    x2 = cops.conv2d(x.reshape(B * T, H, W, C), **p, padding="SAME")
    return x2.reshape(B, T, H, W, x2.shape[-1])


def chunked_encode(cfg, params, video_cf):
    x = M._to_cl(video_cf)
    T = x.shape[1]
    fb = cfg.frame_batch_size_encode
    nb = max(T // fb, 1)
    r = T % fb
    cache = [None] * 512
    outs = []
    for i in range(nb):
        start = fb * i + (0 if i == 0 else r)
        end = start + (fb + r if i == 0 else fb)
        chunk = x[:, start:end]
        idx = [0]
        e = params["encoder"]
        h = _cconv_chunk(chunk, e["conv_in"], cache, idx, 3)
        for blk in e["down_blocks"]:
            for res in blk["resnets"]:
                h = _resnet_chunk(cfg, res, h, cache, idx, None)
            if blk.get("downsampler") is not None:
                if blk["compress_time"].v:
                    h = _temporal_pool_chunk(h)
                h = M.spatial_downsample(blk["downsampler"], h)
        for res in e["mid"]["resnets"]:
            h = _resnet_chunk(cfg, res, h, cache, idx, None)
        h = _gn_plain(h, e["norm_out"]["weight"], e["norm_out"]["bias"],
                      cfg.norm_num_groups)
        h = jax.nn.silu(h)
        h = _cconv_chunk(h, e["conv_out"], cache, idx, 3)
        outs.append(h)
    return M._to_cf(jnp.concatenate(outs, axis=1))


def chunked_decode(cfg, params, z_cf):
    z = M._to_cl(z_cf)
    T = z.shape[1]
    fb = cfg.frame_batch_size_decode
    nb = max(T // fb, 1)
    r = T % fb
    cache = [None] * 512
    outs = []
    for i in range(nb):
        start = fb * i + (0 if i == 0 else r)
        end = start + (fb + r if i == 0 else fb)
        zq = z[:, start:end]
        idx = [0]
        d = params["decoder"]
        h = _cconv_chunk(zq, d["conv_in"], cache, idx, 3)
        for res in d["mid"]["resnets"]:
            h = _resnet_chunk(cfg, res, h, cache, idx, zq)
        for blk in d["up_blocks"]:
            for res in blk["resnets"]:
                h = _resnet_chunk(cfg, res, h, cache, idx, zq)
            if blk.get("upsampler") is not None:
                h = _upsample_chunk(blk["upsampler"], h,
                                    blk["compress_time"].v)
        h = _sn_chunk(d["norm_out"], h, zq, cache, idx, cfg.norm_num_groups)
        h = jax.nn.silu(h)
        h = _cconv_chunk(h, d["conv_out"], cache, idx, 3)
        outs.append(h)
    return M._to_cf(jnp.concatenate(outs, axis=1))


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def params():
    return M.init_cogvideox_vae(jax.random.key(0), CFG)


class TestSegments:
    def test_encode_segments(self):
        assert M.encode_segments(CFG, 49) == M.Seg(9, 8, 5)
        assert M.encode_segments(CFG, 81) == M.Seg(9, 8, 9)
        assert M.encode_segments(CFG, 1) == M.Seg(1, 0, 0)
        assert M.encode_segments(CFG, 5) == M.Seg(5, 0, 0)

    def test_decode_segments(self):
        assert M.decode_segments(CFG, 13) == M.Seg(3, 2, 5)
        assert M.decode_segments(CFG, 1) == M.Seg(1, 0, 0)


class TestChunkEquivalence:
    def test_encode_17_frames(self, params):
        # 17 frames -> chunks (9, 8): exercises multi-chunk stats + caches
        video = jax.random.normal(jax.random.key(2), (1, 3, 17, 16, 16))
        full = M.encode_moments(CFG, params, video)
        chunked = chunked_encode(CFG, params, video)
        np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                                   atol=1e-4, rtol=1e-4)

    def test_encode_single_frame(self, params):
        img = jax.random.normal(jax.random.key(3), (1, 3, 1, 16, 16))
        full = M.encode_moments(CFG, params, img)
        chunked = chunked_encode(CFG, params, img)
        assert full.shape[2] == 1
        np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                                   atol=1e-4, rtol=1e-4)

    def test_decode_5_latents(self, params):
        # 5 latents -> chunks (3, 2): mid/up spatial-norm + caches
        z = jax.random.normal(jax.random.key(4), (1, CFG.latent_channels,
                                                  5, 4, 4))
        full = M.decode(CFG, params, z)
        chunked = chunked_decode(CFG, params, z)
        np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                                   atol=1e-4, rtol=1e-4)


class TestShapes:
    def test_roundtrip_shapes(self, params):
        video = jnp.zeros((1, 3, 17, 16, 16))
        z = M.encode(CFG, params, video, sample_mode="argmax")
        # tiny cfg: 2 temporal compressions (17 -> 9 -> 5), 2 spatial (/4)
        assert z.shape == (1, CFG.latent_channels, 5, 4, 4)
        out = M.decode(CFG, params, z)
        assert out.shape == (1, 3, 17, 16, 16)

    def test_causality(self, params):
        v1 = jax.random.normal(jax.random.key(5), (1, 3, 17, 16, 16))
        v2 = v1.at[:, :, 12:].set(0.5)
        z1 = M.encode_moments(CFG, params, v1)
        z2 = M.encode_moments(CFG, params, v2)
        # frames < 12 occupy latent frames < (12-1)//4+1 = 3... but group
        # norm stats span whole chunks, so causality holds only at chunk
        # granularity: frames 0..8 are chunk 0 -> latents 0..2 safe iff
        # the change is in chunk 1 (frames 9..16). 12 >= 9 ✓.
        np.testing.assert_allclose(np.asarray(z1[:, :, :3]),
                                   np.asarray(z2[:, :, :3]), atol=1e-5)


class TestStreamingModule:
    """The production streaming walkers (models/cogvideox_vae_streaming)
    must equal the full-sequence segmented form bit-for-bit-ish — they
    run the same chunk protocol the emulator above re-enacts, as two
    compiled programs (first chunk / steady-state chunk)."""

    def test_streaming_encode_matches_full(self, params):
        from frameino_tpu.models import cogvideox_vae_streaming as S
        for T in (17, 1, 5):
            video = jax.random.normal(jax.random.key(6), (1, 3, T, 16, 16))
            full = M.encode_moments(CFG, params, video)
            stream = S.streaming_encode_moments(CFG, params, video)
            np.testing.assert_allclose(np.asarray(stream),
                                       np.asarray(full),
                                       atol=1e-4, rtol=1e-4)

    def test_streaming_decode_matches_full(self, params):
        from frameino_tpu.models import cogvideox_vae_streaming as S
        for T in (5, 1):
            z = jax.random.normal(jax.random.key(7),
                                  (1, CFG.latent_channels, T, 4, 4))
            full = M.decode(CFG, params, z)
            stream = S.streaming_decode(CFG, params, z)
            np.testing.assert_allclose(np.asarray(stream),
                                       np.asarray(full),
                                       atol=1e-4, rtol=1e-4)

    def test_streaming_encode_bf16(self, params):
        # serving dtype: the walkers must run (and roughly agree) in bf16
        from frameino_tpu.models import cogvideox_vae_streaming as S
        video = jax.random.normal(jax.random.key(8), (1, 3, 9, 16, 16))
        bf = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "astype") else a, params)
        stream = S.streaming_encode_moments(CFG, bf,
                                            video.astype(jnp.bfloat16))
        full = M.encode_moments(CFG, params, video)
        assert stream.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(stream, np.float32),
                                   np.asarray(full), atol=0.15, rtol=0.15)


class TestTiledStreaming:
    """Spatial tiling x frame-chunk streaming — the published protocol
    (the reference eval enables VAE tiling+slicing,
    run_cogvideox_FrameIn_mass_evaluation.py:95-96)."""

    def test_single_tile_is_exact(self, params):
        # canvas within one tile: tiled == plain streaming bit-for-bit
        from frameino_tpu.models import cogvideox_vae_streaming as S
        z = jax.random.normal(jax.random.key(9),
                              (1, CFG.latent_channels, 3, 4, 4))
        a = S.tiled_streaming_decode(CFG, params, z)
        b = S.streaming_decode(CFG, params, z)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_tiled_decode_geometry(self, params):
        """Tiled decode covers the exact canvas with finite pixels.
        Tile values legitimately differ from the untiled decode even
        away from seams (the decoder's receptive field spans whole
        tiles at test scale) — the reference's tiling is approximate by
        design; exactness is asserted on the single-tile fallback."""
        from frameino_tpu.models import cogvideox_vae_streaming as S
        z = jax.random.normal(jax.random.key(10),
                              (1, CFG.latent_channels, 3, 8, 10))
        full = np.asarray(S.streaming_decode(CFG, params, z))
        tiled = np.asarray(S.tiled_streaming_decode(
            CFG, params, z, tile_min=16, tile_stride=12))
        assert tiled.shape == full.shape
        assert np.isfinite(tiled).all()

    def test_tiled_encode_geometry(self, params):
        from frameino_tpu.models import cogvideox_vae_streaming as S
        video = jax.random.normal(jax.random.key(11), (1, 3, 9, 32, 40))
        full = np.asarray(S.streaming_encode_moments(CFG, params, video))
        tiled = np.asarray(S.tiled_streaming_encode_moments(
            CFG, params, video, tile_min=16, tile_stride=12))
        assert tiled.shape == full.shape
        assert np.isfinite(tiled).all()
        # single-tile fallback is bit-exact
        small = np.asarray(S.tiled_streaming_encode_moments(
            CFG, params, video[..., :16, :16]))
        ref = np.asarray(S.streaming_encode_moments(
            CFG, params, video[..., :16, :16]))
        np.testing.assert_array_equal(small, ref)
