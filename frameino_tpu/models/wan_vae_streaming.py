"""Streaming (temporally-chunked) Wan VAE decode/encode.

The full-sequence decoder (``wan_vae.decode``) is fastest when its
activations fit; at 5B-inference memory budgets the decoder tail
([T, H, W, base_dim] at full resolution) can exceed HBM next to the
resident DiT. This module decodes in LATENT-FRAME CHUNKS at full width,
carrying the reference's per-conv feature caches across chunks — the
same protocol as the reference's frame-by-frame decode
(``autoencoder_kl_wan.py:1198-1227``) but with a configurable chunk
size (>1 latent frame per step amortizes kernel launches and keeps the
MXU busy) and no spatial tiling.

Numerics: identical to ``wan_vae.decode`` (the chunk protocol and the
full-sequence form are equivalent — see ``wan_vae``'s module docstring
and the chunk-equivalence tests). Chunk boundaries only change float
association, not semantics.

Encode is provided too (chunks of 4k frames after the first 1+4k).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from frameino_tpu.core.tree import unmeta
from frameino_tpu.models import wan_vae as M
from frameino_tpu.ops import conv as cops

Params = Dict[str, Any]
CACHE_T = 2


def _triple(p):
    return (p, p, p) if isinstance(p, int) else p


def _cconv_fwd(x, p, cache, padding, stride=(1, 1, 1)):
    """WanCausalConv3d.forward with an explicit cache (channels-last)."""
    pt, ph, pw = _triple(padding)
    front = 2 * pt
    if cache is not None and front > 0:
        x = jnp.concatenate([cache, x], axis=1)
        front -= cache.shape[1]
    st, sh, sw = _triple(stride) if not isinstance(stride, tuple) else stride
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), window_strides=(st, sh, sw),
        padding=((front, 0), (ph, ph), (pw, pw)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)
    return (y + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _cconv_call(x, p, cache, idx, padding):
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


def _up3d_chunk(p, x, cache, idx):
    """upsample3d with the reference "Rep" cache semantics."""
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
        t = x.shape[1]
        x = x.reshape(B, t, H, W, 2, C)
        x = x.transpose(0, 1, 4, 2, 3, 5).reshape(B, 2 * t, H, W, C)
    return M.spatial_resample_apply(p, x, "upsample3d")


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


def streaming_decode(cfg: M.WanVAEConfig, params: Params, z: jax.Array,
                     chunk_latent_frames: int = 2,
                     clamp: bool = True) -> jax.Array:
    """z [B, z, T', h, w] -> video [B, Cout, T, H, W].

    First chunk is 1 latent frame (the reference's causal bootstrap),
    then ``chunk_latent_frames`` per step with conv caches carried.
    Peak memory ~ one chunk's decoder activations at full width.
    """
    x = M._to_cl(z)
    x = cops.causal_conv3d(x, **params["post_quant_conv"])
    T = x.shape[1]
    cache: List = [None] * 512
    outs = []
    pos = 0
    first = True
    while pos < T:
        n = 1 if first else min(chunk_latent_frames, T - pos)
        idx = [0]
        outs.append(_decoder_chunk(cfg, params["decoder"],
                                   x[:, pos:pos + n], cache, idx,
                                   first_chunk=first))
        pos += n
        first = False
    out = jnp.concatenate(outs, axis=1)
    if cfg.patch_size is not None:
        out = M.unpatchify(out, cfg.patch_size)
    out = M._to_cf(out)
    return jnp.clip(out, -1.0, 1.0) if clamp else out


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


def streaming_encode_moments(cfg: M.WanVAEConfig, params: Params,
                             video: jax.Array,
                             chunk_pixel_frames: int = 8) -> jax.Array:
    """Chunked encode (first 1 frame, then multiples of 4 pixel frames).

    ``chunk_pixel_frames`` must be a multiple of 4 so temporal pooling
    stays aligned with the causal chunk protocol.
    """
    assert chunk_pixel_frames % 4 == 0
    x = M._to_cl(video)
    if cfg.patch_size is not None:
        x = M.patchify(x, cfg.patch_size)
    T = x.shape[1]
    cache: List = [None] * 512
    outs = []
    pos = 0
    first = True
    while pos < T:
        n = 1 if first else min(chunk_pixel_frames, T - pos)
        idx = [0]
        outs.append(_encoder_chunk(cfg, params["encoder"],
                                   x[:, pos:pos + n], cache, idx))
        pos += n
        first = False
    out = jnp.concatenate(outs, axis=1)
    out = cops.causal_conv3d(out, **params["quant_conv"])
    return M._to_cf(out)
