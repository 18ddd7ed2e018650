"""CogVideoX VAE — streaming (chunk-walking) encode/decode.

The segmented full-sequence form (``models/cogvideox_vae.py``) is exact
but materializes near-full-resolution activations for the WHOLE clip in
one program: at the reference benchmark shape (448x640x49f,
``test_code/run_cogvideox_FrameIn_mass_evaluation.py:46-51``) the first
encoder conv alone holds a 6.8 GB fp32 temp — a 20.5 GB program on a
16 GB v5e chip. This module runs the reference's OWN chunk protocol
(diffusers ``AutoencoderKLCogVideoX._encode/_decode``: frame batches
with a conv cache, per-chunk norm statistics) as a host loop of small
compiled programs, so peak activation memory is one chunk's.

Numerics are IDENTICAL to the full-sequence form by construction — the
segmented normalization there was derived to match exactly this
protocol (equality asserted in ``tests/test_cogvideox_vae.py``); here
the per-chunk statistics arise naturally because each chunk is its own
program. Conv caches carry the (kt-1) trailing input frames of every
kt=3 causal conv across chunks (replicate padding on the first chunk).

Program count is bounded: one compile for the first chunk (no cache
inputs, length ``fb + T % fb``) and one for the steady-state chunk
(length ``fb``) — the rest-chunk program is reused for every remaining
chunk, mirroring the fixed-capacity two-program design of
``models/sam2_video.py``.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from frameino_tpu.models import cogvideox_vae as M
from frameino_tpu.ops import conv as cops

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Chunk-local primitives (cache-threading variants of cogvideox_vae's)
# ---------------------------------------------------------------------------

def _cconv(x, p, cache: List, idx: List[int], kt: int):
    """replicate_causal_conv3d with the temporal front taken from the
    conv cache (previous chunk's trailing kt-1 input frames) instead of
    replicate padding; identical math/dtypes otherwise."""
    if kt > 1:
        i = idx[0]
        idx[0] += 1
        if cache[i] is None:
            front = jnp.repeat(x[:, :1], kt - 1, axis=1)
        else:
            front = cache[i].astype(x.dtype)
        xx = jnp.concatenate([front, x], axis=1)
        cache[i] = xx[:, -(kt - 1):]
    else:
        xx = x
    kh = p["kernel"].shape[1]
    ph = kh // 2
    acc = cops.default_accum_dtype()   # honors conv_accum_dtype scope
    y = jax.lax.conv_general_dilated(
        xx, p["kernel"].astype(xx.dtype), window_strides=(1, 1, 1),
        padding=((0, 0), (ph, ph), (ph, ph)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=acc)
    y = y + p["bias"].astype(acc)
    return y.astype(x.dtype)


def _seg1(x) -> M.Seg:
    """The chunk is a single normalization segment (per-chunk stats)."""
    return M.Seg(x.shape[1], 0, 0)


def _align_zq_chunk(zq, f_shape):
    """Chunk-aware SpatialNorm3D resize: frame-0 bypass only when the
    chunk is odd-length (the first chunk); even rest chunks repeat
    uniformly (diffusers F.interpolate on the chunk)."""
    Tf, Hf, Wf = f_shape[1], f_shape[2], f_shape[3]
    Tz, Hz, Wz = zq.shape[1], zq.shape[2], zq.shape[3]
    if Tf != Tz:
        if Tf > 1 and Tf % 2 == 1:
            r = (Tf - 1) // max(Tz - 1, 1)
            zq = jnp.concatenate(
                [zq[:, :1], jnp.repeat(zq[:, 1:], r, axis=1)], axis=1)
        else:
            zq = jnp.repeat(zq, Tf // Tz, axis=1)
    if Hf != Hz:
        zq = jnp.repeat(jnp.repeat(zq, Hf // Hz, axis=2), Wf // Wz, axis=3)
    return zq


def _spatial_norm(p, f, zq, groups, eps):
    zq = _align_zq_chunk(zq, f.shape)
    nf = M.group_norm_seg(f, _seg1(f), p["norm"]["weight"],
                          p["norm"]["bias"], groups, eps)
    y = M.replicate_causal_conv3d(zq, p["conv_y"]["kernel"],
                                  p["conv_y"]["bias"], kt=1)
    b = M.replicate_causal_conv3d(zq, p["conv_b"]["kernel"],
                                  p["conv_b"]["bias"], kt=1)
    # multiply-add in the scope's accum dtype: explicit fp32 casts here
    # materialized two ~4.4 GB fp32 copies of a near-full-res decoder
    # tensor per chunk (measured OOM at 448x640); fp32 default keeps
    # the old numerics bit-exactly, bf16 serving stays bf16
    acc = cops.default_accum_dtype()
    return (nf.astype(acc) * y.astype(acc)
            + b.astype(acc)).astype(f.dtype)


def _norm(p, x, zq, groups, eps):
    if zq is None:
        return M.group_norm_seg(x, _seg1(x), p["weight"], p["bias"],
                                groups, eps)
    return _spatial_norm(p, x, zq, groups, eps)


def _resnet(cfg, p, x, cache, idx, zq):
    g, eps = cfg.norm_num_groups, cfg.norm_eps
    h = jax.nn.silu(_norm(p["norm1"], x, zq, g, eps))
    h = _cconv(h, p["conv1"], cache, idx, 3)
    h = jax.nn.silu(_norm(p["norm2"], h, zq, g, eps))
    h = _cconv(h, p["conv2"], cache, idx, 3)
    if "conv_shortcut" in p:
        x = _cconv(x, p["conv_shortcut"], cache, idx, 1)
    return x + h


def _temporal_pool_chunk(x):
    """Frame-0 bypass only on odd-length (first) chunks — even rest
    chunks pool all pairs (the reference pools within each chunk)."""
    B, T, H, W, C = x.shape
    if T % 2 == 1:
        if T == 1:
            return x
        rest = x[:, 1:].reshape(B, (T - 1) // 2, 2, H, W, C).mean(axis=2)
        return jnp.concatenate([x[:, :1], rest.astype(x.dtype)], axis=1)
    return x.reshape(B, T // 2, 2, H, W, C).mean(axis=2).astype(x.dtype)


def _upsample_chunk(p, x, compress_time: bool):
    B, T, H, W, C = x.shape
    if compress_time and T > 1:
        if T % 2 == 1:
            rest = jnp.repeat(x[:, 1:], 2, axis=1)
            x = jnp.concatenate([x[:, :1], rest], axis=1)
        else:
            x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
    # per-frame 2D conv expressed as a kt=1 NDHWC conv3d: identical
    # math, but the [B*T, H, W, C] reshape form makes XLA tile the
    # T-sized batch dim (9 pads to 16 at the 448x640 decode chunk —
    # a 1.8x HBM expansion on a GB-scale tensor, measured)
    return M.replicate_causal_conv3d(x, p["kernel"][None], p["bias"],
                                     kt=1)


# ---------------------------------------------------------------------------
# Per-chunk graphs (jitted; caches in/out as tuples)
# ---------------------------------------------------------------------------

_MAX_CACHE = 192


def _encoder_chunk(cfg, eparams, x, cache: List, idx: List[int]):
    h = _cconv(x, eparams["conv_in"], cache, idx, 3)
    for blk in eparams["down_blocks"]:
        for res in blk["resnets"]:
            h = _resnet(cfg, res, h, cache, idx, None)
        if blk.get("downsampler") is not None:
            if blk["compress_time"].v:
                h = _temporal_pool_chunk(h)
            h = M.spatial_downsample(blk["downsampler"], h)
    for res in eparams["mid"]["resnets"]:
        h = _resnet(cfg, res, h, cache, idx, None)
    h = M.group_norm_seg(h, _seg1(h), eparams["norm_out"]["weight"],
                         eparams["norm_out"]["bias"],
                         cfg.norm_num_groups, cfg.norm_eps)
    h = jax.nn.silu(h)
    h = _cconv(h, eparams["conv_out"], cache, idx, 3)
    return h


def _decoder_chunk(cfg, dparams, zq, cache: List, idx: List[int]):
    h = _cconv(zq, dparams["conv_in"], cache, idx, 3)
    for res in dparams["mid"]["resnets"]:
        h = _resnet(cfg, res, h, cache, idx, zq)
    for blk in dparams["up_blocks"]:
        for res in blk["resnets"]:
            h = _resnet(cfg, res, h, cache, idx, zq)
        if blk.get("upsampler") is not None:
            h = _upsample_chunk(blk["upsampler"], h,
                                blk["compress_time"].v)
    h = _spatial_norm(dparams["norm_out"], h, zq, cfg.norm_num_groups,
                      cfg.norm_eps)
    h = jax.nn.silu(h)
    h = _cconv(h, dparams["conv_out"], cache, idx, 3)
    return h


@functools.partial(jax.jit, static_argnames=("cfg", "first"))
def _enc_step(cfg, params, x, caches: Optional[Tuple], first: bool):
    cache: List = ([None] * _MAX_CACHE if first
                   else list(caches) + [None] * (_MAX_CACHE - len(caches)))
    idx = [0]
    out = _encoder_chunk(cfg, params["encoder"], x, cache, idx)
    return out, tuple(cache[:idx[0]])


@functools.partial(jax.jit, static_argnames=("cfg", "first"))
def _dec_step(cfg, params, zq, caches: Optional[Tuple], first: bool):
    cache: List = ([None] * _MAX_CACHE if first
                   else list(caches) + [None] * (_MAX_CACHE - len(caches)))
    idx = [0]
    out = _decoder_chunk(cfg, params["decoder"], zq, cache, idx)
    return out, tuple(cache[:idx[0]])


def _chunk_bounds(T: int, fb: int):
    """First chunk absorbs the remainder (length fb + T % fb, exactly
    ``encode_segments``/``decode_segments``); the rest are fb long."""
    nb = max(T // fb, 1)
    r = T - fb * nb
    bounds = [(0, fb + r)]
    for i in range(1, nb):
        s = fb + r + fb * (i - 1)
        bounds.append((s, s + fb))
    return bounds


def streaming_encode_moments(cfg: M.CogVideoXVAEConfig, params: Params,
                             video: jax.Array) -> jax.Array:
    """video [B, 3, T, H, W] -> moments [B, 2z, T', H', W'].
    == ``cogvideox_vae.encode_moments`` (per-chunk peak memory)."""
    x = M._to_cl(video)
    outs = []
    caches: Optional[Tuple] = None
    for (s, e) in _chunk_bounds(x.shape[1], cfg.frame_batch_size_encode):
        out, caches = _enc_step(cfg, params, x[:, s:e], caches,
                                first=caches is None)
        outs.append(out)
    return M._to_cf(jnp.concatenate(outs, axis=1))


def streaming_decode(cfg: M.CogVideoXVAEConfig, params: Params,
                     z: jax.Array) -> jax.Array:
    """z [B, z, T', H', W'] -> video [B, 3, T, H, W].
    == ``cogvideox_vae.decode`` (per-chunk peak memory, no clamp —
    the pipeline clips, matching the full-sequence call site).

    Chunk outputs are fetched to HOST as they finish and assembled in
    numpy: this is the pipeline's pixel boundary anyway, each fetch
    frees the chunk's device buffer before the next chunk runs, and the
    final full-clip concatenate does not compete with the decoder
    program's HBM arena (measured: the device-side concat OOM'd at
    448x640x49f with everything else already freed)."""
    import numpy as np

    x = M._to_cl(z)
    outs = []
    caches: Optional[Tuple] = None
    for (s, e) in _chunk_bounds(x.shape[1], cfg.frame_batch_size_decode):
        out, caches = _dec_step(cfg, params, x[:, s:e], caches,
                                first=caches is None)
        outs.append(np.asarray(out))
    return jnp.asarray(M._to_cf(np.concatenate(outs, axis=1)))


def streaming_encode(cfg: M.CogVideoXVAEConfig, params: Params,
                     video: jax.Array, sample_mode: str = "sample",
                     key: Optional[jax.Array] = None) -> jax.Array:
    moments = tiled_streaming_encode_moments(cfg, params, video)
    mean, logvar = jnp.split(moments, 2, axis=1)
    if sample_mode == "argmax":
        return mean
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    key = key if key is not None else jax.random.key(0)
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


# ---------------------------------------------------------------------------
# Spatial tiling x streaming (the published protocol: the reference eval
# calls vae.enable_slicing() + vae.enable_tiling(),
# run_cogvideox_FrameIn_mass_evaluation.py:95-96, so large canvases run
# overlapping 2D tiles, each with the frame-chunk conv-cache walk, and
# linear seam blending). Geometry reuses the repo's Wan tiling
# (tile 256 / stride 192 sample px, same-shape tiles via _positions —
# every distinct tile shape is a separate multi-minute TPU compile);
# diffusers' CogVideoX tiling uses overlap factors 1/6 and 1/5 instead —
# a seam-pixel-only difference to re-verify on first real-weights
# contact (ROADMAP "reconstructed from specification").
# ---------------------------------------------------------------------------

def tiled_streaming_decode(cfg: M.CogVideoXVAEConfig, params: Params,
                           z: jax.Array, tile_min: int = 256,
                           tile_stride: int = 192) -> jax.Array:
    """z [B, z, T', h, w] -> video [B, 3, T, H, W]; falls back to the
    untiled streaming walk when the canvas fits one tile. Per-tile peak
    memory: one frame chunk of one 256px tile (~0.23x of the full-frame
    chunk at 448x640, which alone exhausted a 16 GB chip next to the
    resident DiT)."""
    from frameino_tpu.models.wan_vae_tiling import (_blend_h, _blend_v,
                                                    _positions)

    sc = cfg.spatial_compression_ratio
    h, w = z.shape[3], z.shape[4]
    lat_min = tile_min // sc
    lat_stride = tile_stride // sc
    if h <= lat_min and w <= lat_min:
        return streaming_decode(cfg, params, z)
    blend = tile_min - tile_stride

    ys = _positions(h, lat_min, lat_stride)
    xs = _positions(w, lat_min, lat_stride)
    rows = []
    for i in ys:
        row = []
        for j in xs:
            tile = z[:, :, :, i:i + lat_min, j:j + lat_min]
            row.append(streaming_decode(cfg, params, tile))
        rows.append(row)

    result_rows = []
    for i, row in enumerate(rows):
        result_row = []
        for j, tile in enumerate(row):
            if i > 0:
                tile = _blend_v(rows[i - 1][j], tile, blend)
            if j > 0:
                tile = _blend_h(row[j - 1], tile, blend)
            ch = tile_stride if i < len(ys) - 1 else tile.shape[-2]
            cw = tile_stride if j < len(xs) - 1 else tile.shape[-1]
            result_row.append(tile[:, :, :, :ch, :cw])
        result_rows.append(jnp.concatenate(result_row, axis=-1))
    out = jnp.concatenate(result_rows, axis=-2)
    return out[:, :, :, :h * sc, :w * sc]


def tiled_streaming_encode_moments(cfg: M.CogVideoXVAEConfig,
                                   params: Params, video: jax.Array,
                                   tile_min: int = 256,
                                   tile_stride: int = 192) -> jax.Array:
    """video [B, 3, T, H, W] -> moments [B, 2z, T', h, w]; blending in
    LATENT space (the reference's tiled_encode semantics). Untiled when
    the canvas fits one tile."""
    from frameino_tpu.models.wan_vae_tiling import (_blend_h, _blend_v,
                                                    _positions)

    sc = cfg.spatial_compression_ratio
    B, C, T, H, W = video.shape
    if H <= tile_min and W <= tile_min:
        return streaming_encode_moments(cfg, params, video)
    lat_stride = tile_stride // sc
    blend_lat = (tile_min - tile_stride) // sc

    ys = _positions(H, tile_min, tile_stride)
    xs = _positions(W, tile_min, tile_stride)
    rows = []
    for i in ys:
        row = []
        for j in xs:
            tile = video[:, :, :, i:i + tile_min, j:j + tile_min]
            row.append(streaming_encode_moments(cfg, params, tile))
        rows.append(row)

    result_rows = []
    for i, row in enumerate(rows):
        result_row = []
        for j, tile in enumerate(row):
            if i > 0:
                tile = _blend_v(rows[i - 1][j], tile, blend_lat)
            if j > 0:
                tile = _blend_h(row[j - 1], tile, blend_lat)
            ch = lat_stride if i < len(ys) - 1 else tile.shape[-2]
            cw = lat_stride if j < len(xs) - 1 else tile.shape[-1]
            result_row.append(tile[:, :, :, :ch, :cw])
        result_rows.append(jnp.concatenate(result_row, axis=-1))
    out = jnp.concatenate(result_rows, axis=-2)
    return out[:, :, :, :H // sc, :W // sc]
