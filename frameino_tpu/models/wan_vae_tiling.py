"""Spatial tiling + batch slicing for the Wan VAE.

Reference ``architecture/autoencoder_kl_wan.py``: ``enable_slicing``
(:1121-1133, per-sample batch split) and ``enable_tiling``
(:1084-1112, :1270-1397): overlapping spatial tiles encoded/decoded
independently and linearly blended (``blend_v``/``blend_h``,
:1254-1268) to bound memory for large resolutions. Tile defaults
256/192 sample pixels.

Each tile still runs the full-sequence TPU path; tiles execute
sequentially so peak memory is one tile's activations.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from frameino_tpu.models import wan_vae

Params = Dict[str, Any]

TILE_SAMPLE_MIN = 256
TILE_SAMPLE_STRIDE = 192


def _positions(total: int, tile: int, stride: int):
    """Tile start positions, stopping once the edge is covered.

    Unlike the reference's ``range(0, total, stride)`` (which emits
    redundant truncated tail tiles), iteration stops at the first tile
    reaching the edge — on TPU every distinct tile shape is a separate
    multi-minute compilation, so when (total - tile) % stride == 0 ALL
    tiles share one shape.
    """
    out = [0]
    while out[-1] + tile < total:
        out.append(out[-1] + stride)
    return out


def _blend_v(a: jax.Array, b: jax.Array, extent: int) -> jax.Array:
    """Blend bottom rows of `a` into top rows of `b` (reference blend_v)."""
    extent = min(a.shape[-2], b.shape[-2], extent)
    if extent <= 0:
        return b
    w = (jnp.arange(extent, dtype=jnp.float32) / extent
         ).reshape(1, 1, 1, extent, 1)
    top = a[..., -extent:, :] * (1 - w) + b[..., :extent, :] * w
    return jnp.concatenate([top.astype(b.dtype), b[..., extent:, :]],
                           axis=-2)


def _blend_h(a: jax.Array, b: jax.Array, extent: int) -> jax.Array:
    extent = min(a.shape[-1], b.shape[-1], extent)
    if extent <= 0:
        return b
    w = (jnp.arange(extent, dtype=jnp.float32) / extent
         ).reshape(1, 1, 1, 1, extent)
    left = a[..., -extent:] * (1 - w) + b[..., :extent] * w
    return jnp.concatenate([left.astype(b.dtype), b[..., extent:]], axis=-1)


def tiled_encode(cfg: wan_vae.WanVAEConfig, params: Params,
                 video: jax.Array,
                 tile_min: int = TILE_SAMPLE_MIN,
                 tile_stride: int = TILE_SAMPLE_STRIDE,
                 encode_fn=None) -> jax.Array:
    """Overlapping-tile encode with latent-space blending
    (reference tiled_encode :1270-1334). video: [B, C, T, H, W].

    ``encode_fn(video_tile) -> moments`` overrides the per-tile encoder
    (used by ``hybrid_encode`` to stream temporally inside each tile)."""
    H, W = video.shape[3], video.shape[4]
    if encode_fn is None:
        encode_fn = lambda t: wan_vae.encode_moments(cfg, params, t)  # noqa: E731
    if H <= tile_min and W <= tile_min:
        return encode_fn(video)
    sc = cfg.scale_factor_spatial
    lat_stride = tile_stride // sc
    blend = tile_min // sc - lat_stride

    ys = _positions(H, tile_min, tile_stride)
    xs = _positions(W, tile_min, tile_stride)
    rows = []
    for i in ys:
        row = []
        for j in xs:
            tile = video[:, :, :, i:i + tile_min, j:j + tile_min]
            row.append(encode_fn(tile))
        rows.append(row)

    result_rows = []
    for i, row in enumerate(rows):
        result_row = []
        for j, tile in enumerate(row):
            if i > 0:
                tile = _blend_v(rows[i - 1][j], tile, blend)
            if j > 0:
                tile = _blend_h(row[j - 1], tile, blend)
            # the last tile keeps its full extent (it covers the edge)
            ch = lat_stride if i < len(ys) - 1 else tile.shape[-2]
            cw = lat_stride if j < len(xs) - 1 else tile.shape[-1]
            result_row.append(tile[:, :, :, :ch, :cw])
        result_rows.append(jnp.concatenate(result_row, axis=-1))
    out = jnp.concatenate(result_rows, axis=-2)
    return out[:, :, :, :H // sc, :W // sc]


def tiled_decode(cfg: wan_vae.WanVAEConfig, params: Params,
                 z: jax.Array,
                 tile_min: int = TILE_SAMPLE_MIN,
                 tile_stride: int = TILE_SAMPLE_STRIDE,
                 decode_fn=None) -> jax.Array:
    """Overlapping-tile decode with pixel-space blending
    (reference tiled_decode :1336-1397). z: [B, z, T, h, w].

    ``decode_fn(z_tile) -> pixels`` overrides the per-tile decoder
    (used by ``hybrid_decode`` to stream temporally inside each tile)."""
    sc = cfg.scale_factor_spatial
    h, w = z.shape[3], z.shape[4]
    lat_min = tile_min // sc
    lat_stride = tile_stride // sc
    if decode_fn is None:
        decode_fn = lambda t: wan_vae.decode(cfg, params, t, clamp=False)  # noqa: E731
    if h <= lat_min and w <= lat_min:
        return jnp.clip(decode_fn(z), -1.0, 1.0)
    blend = tile_min - tile_stride

    ys = _positions(h, lat_min, lat_stride)
    xs = _positions(w, lat_min, lat_stride)
    rows = []
    for i in ys:
        row = []
        for j in xs:
            tile = z[:, :, :, i:i + lat_min, j:j + lat_min]
            row.append(decode_fn(tile))
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
    return jnp.clip(out[:, :, :, :h * sc, :w * sc], -1.0, 1.0)


def hybrid_decode(cfg: wan_vae.WanVAEConfig, params: Params,
                  z: jax.Array,
                  tile_min: int = TILE_SAMPLE_MIN,
                  tile_stride: int = TILE_SAMPLE_STRIDE,
                  chunk_latent_frames: int = 2) -> jax.Array:
    """Streaming x tiled decode: large spatial tiles (few, low overlap
    redundancy) with temporally-chunked causal decoding inside each tile
    so peak memory is one chunk of one tile.

    Measured on v5e next to the resident 10GB 5B DiT (448x832x13lat):
    full-sequence and full-spatial streaming OOM; 128/64 tiles (72
    tiles, 3.2x overlap redundancy) take 26.3s; 256/192 tiles (8 tiles,
    1.4x redundancy) only fit with in-tile streaming — this hybrid.
    The reference offers tiling only (autoencoder_kl_wan.py:1336-1397);
    its frame-by-frame decode is a separate mode (:1198-1227)."""
    from frameino_tpu.models.wan_vae_streaming import streaming_decode

    def decode_fn(tile):
        return streaming_decode(cfg, params, tile,
                                chunk_latent_frames=chunk_latent_frames,
                                clamp=False)

    return tiled_decode(cfg, params, z, tile_min=tile_min,
                        tile_stride=tile_stride, decode_fn=decode_fn)


def hybrid_encode(cfg: wan_vae.WanVAEConfig, params: Params,
                  video: jax.Array,
                  tile_min: int = TILE_SAMPLE_MIN,
                  tile_stride: int = TILE_SAMPLE_STRIDE,
                  chunk_pixel_frames: int = 16) -> jax.Array:
    """Streaming x tiled encode (dual of ``hybrid_decode``): spatial
    tiles with temporally-chunked causal encoding inside each tile."""
    from frameino_tpu.models.wan_vae_streaming import \
        streaming_encode_moments

    def encode_fn(tile):
        return streaming_encode_moments(
            cfg, params, tile, chunk_pixel_frames=chunk_pixel_frames)

    return tiled_encode(cfg, params, video, tile_min=tile_min,
                        tile_stride=tile_stride, encode_fn=encode_fn)


def sliced_encode(cfg: wan_vae.WanVAEConfig, params: Params,
                  video: jax.Array, **kw) -> jax.Array:
    """Per-sample batch slicing (reference enable_slicing :1187-1191)."""
    if video.shape[0] == 1:
        return tiled_encode(cfg, params, video, **kw)
    outs = [tiled_encode(cfg, params, video[i:i + 1], **kw)
            for i in range(video.shape[0])]
    return jnp.concatenate(outs, axis=0)


def sliced_decode(cfg: wan_vae.WanVAEConfig, params: Params,
                  z: jax.Array, **kw) -> jax.Array:
    if z.shape[0] == 1:
        return tiled_decode(cfg, params, z, **kw)
    outs = [tiled_decode(cfg, params, z[i:i + 1], **kw)
            for i in range(z.shape[0])]
    return jnp.concatenate(outs, axis=0)
