"""Timestep / text-projection / sincos positional embeddings.

Numerics mirror the reference modules:
- ``Timesteps`` + ``TimestepEmbedding`` (diffusers, used at reference
  ``architecture/transformer_wan.py:158-159`` and
  ``architecture/cogvideox_transformer_3d.py:293-294``).
- ``PixArtAlphaTextProjection`` (gelu_tanh MLP on text embeds).
- CogVideoX joint 3D sincos positional embedding
  (reference ``architecture/embeddings.py:81-150,692-715``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from frameino_tpu.ops.linear import dense, gelu_tanh, silu


def sinusoidal_timestep_embedding(timesteps, num_channels: int,
                                  flip_sin_to_cos: bool = True,
                                  downscale_freq_shift: float = 0.0,
                                  max_period: float = 10000.0):
    """diffusers ``get_timestep_embedding``. timesteps: [...] float.

    Returns [..., num_channels] fp32.
    """
    half = num_channels // 2
    exponent = -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps.astype(jnp.float32)[..., None] * emb
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[..., half:], emb[..., :half]], axis=-1)
    return emb


def timestep_embedding_mlp(temb, params):
    """TimestepEmbedding: linear_1 -> SiLU -> linear_2 (fp32 weights)."""
    h = dense(temb, params["linear_1"], out_dtype=jnp.float32)
    h = silu(h)
    return dense(h, params["linear_2"], out_dtype=jnp.float32)


def pixart_text_projection(text, params, out_dtype=None):
    """PixArtAlphaTextProjection with gelu_tanh."""
    h = dense(text, params["linear_1"], out_dtype=out_dtype)
    h = gelu_tanh(h)
    return dense(h, params["linear_2"], out_dtype=out_dtype)


# ---------------------------------------------------------------------------
# CogVideoX 3D sincos table (host-side, float64 omega like the reference).
# ---------------------------------------------------------------------------

def _sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """[M, embed_dim]: concat(sin, cos) halves (reference
    ``architecture/embeddings.py:320-352``)."""
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000.0 ** omega
    out = np.outer(pos.reshape(-1).astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


@functools.lru_cache(maxsize=16)
def cogvideox_3d_sincos_pos_embed(embed_dim: int, height: int, width: int,
                                  temporal: int,
                                  spatial_interpolation_scale: float = 1.875,
                                  temporal_interpolation_scale: float = 1.0
                                  ) -> np.ndarray:
    """[T, H*W, D] fp32. D/4 temporal + 3D/4 spatial (h-half then w-half).

    Matches ``get_3d_sincos_pos_embed`` with a (w-first meshgrid 'xy') grid:
    emb = concat(temporal, spatial) where spatial = concat over
    (grid[0]=w-major h values?, ...) — the reference builds grid via
    ``meshgrid(grid_w, grid_h, indexing='xy')`` reshaped to
    [2, 1, H, W]; grid[0] carries w-coordinates varying along the last
    axis and grid[1] carries h-coordinates. ``get_2d_sincos_pos_embed_from_grid``
    then embeds grid[0] into the *first* spatial half and grid[1] into the
    second (reference ``architecture/embeddings.py:127-149,287-317``).
    """
    embed_dim_spatial = 3 * embed_dim // 4
    embed_dim_temporal = embed_dim // 4

    grid_h = np.arange(height, dtype=np.float32) / spatial_interpolation_scale
    grid_w = np.arange(width, dtype=np.float32) / spatial_interpolation_scale
    gw, gh = np.meshgrid(grid_w, grid_h)  # indexing='xy': both [H, W]
    # grid[0] = w-coords, grid[1] = h-coords (reference stacks (w, h)).
    emb_first = _sincos_1d(embed_dim_spatial // 2, gw)   # labelled emb_h in ref
    emb_second = _sincos_1d(embed_dim_spatial // 2, gh)  # labelled emb_w in ref
    pos_embed_spatial = np.concatenate([emb_first, emb_second], axis=1)  # [H*W, 3D/4]

    grid_t = np.arange(temporal, dtype=np.float32) / temporal_interpolation_scale
    pos_embed_temporal = _sincos_1d(embed_dim_temporal, grid_t)  # [T, D/4]

    spatial = np.broadcast_to(pos_embed_spatial[None], (temporal, height * width, embed_dim_spatial))
    temporal_e = np.broadcast_to(pos_embed_temporal[:, None], (temporal, height * width, embed_dim_temporal))
    return np.concatenate([temporal_e, spatial], axis=-1).astype(np.float32)
