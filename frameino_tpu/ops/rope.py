"""Rotary position embeddings for the video DiTs.

Both model families use the *interleaved-pair* rotation (adjacent elements
(0,1),(2,3),... form complex pairs). Tables are precomputed host-side in
float64 (matching the reference's ``freqs_dtype=torch.float64``, reference
``architecture/transformer_wan.py:208`` and
``architecture/embeddings.py:1199``) and stored as fp32 half-dim cos/sin.

The rotation applied in both models reduces to:

    x1, x2 = x[..., 0::2], x[..., 1::2]
    out[..., 0::2] = x1 * cos - x2 * sin
    out[..., 1::2] = x1 * sin + x2 * cos

with per-token cos/sin of shape [S, D/2]:
- Wan (reference ``architecture/transformer_wan.py:75-87``): cos comes from
  ``freqs_cos[..., 0::2]`` of the repeat-interleaved table == cos(freqs).
- CogVideoX (reference ``architecture/embeddings.py:1239-1258``): the
  repeat-interleaved [S, D] table applied as x*cos + rotate_half(x)*sin is
  algebraically the same rotation.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def _freqs_1d(dim: int, positions: np.ndarray, theta: float = 10000.0) -> np.ndarray:
    """[S, dim/2] float64 angle table: outer(pos, theta^-(2i/dim))."""
    assert dim % 2 == 0
    inv = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    return np.outer(np.asarray(positions, np.float64), inv)


def apply_rope_interleaved(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate interleaved pairs. x: [..., S, D]; cos/sin: broadcastable [S, D/2].

    Math in fp32 (reference upcasts via ``x.float()``), returned in x.dtype.
    """
    shape = x.shape
    xf = x.astype(jnp.float32).reshape(*shape[:-1], shape[-1] // 2, 2)
    x1, x2 = xf[..., 0], xf[..., 1]
    cos = cos.astype(jnp.float32)
    sin = sin.astype(jnp.float32)
    o1 = x1 * cos - x2 * sin
    o2 = x1 * sin + x2 * cos
    out = jnp.stack([o1, o2], axis=-1).reshape(shape)
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Wan 3-axis RoPE (reference architecture/transformer_wan.py:192-253)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def wan_rope_table(head_dim: int, f: int, h: int, w: int,
                   theta: float = 10000.0,
                   max_seq_len: int = 1024) -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin tables [f*h*w, head_dim/2] fp32 for a (f, h, w) patch grid.

    Axis dims follow the reference split: h_dim = w_dim = 2*(head_dim//6),
    t_dim = head_dim - h_dim - w_dim (e.g. 44/42/42 for head_dim 128).
    """
    h_dim = w_dim = 2 * (head_dim // 6)
    t_dim = head_dim - h_dim - w_dim
    pos = np.arange(max_seq_len)

    def grid_tab(dim, n):
        ang = _freqs_1d(dim, pos, theta)[:n]  # [n, dim/2]
        return np.cos(ang), np.sin(ang)

    (tc, ts), (hc, hs), (wc, ws) = grid_tab(t_dim, f), grid_tab(h_dim, h), grid_tab(w_dim, w)

    def combine(a_t, a_h, a_w):
        a_t = np.broadcast_to(a_t[:, None, None, :], (f, h, w, t_dim // 2))
        a_h = np.broadcast_to(a_h[None, :, None, :], (f, h, w, h_dim // 2))
        a_w = np.broadcast_to(a_w[None, None, :, :], (f, h, w, w_dim // 2))
        return np.concatenate([a_t, a_h, a_w], axis=-1).reshape(f * h * w, head_dim // 2)

    return (combine(tc, hc, wc).astype(np.float32),
            combine(ts, hs, ws).astype(np.float32))


def wan_rope_table_frameino(head_dim: int, f: int, h: int, w: int,
                            num_id_frames: int,
                            theta: float = 10000.0) -> Tuple[np.ndarray, np.ndarray]:
    """Wan RoPE table for a sequence with ``num_id_frames`` ID-reference
    latent frames appended on the frame axis.

    The reference simply runs its RoPE over ``f + num_id_frames`` frames
    (the ID frames are concatenated on dim 2 before ``self.rope`` is called,
    reference ``pipelines/pipeline_wan_i2v_motion_FrameINO.py:852-854`` then
    ``architecture/transformer_wan.py:484``), so ID tokens get temporal
    positions f, f+1, ... — reproduce exactly.
    """
    return wan_rope_table(head_dim, f + num_id_frames, h, w, theta)


# ---------------------------------------------------------------------------
# CogVideoX 3D RoPE (reference architecture/embeddings.py:864-962)
# ---------------------------------------------------------------------------

def get_resize_crop_region_for_grid(src_hw, tgt_width: int, tgt_height: int):
    """Aspect-preserving center-crop region used by CogVideoX pipelines to
    anchor RoPE grids at non-default resolutions (reference
    ``pipelines/pipeline_cogvideox_i2v_motion_FrameINO.py:72-90``)."""
    th, tw = tgt_height, tgt_width
    h, w = src_hw
    if h / w > th / tw:
        resize_height = th
        resize_width = int(round(th / h * w))
    else:
        resize_width = tw
        resize_height = int(round(tw / w * h))
    crop_top = int(round((th - resize_height) / 2.0))
    crop_left = int(round((tw - resize_width) / 2.0))
    return (crop_top, crop_left), (crop_top + resize_height, crop_left + resize_width)


@functools.lru_cache(maxsize=32)
def cogvideox_rope_table(head_dim: int, f: int, h: int, w: int,
                         base_h: int = 30, base_w: int = 45,
                         theta: float = 10000.0,
                         duplicate_first_frame_for_id: bool = False
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin [S, head_dim/2] for CogVideoX 'linspace' grid RoPE.

    dim split: t = head_dim/4, h = w = 3*head_dim/8 (reference
    ``architecture/embeddings.py:920-923``). Grids follow the reference's
    linspace semantics with the aspect-preserving crop region computed from
    the base (training) grid: grid_axis = linspace(start, stop*(n-1)/n, n)
    (reference ``architecture/embeddings.py:898-910``). ``base_h/base_w``
    are sample_height/patch and sample_width/patch of the transformer
    config (30 and 45 for CogVideoX-5B at 480x720).

    ``duplicate_first_frame_for_id``: FrameINO appends one ID latent frame
    whose RoPE block is a *copy of frame 0's* (reference
    ``pipelines/pipeline_cogvideox_i2v_motion_FrameINO.py:834-839``).
    """
    dim_t = head_dim // 4
    dim_h = head_dim // 8 * 3
    dim_w = head_dim // 8 * 3

    (top, left), (bot, right) = get_resize_crop_region_for_grid((h, w), base_w, base_h)
    grid_t = np.linspace(0, f * (f - 1) / f, f, dtype=np.float64)
    grid_h = np.linspace(top, bot * (h - 1) / h, h, dtype=np.float64)
    grid_w = np.linspace(left, right * (w - 1) / w, w, dtype=np.float64)

    at = _freqs_1d(dim_t, grid_t, theta)
    ah = _freqs_1d(dim_h, grid_h, theta)
    aw = _freqs_1d(dim_w, grid_w, theta)

    def combine(ft, fh, fw):
        ft = np.broadcast_to(ft[:, None, None, :], (f, h, w, dim_t // 2))
        fh = np.broadcast_to(fh[None, :, None, :], (f, h, w, dim_h // 2))
        fw = np.broadcast_to(fw[None, None, :, :], (f, h, w, dim_w // 2))
        return np.concatenate([ft, fh, fw], axis=-1).reshape(f * h * w, head_dim // 2)

    cos = combine(np.cos(at), np.cos(ah), np.cos(aw)).astype(np.float32)
    sin = combine(np.sin(at), np.sin(ah), np.sin(aw)).astype(np.float32)

    if duplicate_first_frame_for_id:
        per_frame = h * w
        cos = np.concatenate([cos, cos[:per_frame]], axis=0)
        sin = np.concatenate([sin, sin[:per_frame]], axis=0)
    return cos, sin
