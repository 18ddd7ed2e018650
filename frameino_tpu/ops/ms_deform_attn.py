"""Multi-Scale Deformable Attention (OneFormer pixel decoder op).

The reference's ONLY native code is the vendored CUDA/C++
MultiScaleDeformableAttention extension used by the preprocessing
pipeline's panoptic-segmentation step (reference
``preprocess/oneformer_code/oneformer/modeling/pixel_decoder/ops/``,
with a pure-PyTorch fallback at ``ops/functions/ms_deform_attn_func.py``).
It is NOT on the training or inference hot path (SURVEY §2.7).

This module provides the TPU-native equivalent as a vectorized
XLA gather/bilinear implementation (jit-compiles to TPU or CPU), and
``frameino_tpu/native/ms_deform_attn`` provides a C++ CPU kernel with a
ctypes binding for host-side preprocessing throughput (mirroring the
reference's CPU fallback role).

Math (Deformable DETR): for each (batch, query, head), the output is the
attention-weighted sum of bilinearly sampled values across feature
levels and sampling points:

    out[b, q, h] = sum_{l, p} w[b,q,h,l,p] *
                   bilinear(value[b, level l, h], loc[b,q,h,l,p])

with grid_sample(align_corners=False) coordinates: x = loc_x * W - 0.5,
zero padding outside.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def ms_deform_attn(value: jax.Array,
                   spatial_shapes: Sequence[Tuple[int, int]],
                   sampling_locations: jax.Array,
                   attention_weights: jax.Array) -> jax.Array:
    """value: [B, S, H, D] (S = sum H_l*W_l); sampling_locations:
    [B, Q, H, L, P, 2] normalized (x, y) in [0, 1]; attention_weights:
    [B, Q, H, L, P]. Returns [B, Q, H*D]."""
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    shapes = [(int(h), int(w)) for h, w in spatial_shapes]
    offsets = np.concatenate([[0], np.cumsum([h * w for h, w in shapes])])
    assert offsets[-1] == S, (offsets[-1], S)

    out = jnp.zeros((B, Q, H, D), jnp.float32)
    for lvl, (Hl, Wl) in enumerate(shapes):
        v = value[:, offsets[lvl]:offsets[lvl + 1]]        # [B, Hl*Wl, H, D]
        v = v.reshape(B, Hl, Wl, H, D)
        loc = sampling_locations[:, :, :, lvl]             # [B, Q, H, P, 2]
        w = attention_weights[:, :, :, lvl]                # [B, Q, H, P]

        # grid_sample(align_corners=False) coordinates
        x = loc[..., 0] * Wl - 0.5
        y = loc[..., 1] * Hl - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0

        def gather(ix, iy):
            inside = ((ix >= 0) & (ix < Wl) & (iy >= 0) & (iy < Hl))
            ixc = jnp.clip(ix, 0, Wl - 1).astype(jnp.int32)
            iyc = jnp.clip(iy, 0, Hl - 1).astype(jnp.int32)
            # v: [B, Hl, Wl, H, D]; indices [B, Q, H, P]
            b_idx = jnp.arange(B)[:, None, None, None]
            h_idx = jnp.arange(H)[None, None, :, None]
            g = v[b_idx, iyc, ixc, h_idx]                  # [B, Q, H, P, D]
            return g * inside[..., None]

        g00 = gather(x0, y0)
        g01 = gather(x0 + 1, y0)
        g10 = gather(x0, y0 + 1)
        g11 = gather(x0 + 1, y0 + 1)
        sampled = (g00 * ((1 - fx) * (1 - fy))[..., None]
                   + g01 * (fx * (1 - fy))[..., None]
                   + g10 * ((1 - fx) * fy)[..., None]
                   + g11 * (fx * fy)[..., None])           # [B,Q,H,P,D]
        out = out + (sampled * w[..., None]).sum(axis=3)
    return out.reshape(B, Q, H * D)
