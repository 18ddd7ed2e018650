"""Normalization ops.

All statistics in fp32 (matching the reference's ``FP32LayerNorm`` and
``_keep_in_fp32_modules`` recipe, reference
``architecture/transformer_wan.py:32,393``), output cast back to input
dtype by callers when needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def layer_norm(x, weight=None, bias=None, eps: float = 1e-6):
    """LayerNorm over the last dim, fp32 statistics.

    With ``weight is None`` this is the non-affine FP32LayerNorm used for
    norm1/norm3 in Wan blocks.
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y


def rms_norm(x, weight=None, eps: float = 1e-6):
    """RMSNorm over the last dim, fp32 statistics.

    Used with the full inner_dim as last axis for Wan's
    ``qk_norm="rms_norm_across_heads"`` (reference
    ``architecture/transformer_wan.py:263``).
    """
    xf = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jnp.reciprocal(jnp.sqrt(ms + eps))
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    return y.astype(x.dtype)


def l2_normalize_channel(x, scale: float, gamma, bias=0.0, axis: int = 1):
    """``WanRMS_norm``: F.normalize along the channel axis * sqrt(dim) * gamma.

    Matches reference ``architecture/autoencoder_kl_wan.py:179-202``:
    ``F.normalize(x, dim=1) * dim**0.5 * gamma + bias`` — note torch's
    F.normalize uses an eps-clamped L2 *norm* (eps=1e-12 on the norm, not
    norm²).

    Under the low-precision scope (``ops/precision.accum_dtype_scope``,
    the trainer's frozen-VAE encode path) the *statistic* stays fp32 but
    the elementwise apply materializes in the input dtype — the fp32
    apply otherwise pins a full near-full-res activation temp (3.17 GB
    at 480x832x49f) that OOMs the 16 GB train-step program.
    """
    from frameino_tpu.ops.precision import low_precision_scope_active
    xf = x.astype(jnp.float32)
    n = jnp.sqrt(jnp.sum(jnp.square(xf), axis=axis, keepdims=True))
    if low_precision_scope_active() and x.dtype != jnp.float32:
        r = jnp.reciprocal(jnp.maximum(n, 1e-12)) * scale
        y = x * r.astype(x.dtype)
        y = y * jnp.asarray(gamma, x.dtype)
        if not (isinstance(bias, float) and bias == 0.0):
            y = y + jnp.asarray(bias, x.dtype)
        return y
    y = xf / jnp.maximum(n, 1e-12) * scale
    gamma = jnp.asarray(gamma, jnp.float32)
    y = y * gamma + bias
    return y.astype(x.dtype)
