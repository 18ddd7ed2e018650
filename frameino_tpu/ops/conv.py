"""Convolution primitives for the Wan causal video VAE and DiT patch embed.

TPU-first design decision: the reference streams video through causal
convs in 1/4-frame chunks with a per-layer feature cache
(``WanCausalConv3d.forward`` + ``feat_cache``, reference
``architecture/autoencoder_kl_wan.py:134-176,1145-1169,1198-1227``).
For stride-1 temporal convs that chunked streaming is *mathematically
identical* to one full-sequence causal conv (front zero-padding
2*pad_t, no future leakage); the temporal-stride layers have a
first-frame bypass that we reproduce in closed form (see
``frameino_tpu/models/wan_vae.py``). So on TPU we run ONE big conv per
layer over the whole clip — XLA tiles it onto the MXU and fuses the
surrounding elementwise work — instead of a Python chunk loop with 20+
kernel launches and cache shuffling per conv.

Internal layout is channels-last ([B, T, H, W, C]) which is the
MXU/VPU-native layout; public model APIs convert from the reference's
[B, C, T, H, W] at the boundary.

Equivalence with the reference's chunked semantics is covered by
``tests/test_wan_vae.py`` which runs a literal chunk-by-chunk JAX
re-enactment of the reference cache protocol against these ops.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

IntOr3 = Union[int, Tuple[int, int, int]]

# Shared trace-time precision scope (see ops/precision.py): f32 default
# keeps serving decode bit-stable; the trainer's frozen-VAE encodes run
# under ``accum_dtype_scope(bf16)`` — reference-parity with the torch
# bf16 autocast encode (train_wan_motion_FrameINO.py:507-657).
from frameino_tpu.ops.precision import (accum_dtype_scope as
                                        conv_accum_dtype,  # noqa: F401
                                        default_accum_dtype)


def _triple(x: IntOr3) -> Tuple[int, int, int]:
    return (x, x, x) if isinstance(x, int) else tuple(x)


def _conv_int8(x: jax.Array, kernel_q: jax.Array, scale: jax.Array,
               bias: Optional[jax.Array], window_strides, padding,
               dimension_numbers) -> jax.Array:
    """w8a8 conv core: symmetric per-output-channel weight scales +
    dynamic per-tensor activation scale (v5e int8 MXU ~1.35x the bf16
    conv rate at VAE decoder shapes — measured in ROADMAP.md; the
    per-token scheme of ``ops/linear.dense_int8`` has no conv analogue,
    and per-tensor is what conv activations tolerate post-norm)."""
    xf = x.astype(jnp.float32)
    s_x = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    o = jax.lax.conv_general_dilated(
        xq, kernel_q,
        window_strides=window_strides,
        padding=padding,
        dimension_numbers=dimension_numbers,
        preferred_element_type=jnp.int32,
    )
    y = o.astype(jnp.float32) * (s_x * scale.astype(jnp.float32))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def causal_conv3d(x: jax.Array, kernel: Optional[jax.Array] = None,
                  bias: Optional[jax.Array] = None,
                  stride: IntOr3 = 1,
                  padding: IntOr3 = 0,
                  accum_dtype=None,
                  kernel_q: Optional[jax.Array] = None,
                  scale: Optional[jax.Array] = None) -> jax.Array:
    """Causal 3D conv, channels-last.

    x: [B, T, H, W, Cin]; kernel: [kt, kh, kw, Cin, Cout] (DHWIO).
    Temporal padding is causal: ``2 * pad_t`` zeros at the FRONT only
    (reference ``WanCausalConv3d.__init__``: ``self._padding =
    (pw, pw, ph, ph, 2*pt, 0)``, ``architecture/autoencoder_kl_wan.py:166``).
    Spatial padding is symmetric.

    When the param dict carries an int8 kernel (``kernel_q`` +
    per-output-channel ``scale`` — ``models/quant.quantize_wan_vae_int8``)
    the w8a8 path runs instead; call sites splat params unchanged.
    """
    if accum_dtype is None:
        accum_dtype = default_accum_dtype()
    if jnp.dtype(accum_dtype).itemsize < jnp.dtype(x.dtype).itemsize:
        x = x.astype(accum_dtype)   # autocast semantics under the scope
    st, sh, sw = _triple(stride)
    pt, ph, pw = _triple(padding)
    pads = ((2 * pt, 0), (ph, ph), (pw, pw))
    dn = ("NDHWC", "DHWIO", "NDHWC")
    if kernel_q is not None:
        return _conv_int8(x, kernel_q, scale, bias, (st, sh, sw), pads, dn)
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype),
        window_strides=(st, sh, sw),
        padding=pads,
        dimension_numbers=dn,
        preferred_element_type=accum_dtype,
    )
    if bias is not None:
        y = y + bias.astype(accum_dtype)
    return y.astype(x.dtype)


def conv3d(x: jax.Array, kernel: Optional[jax.Array] = None,
           bias: Optional[jax.Array] = None,
           stride: IntOr3 = 1,
           padding: Union[str, Sequence[Tuple[int, int]]] = "VALID",
           accum_dtype=None,
           kernel_q: Optional[jax.Array] = None,
           scale: Optional[jax.Array] = None) -> jax.Array:
    """Plain 3D conv (used for the DiT Conv3d patch embedding)."""
    if accum_dtype is None:
        accum_dtype = default_accum_dtype()
    if jnp.dtype(accum_dtype).itemsize < jnp.dtype(x.dtype).itemsize:
        x = x.astype(accum_dtype)   # autocast semantics under the scope
    st, sh, sw = _triple(stride) if not isinstance(stride, tuple) else stride
    dn = ("NDHWC", "DHWIO", "NDHWC")
    if kernel_q is not None:
        return _conv_int8(x, kernel_q, scale, bias, (st, sh, sw), padding,
                          dn)
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype),
        window_strides=(st, sh, sw),
        padding=padding,
        dimension_numbers=dn,
        preferred_element_type=accum_dtype,
    )
    if bias is not None:
        y = y + bias.astype(accum_dtype)
    return y.astype(x.dtype)


def conv2d(x: jax.Array, kernel: Optional[jax.Array] = None,
           bias: Optional[jax.Array] = None,
           stride: Union[int, Tuple[int, int]] = 1,
           padding: Union[str, Sequence[Tuple[int, int]]] = "SAME",
           accum_dtype=None,
           kernel_q: Optional[jax.Array] = None,
           scale: Optional[jax.Array] = None) -> jax.Array:
    """2D conv, channels-last. x: [N, H, W, C]; kernel: [kh, kw, Cin, Cout]."""
    if accum_dtype is None:
        accum_dtype = default_accum_dtype()
    if jnp.dtype(accum_dtype).itemsize < jnp.dtype(x.dtype).itemsize:
        x = x.astype(accum_dtype)   # autocast semantics under the scope
    s = (stride, stride) if isinstance(stride, int) else tuple(stride)
    dn = ("NHWC", "HWIO", "NHWC")
    if kernel_q is not None:
        return _conv_int8(x, kernel_q, scale, bias, s, padding, dn)
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype),
        window_strides=s,
        padding=padding,
        dimension_numbers=dn,
        preferred_element_type=accum_dtype,
    )
    if bias is not None:
        y = y + bias.astype(accum_dtype)
    return y.astype(x.dtype)


def nearest_exact_upsample2d(x: jax.Array, factor: int = 2) -> jax.Array:
    """torch 'nearest-exact' 2x upsample == pixel duplication for integer
    factors (reference ``WanUpsample``, ``autoencoder_kl_wan.py:205-217``).
    x: [..., H, W, C]."""
    x = jnp.repeat(x, factor, axis=-3)
    x = jnp.repeat(x, factor, axis=-2)
    return x


def zero_pad_hw_br(x: jax.Array) -> jax.Array:
    """nn.ZeroPad2d((0, 1, 0, 1)): one pixel on right/bottom.
    x: [..., H, W, C] (reference downsample2d/3d spatial path,
    ``autoencoder_kl_wan.py:257-259``)."""
    pad = [(0, 0)] * (x.ndim - 3) + [(0, 1), (0, 1), (0, 0)]
    return jnp.pad(x, pad)


def init_conv3d(key, kt, kh, kw, cin, cout, dtype=jnp.float32):
    """Kaiming-uniform matching torch.nn.Conv3d defaults."""
    k1, k2 = jax.random.split(key)
    fan_in = kt * kh * kw * cin
    bound = float(np.sqrt(1.0 / fan_in))
    return {
        "kernel": jax.random.uniform(k1, (kt, kh, kw, cin, cout), dtype, -bound, bound),
        "bias": jax.random.uniform(k2, (cout,), dtype, -bound, bound),
    }


def init_conv2d(key, kh, kw, cin, cout, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    fan_in = kh * kw * cin
    bound = float(np.sqrt(1.0 / fan_in))
    return {
        "kernel": jax.random.uniform(k1, (kh, kw, cin, cout), dtype, -bound, bound),
        "bias": jax.random.uniform(k2, (cout,), dtype, -bound, bound),
    }
