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


def _triple(x: IntOr3) -> Tuple[int, int, int]:
    return (x, x, x) if isinstance(x, int) else tuple(x)


def causal_conv3d(x: jax.Array, kernel: jax.Array,
                  bias: Optional[jax.Array] = None,
                  stride: IntOr3 = 1,
                  padding: IntOr3 = 0,
                  accum_dtype=jnp.float32) -> jax.Array:
    """Causal 3D conv, channels-last.

    x: [B, T, H, W, Cin]; kernel: [kt, kh, kw, Cin, Cout] (DHWIO).
    Temporal padding is causal: ``2 * pad_t`` zeros at the FRONT only
    (reference ``WanCausalConv3d.__init__``: ``self._padding =
    (pw, pw, ph, ph, 2*pt, 0)``, ``architecture/autoencoder_kl_wan.py:166``).
    Spatial padding is symmetric.
    """
    st, sh, sw = _triple(stride)
    pt, ph, pw = _triple(padding)
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype),
        window_strides=(st, sh, sw),
        padding=((2 * pt, 0), (ph, ph), (pw, pw)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=accum_dtype,
    )
    if bias is not None:
        y = y + bias.astype(accum_dtype)
    return y.astype(x.dtype)


def conv3d(x: jax.Array, kernel: jax.Array,
           bias: Optional[jax.Array] = None,
           stride: IntOr3 = 1,
           padding: Union[str, Sequence[Tuple[int, int]]] = "VALID",
           accum_dtype=jnp.float32) -> jax.Array:
    """Plain 3D conv (used for the DiT Conv3d patch embedding)."""
    st, sh, sw = _triple(stride) if not isinstance(stride, tuple) else stride
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype),
        window_strides=(st, sh, sw),
        padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=accum_dtype,
    )
    if bias is not None:
        y = y + bias.astype(accum_dtype)
    return y.astype(x.dtype)


def conv2d(x: jax.Array, kernel: jax.Array,
           bias: Optional[jax.Array] = None,
           stride: Union[int, Tuple[int, int]] = 1,
           padding: Union[str, Sequence[Tuple[int, int]]] = "SAME",
           accum_dtype=jnp.float32) -> jax.Array:
    """2D conv, channels-last. x: [N, H, W, C]; kernel: [kh, kw, Cin, Cout]."""
    s = (stride, stride) if isinstance(stride, int) else tuple(stride)
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype),
        window_strides=s,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
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
