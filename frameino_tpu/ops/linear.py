"""Dense / activation primitives with explicit accumulation dtype."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dense(x, params, accum_dtype=jnp.float32, out_dtype=None):
    """x @ kernel + bias. kernel: [in, out]; fp32 MXU accumulation.

    Output dtype defaults to x.dtype (bf16 compute path).
    """
    out_dtype = out_dtype or x.dtype
    y = jnp.dot(x, params["kernel"].astype(x.dtype),
                preferred_element_type=accum_dtype)
    if "bias" in params and params["bias"] is not None:
        y = y + params["bias"].astype(accum_dtype)
    return y.astype(out_dtype)


def gelu_tanh(x):
    """Tanh-approximated GELU — matches torch ``gelu(approximate='tanh')``
    used by diffusers' 'gelu-approximate'/'gelu_tanh' activations."""
    return jax.nn.gelu(x, approximate=True)


def silu(x):
    return jax.nn.silu(x)


def init_dense(key, in_dim, out_dim, bias=True, dtype=jnp.float32, scale=None):
    """Kaiming-uniform init mirroring torch.nn.Linear defaults."""
    import numpy as np
    k1, k2 = jax.random.split(key)
    bound = scale if scale is not None else float(np.sqrt(1.0 / in_dim))
    p = {"kernel": jax.random.uniform(k1, (in_dim, out_dim), dtype, -bound, bound)}
    if bias:
        p["bias"] = jax.random.uniform(k2, (out_dim,), dtype, -bound, bound)
    return p
