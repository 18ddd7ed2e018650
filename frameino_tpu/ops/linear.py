"""Dense / activation primitives with explicit accumulation dtype."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dense(x, params, accum_dtype=jnp.float32, out_dtype=None):
    """x @ kernel + bias. kernel: [in, out]; fp32 MXU accumulation.

    Output dtype defaults to x.dtype (bf16 compute path). When the
    param dict carries an int8-quantized kernel (``kernel_q`` +
    ``scale``, see frameino_tpu/models/quant.py), dispatches to the
    int8 dynamic-activation path — v5e's int8 MXU runs at 2x bf16
    (measured 224 vs 160 effective TFLOP/s incl. quant/dequant).
    """
    if "kernel_q" in params:
        return dense_int8(x, params, out_dtype=out_dtype)
    out_dtype = out_dtype or x.dtype
    y = jnp.dot(x, params["kernel"].astype(x.dtype),
                preferred_element_type=accum_dtype)
    if "bias" in params and params["bias"] is not None:
        y = y + params["bias"].astype(accum_dtype)
    return y.astype(out_dtype)


def dense_int8(x, params, out_dtype=None):
    """w8a8 dense: per-output-channel weight scales (static) x
    per-token activation scales (dynamic absmax), int32 MXU accumulate.

    y = (x_q @ w_q) * (s_x s_w) + bias — standard dynamic-quant matmul;
    the surrounding fp32 ops fuse into the producer/consumer (measured:
    XLA's fusions beat a hand-fused Pallas quantizer here — see the
    ops/dyn_quant negative result; that path ships disabled).
    """
    from frameino_tpu.ops import dyn_quant
    out_dtype = out_dtype or x.dtype
    if dyn_quant.supported(x):
        xq, s_x = dyn_quant.dynamic_quantize_rows(
            x, interpret=dyn_quant.FORCE_INTERPRET)
    else:
        xf = x.astype(jnp.float32)
        s_x = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
        s_x = jnp.maximum(s_x, 1e-12)
        xq = jnp.round(xf / s_x).astype(jnp.int8)
    y = jnp.matmul(xq, params["kernel_q"],
                   preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (s_x * params["scale"].astype(jnp.float32))
    if "bias" in params and params["bias"] is not None:
        y = y + params["bias"].astype(jnp.float32)
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
