"""T5 / UMT5 text encoders in JAX.

The Wan pipelines encode prompts with UMT5-XXL (reference
``pipelines/pipeline_wan_i2v_motion_FrameINO.py:206-245`` via
``transformers.UMT5EncoderModel``) and CogVideoX with T5-XXL v1.1
(``pipelines/pipeline_cogvideox_i2v_motion_FrameINO.py`` text encoder).
Both are relative-position-bias encoder stacks with RMS ("T5") layer
norm, un-scaled dot-product attention, and gated-GELU FFNs; UMT5 gives
every layer its own relative-position bias table while T5 shares layer
0's. Numerics are validated against ``transformers``
T5EncoderModel/UMT5EncoderModel in ``tests/test_t5_encoder.py``.

Post-encoding, the Wan recipe zero-fills embeddings beyond each
prompt's true length and pads to ``max_sequence_length`` (reference
``:226-243``) — see ``encode_and_mask``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from frameino_tpu.core.tree import stack_layers
from frameino_tpu.ops.linear import init_dense

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class T5EncoderConfig:
    vocab_size: int = 256384
    d_model: int = 4096
    d_kv: int = 64
    num_heads: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    per_layer_relative_bias: bool = True    # UMT5; False = classic T5
    gated_act: bool = True                  # v1.1 / UMT5 gated-gelu


UMT5_XXL = T5EncoderConfig()
T5_XXL_V11 = T5EncoderConfig(vocab_size=32128, per_layer_relative_bias=False)


def tiny_config(**kw) -> T5EncoderConfig:
    base = dict(vocab_size=64, d_model=16, d_kv=4, num_heads=2, d_ff=32,
                num_layers=2)
    base.update(kw)
    return T5EncoderConfig(**base)


# ---------------------------------------------------------------------------
# Relative position bias (T5 bucket scheme, bidirectional)
# ---------------------------------------------------------------------------

def relative_position_bucket(relative_position: np.ndarray,
                             num_buckets: int = 32,
                             max_distance: int = 128) -> np.ndarray:
    """transformers T5Attention._relative_position_bucket, bidirectional."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(np.int64) * num_buckets
    n = np.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact) / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    val_large = np.minimum(val_large, num_buckets - 1)
    return ret + np.where(is_small, n, val_large)


def position_bias_indices(seq_len: int, cfg: T5EncoderConfig) -> np.ndarray:
    """[S, S] bucket indices (host-side; static per length)."""
    ctx = np.arange(seq_len)[:, None]
    mem = np.arange(seq_len)[None, :]
    return relative_position_bucket(
        mem - ctx, cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _init_layer(key, cfg: T5EncoderConfig) -> Params:
    inner = cfg.num_heads * cfg.d_kv
    ks = iter(jax.random.split(key, 10))
    p: Params = {
        "attn": {
            "q": init_dense(next(ks), cfg.d_model, inner, bias=False),
            "k": init_dense(next(ks), cfg.d_model, inner, bias=False),
            "v": init_dense(next(ks), cfg.d_model, inner, bias=False),
            "o": init_dense(next(ks), inner, cfg.d_model, bias=False),
        },
        "attn_norm": {"weight": jnp.ones((cfg.d_model,))},
        "ffn_norm": {"weight": jnp.ones((cfg.d_model,))},
        "ffn": {
            "wi_1": init_dense(next(ks), cfg.d_model, cfg.d_ff, bias=False),
            "wo": init_dense(next(ks), cfg.d_ff, cfg.d_model, bias=False),
        },
    }
    if cfg.gated_act:
        p["ffn"]["wi_0"] = init_dense(next(ks), cfg.d_model, cfg.d_ff,
                                      bias=False)
    if cfg.per_layer_relative_bias:
        p["rel_bias"] = jax.random.normal(
            next(ks), (cfg.relative_attention_num_buckets, cfg.num_heads)
        ) * 0.02
    return p


def init_t5_encoder(key, cfg: T5EncoderConfig) -> Params:
    ks = iter(jax.random.split(key, 4 + cfg.num_layers))
    params: Params = {
        "embed_tokens": jax.random.normal(
            next(ks), (cfg.vocab_size, cfg.d_model)) * 1.0,
        "final_norm": {"weight": jnp.ones((cfg.d_model,))},
    }
    if not cfg.per_layer_relative_bias:
        params["rel_bias"] = jax.random.normal(
            next(ks), (cfg.relative_attention_num_buckets, cfg.num_heads)
        ) * 0.02
    layers = [_init_layer(k, cfg)
              for k in jax.random.split(next(ks), cfg.num_layers)]
    params["layers"] = stack_layers(layers)
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _t5_rms_norm(x, weight, eps):
    """T5LayerNorm: no mean subtraction; variance fp32; weight in input
    dtype."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return y * weight.astype(x.dtype)


def _layer_forward(cfg: T5EncoderConfig, p: Params, x, bias, mask_add):
    """One encoder block (pre-norm self-attn + FFN, no dropout)."""
    B, S, _ = x.shape
    h = _t5_rms_norm(x, p["attn_norm"]["weight"], cfg.layer_norm_epsilon)
    nh, dk = cfg.num_heads, cfg.d_kv

    def proj(name):
        return (h @ p["attn"][name]["kernel"].astype(h.dtype)).reshape(
            B, S, nh, dk).transpose(0, 2, 1, 3)

    q, k, v = proj("q"), proj("k"), proj("v")
    # T5 attention: NO 1/sqrt(d) scaling
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores + bias + mask_add
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    o = o.transpose(0, 2, 1, 3).reshape(B, S, nh * dk)
    x = x + o @ p["attn"]["o"]["kernel"].astype(x.dtype)

    h = _t5_rms_norm(x, p["ffn_norm"]["weight"], cfg.layer_norm_epsilon)
    if cfg.gated_act:
        gate = jax.nn.gelu(h @ p["ffn"]["wi_0"]["kernel"].astype(h.dtype),
                           approximate=True)
        up = h @ p["ffn"]["wi_1"]["kernel"].astype(h.dtype)
        ff = gate * up
    else:
        ff = jax.nn.relu(h @ p["ffn"]["wi_1"]["kernel"].astype(h.dtype))
    x = x + ff @ p["ffn"]["wo"]["kernel"].astype(x.dtype)
    return x


def t5_encode(cfg: T5EncoderConfig, params: Params,
              input_ids: jax.Array,
              attention_mask: Optional[jax.Array] = None) -> jax.Array:
    """input_ids [B, S] int32 -> [B, S, d_model]."""
    B, S = input_ids.shape
    x = params["embed_tokens"][input_ids]

    buckets = jnp.asarray(position_bias_indices(S, cfg))
    if attention_mask is not None:
        mask_add = jnp.where(attention_mask[:, None, None, :] > 0, 0.0,
                             jnp.float32(np.finfo(np.float32).min))
    else:
        mask_add = jnp.zeros((1, 1, 1, S), jnp.float32)

    if cfg.per_layer_relative_bias:
        def body(carry, layer_p):
            bias = layer_p["rel_bias"][buckets].transpose(2, 0, 1)[None]
            return _layer_forward(cfg, layer_p, carry, bias, mask_add), None
        x, _ = jax.lax.scan(body, x, params["layers"])
    else:
        bias = params["rel_bias"][buckets].transpose(2, 0, 1)[None]

        def body(carry, layer_p):
            return _layer_forward(cfg, layer_p, carry, bias, mask_add), None
        x, _ = jax.lax.scan(body, x, params["layers"])

    return _t5_rms_norm(x, params["final_norm"]["weight"],
                        cfg.layer_norm_epsilon)


def encode_and_mask(cfg: T5EncoderConfig, params: Params,
                    input_ids: jax.Array, attention_mask: jax.Array,
                    max_sequence_length: int = 512) -> jax.Array:
    """The Wan prompt-embedding recipe (reference ``:226-243``): encode
    with masking, zero-fill past each true length, pad/trim to
    ``max_sequence_length``."""
    emb = t5_encode(cfg, params, input_ids, attention_mask)
    emb = emb * attention_mask[..., None].astype(emb.dtype)
    S = emb.shape[1]
    if S < max_sequence_length:
        emb = jnp.pad(emb, ((0, 0), (0, max_sequence_length - S), (0, 0)))
    return emb[:, :max_sequence_length]
