"""CLIP vision tower (ViT) in JAX — Wan2.1 I2V condition-image encoder.

The reference encodes the condition image with ``CLIPVisionModel`` and
feeds the penultimate hidden states into the Wan DiT's image-KV branch
(reference ``pipelines/pipeline_wan_i2v_motion.py:22,65-66`` builds the
encoder; ``architecture/transformer_wan.py:122-143`` consumes
``encoder_hidden_states_image``). The diffusers Wan2.1 recipe is
``hidden_states[-2]``: the output of layer N-1 (input to the final
layer), WITHOUT the post-layernorm.

Standard pre-LN CLIP ViT: conv patchify (as a dense matmul on TPU),
class token, learned absolute position embeddings, pre-layernorm, N
residual blocks (LN -> MHA -> LN -> MLP), post-layernorm. Numerics are
validated against ``transformers.CLIPVisionModel`` in
``tests/test_clip_vision.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from frameino_tpu.core.tree import stack_layers
from frameino_tpu.ops import attention as attn_ops
from frameino_tpu.ops.linear import dense, init_dense
from frameino_tpu.ops.norms import layer_norm

Params = Dict[str, Any]

# CLIPImageProcessor normalization constants (OpenAI CLIP).
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_hidden_layers: int = 32
    num_attention_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    num_channels: int = 3
    layer_norm_eps: float = 1e-5
    hidden_act: str = "gelu"      # "gelu" (ViT-H) or "quick_gelu" (OpenAI)

    @property
    def num_positions(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1


# Wan2.1 I2V image encoder: CLIP ViT-H/14 (laion2B), penultimate states.
CLIP_VIT_H_14 = CLIPVisionConfig()


def tiny_config(**kw) -> CLIPVisionConfig:
    base = dict(hidden_size=16, intermediate_size=32, num_hidden_layers=2,
                num_attention_heads=2, image_size=28, patch_size=14)
    base.update(kw)
    return CLIPVisionConfig(**base)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _init_ln(d):
    return {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))}


def _init_layer(key, cfg: CLIPVisionConfig) -> Params:
    d = cfg.hidden_size
    ks = iter(jax.random.split(key, 8))
    return {
        "layer_norm1": _init_ln(d),
        "attn": {
            "q_proj": init_dense(next(ks), d, d),
            "k_proj": init_dense(next(ks), d, d),
            "v_proj": init_dense(next(ks), d, d),
            "out_proj": init_dense(next(ks), d, d),
        },
        "layer_norm2": _init_ln(d),
        "mlp": {
            "fc1": init_dense(next(ks), d, cfg.intermediate_size),
            "fc2": init_dense(next(ks), cfg.intermediate_size, d),
        },
    }


def init_clip_vision(key, cfg: CLIPVisionConfig) -> Params:
    d = cfg.hidden_size
    patch_in = cfg.num_channels * cfg.patch_size ** 2
    ks = iter(jax.random.split(key, 8 + cfg.num_hidden_layers))
    params: Params = {
        "class_embedding": jax.random.normal(next(ks), (d,)) * 0.02,
        # Conv2d(kernel=stride=patch, bias=False) as a dense matmul
        "patch_embedding": {
            "kernel": jax.random.normal(next(ks), (patch_in, d)) * 0.02},
        "position_embedding": jax.random.normal(
            next(ks), (cfg.num_positions, d)) * 0.02,
        "pre_layrnorm": _init_ln(d),
        "post_layernorm": _init_ln(d),
        "layers": stack_layers([
            _init_layer(k, cfg)
            for k in jax.random.split(next(ks), cfg.num_hidden_layers)]),
    }
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _act(x, kind: str):
    if kind == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=False)


def _patchify(x: jax.Array, patch: int) -> jax.Array:
    """[B, C, H, W] -> [B, (H/p)(W/p), C*p*p] matching Conv2d flattening."""
    B, C, H, W = x.shape
    p = patch
    x = x.reshape(B, C, H // p, p, W // p, p)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(B, (H // p) * (W // p), C * p * p)


def _layer_forward(cfg: CLIPVisionConfig, p: Params, x: jax.Array):
    eps = cfg.layer_norm_eps
    nh = cfg.num_attention_heads
    B, S, D = x.shape
    h = layer_norm(x, p["layer_norm1"]["weight"], p["layer_norm1"]["bias"],
                   eps=eps).astype(x.dtype)
    q = dense(h, p["attn"]["q_proj"]).reshape(B, S, nh, -1).transpose(0, 2, 1, 3)
    k = dense(h, p["attn"]["k_proj"]).reshape(B, S, nh, -1).transpose(0, 2, 1, 3)
    v = dense(h, p["attn"]["v_proj"]).reshape(B, S, nh, -1).transpose(0, 2, 1, 3)
    o = attn_ops.attention_xla(q, k, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, S, D)
    x = x + dense(o, p["attn"]["out_proj"])

    h = layer_norm(x, p["layer_norm2"]["weight"], p["layer_norm2"]["bias"],
                   eps=eps).astype(x.dtype)
    h = dense(h, p["mlp"]["fc1"])
    h = _act(h, cfg.hidden_act)
    h = dense(h, p["mlp"]["fc2"])
    return x + h


def clip_vision_forward(cfg: CLIPVisionConfig, params: Params,
                        pixel_values: jax.Array, *,
                        penultimate: bool = True) -> jax.Array:
    """pixel_values: [B, 3, H, W], CLIP-normalized.

    penultimate=True returns ``hidden_states[-2]`` (the Wan2.1 I2V
    ``image_embeds`` contract, [B, 257, hidden]); False returns the
    final layer output (transformers ``last_hidden_state`` — the
    post_layernorm applies only to the pooled CLS token in CLIP).
    """
    B = pixel_values.shape[0]
    x = _patchify(pixel_values, cfg.patch_size)
    x = jnp.einsum("bsp,pd->bsd", x,
                   params["patch_embedding"]["kernel"].astype(x.dtype))
    cls = jnp.broadcast_to(params["class_embedding"].astype(x.dtype),
                           (B, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"].astype(x.dtype)[None]
    x = layer_norm(x, params["pre_layrnorm"]["weight"],
                   params["pre_layrnorm"]["bias"],
                   eps=cfg.layer_norm_eps).astype(x.dtype)

    n = cfg.num_hidden_layers
    stacked = params["layers"]
    if penultimate:
        # run the first n-1 layers only: hidden_states[-2] is the input
        # to the final layer
        first = jax.tree.map(lambda a: a[:n - 1], stacked)

        def body(carry, lp):
            return _layer_forward(cfg, lp, carry), None

        x, _ = jax.lax.scan(body, x, first)
        return x

    def body(carry, lp):
        return _layer_forward(cfg, lp, carry), None

    x, _ = jax.lax.scan(body, x, stacked)
    return x


def clip_pooled_output(cfg: CLIPVisionConfig, params: Params,
                       last_hidden_state: jax.Array) -> jax.Array:
    """post_layernorm(CLS token) — transformers ``pooler_output``."""
    cls = last_hidden_state[:, 0]
    return layer_norm(cls, params["post_layernorm"]["weight"],
                      params["post_layernorm"]["bias"],
                      eps=cfg.layer_norm_eps).astype(last_hidden_state.dtype)


def preprocess_image(image: np.ndarray,
                     cfg: CLIPVisionConfig = CLIP_VIT_H_14) -> np.ndarray:
    """CLIPImageProcessor equivalence: [H, W, 3] uint8/float RGB ->
    [1, 3, S, S] normalized fp32 (bicubic resize of the short side +
    center crop, as the HF processor defaults)."""
    img = np.asarray(image)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    h, w = img.shape[:2]
    s = cfg.image_size
    scale = s / min(h, w)
    nh, nw = max(s, int(round(h * scale))), max(s, int(round(w * scale)))
    img = _resize_bicubic(img, nh, nw)
    top, left = (nh - s) // 2, (nw - s) // 2
    img = img[top:top + s, left:left + s]
    mean = np.asarray(CLIP_IMAGE_MEAN, np.float32)
    std = np.asarray(CLIP_IMAGE_STD, np.float32)
    img = (img - mean) / std
    return img.transpose(2, 0, 1)[None].astype(np.float32)


def _resize_bicubic(img: np.ndarray, nh: int, nw: int) -> np.ndarray:
    out = jax.image.resize(jnp.asarray(img), (nh, nw, img.shape[2]),
                           method="bicubic")
    return np.asarray(out)


# ---------------------------------------------------------------------------
# Weight loading (transformers CLIPVisionModel state dict)
# ---------------------------------------------------------------------------

def clip_vision_from_state_dict(sd: Dict[str, np.ndarray],
                                cfg: CLIPVisionConfig) -> Params:
    pre = ""
    if any(k.startswith("vision_model.") for k in sd):
        pre = "vision_model."

    def lin(name):
        return {"kernel": np.ascontiguousarray(sd[f"{pre}{name}.weight"].T),
                "bias": sd[f"{pre}{name}.bias"]}

    def ln(name):
        return {"weight": sd[f"{pre}{name}.weight"],
                "bias": sd[f"{pre}{name}.bias"]}

    pe = sd[f"{pre}embeddings.patch_embedding.weight"]  # [D, C, p, p]
    d = cfg.hidden_size
    layers = []
    for i in range(cfg.num_hidden_layers):
        b = f"encoder.layers.{i}."
        layers.append({
            "layer_norm1": ln(b + "layer_norm1"),
            "attn": {n: lin(b + f"self_attn.{n}")
                     for n in ("q_proj", "k_proj", "v_proj", "out_proj")},
            "layer_norm2": ln(b + "layer_norm2"),
            "mlp": {"fc1": lin(b + "mlp.fc1"), "fc2": lin(b + "mlp.fc2")},
        })
    params = {
        "class_embedding": sd[f"{pre}embeddings.class_embedding"],
        "patch_embedding": {
            "kernel": np.ascontiguousarray(pe.reshape(d, -1).T)},
        "position_embedding": sd[f"{pre}embeddings.position_embedding.weight"],
        "pre_layrnorm": ln("pre_layrnorm"),
        "post_layernorm": ln("post_layernorm"),
        "layers": stack_layers([jax.tree.map(jnp.asarray, l)
                                for l in layers]),
    }
    return jax.tree.map(jnp.asarray, params)


def load_clip_vision_weights(path: str, cfg: CLIPVisionConfig) -> Params:
    from frameino_tpu.models.weights import load_safetensors_dir
    return clip_vision_from_state_dict(load_safetensors_dir(path), cfg)


def encode_condition_image(cfg: CLIPVisionConfig, params: Params,
                           image) -> jax.Array:
    """Wan2.1 I2V ``image_embeds``: [B, 3, H, W] pixels in [-1, 1] ->
    [B, 257, hidden] penultimate hidden states (reference
    ``pipelines/pipeline_wan_i2v_motion.py:65-66`` encode_image)."""
    x = (np.asarray(image, np.float32) + 1.0) / 2.0
    px = np.concatenate([preprocess_image(im.transpose(1, 2, 0), cfg)
                         for im in x], axis=0)
    return clip_vision_forward(cfg, params, jnp.asarray(px))


def make_image_encoder_fn(cfg: CLIPVisionConfig, params: Params):
    """Pluggable ``image_encoder_fn`` for WanImageToVideoPipeline."""
    import functools
    return functools.partial(encode_condition_image, cfg, params)
