"""Wan 2.1/2.2 video DiT denoiser — pure-functional JAX.

Reference: ``architecture/transformer_wan.py`` (WanTransformer3DModel).
Key behaviors reproduced exactly:

- 3-axis RoPE with interleaved pairs; axis dims h=w=2*(head_dim//6),
  t = head_dim - h - w; fp64 tables (reference ``:192-253``, application
  ``:75-87``).
- AdaLN via a per-block ``scale_shift_table`` (fp32) added to the
  6-way timestep projection; fp32 residual accumulation around attention
  and FFN (reference ``:306-350``).
- qk RMS-norm "across heads" — over the full inner_dim before splitting
  heads (reference ``:263, 272-298`` + diffusers RMSNorm semantics).
- Per-token 2D timesteps for Wan2.2-TI2V: ``timestep [B, seq]`` makes
  temb ``[B, seq, dim]`` and the AdaLN modulation per-token (reference
  ``:315-331, 489-504, 519-527``).
- Optional I2V image-KV branch in cross attention (``add_k_proj``,
  reference ``:92-106``) and the image embedder (``WanImageEmbedding``,
  ``:122-143``).

TPU-first choices:
- The Conv3d patch embedding (kernel == stride == patch_size) is executed
  as reshape + one dense matmul — identical math, pure MXU.
- Transformer blocks run under ``lax.scan`` over a stacked parameter
  pytree: one compiled block body regardless of depth, with optional
  ``jax.checkpoint`` rematerialization for training.
- Attention dispatches to the Pallas flash kernels on TPU
  (``frameino_tpu/ops/attention.py``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from frameino_tpu.core.tree import stack_layers
from frameino_tpu.ops import attention as attn_ops
from frameino_tpu.ops import rope as rope_ops
from frameino_tpu.ops.embeddings import (pixart_text_projection,
                                         sinusoidal_timestep_embedding,
                                         timestep_embedding_mlp)
from frameino_tpu.ops.linear import dense, gelu_tanh, init_dense, silu
from frameino_tpu.ops.norms import layer_norm, rms_norm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class WanDiTConfig:
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    num_attention_heads: int = 24
    attention_head_dim: int = 128
    in_channels: int = 48
    out_channels: int = 48
    text_dim: int = 4096
    freq_dim: int = 256
    ffn_dim: int = 14336
    num_layers: int = 30
    cross_attn_norm: bool = True
    eps: float = 1e-6
    image_dim: Optional[int] = None
    added_kv_proj_dim: Optional[int] = None
    rope_max_seq_len: int = 1024
    pos_embed_seq_len: Optional[int] = None

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim


# Wan2.2-TI2V-5B: dim 3072 = 24 x 128, 30 layers, ffn 14336, z=48.
WAN22_TI2V_5B = WanDiTConfig()
# Stage-1/2 motion models: +48 trajectory-latent channels concatenated on
# the input (reference train_code/train_wan_motion.py:723-746 surgery).
WAN22_TI2V_5B_MOTION = dataclasses.replace(WAN22_TI2V_5B, in_channels=96)

# Wan2.1-I2V-14B: dim 5120 = 40 x 128, 40 layers, CLIP image-KV branch,
# 36 input channels (16 noisy + 4 mask + 16 image latents).
WAN21_I2V_14B = WanDiTConfig(
    num_attention_heads=40, attention_head_dim=128, in_channels=36,
    out_channels=16, ffn_dim=13824, num_layers=40,
    image_dim=1280, added_kv_proj_dim=5120)
# Wan2.1-T2V-1.3B: dim 1536 = 12 x 128, 30 layers.
WAN21_T2V_1_3B = WanDiTConfig(
    num_attention_heads=12, attention_head_dim=128, in_channels=16,
    out_channels=16, ffn_dim=8960, num_layers=30)


def tiny_config(**kw) -> WanDiTConfig:
    base = dict(num_attention_heads=2, attention_head_dim=24, in_channels=8,
                out_channels=8, text_dim=16, freq_dim=32, ffn_dim=64,
                num_layers=2)
    base.update(kw)
    return WanDiTConfig(**base)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _init_block(key, cfg: WanDiTConfig) -> Params:
    d = cfg.inner_dim
    ks = iter(jax.random.split(key, 16))
    p: Params = {
        "scale_shift_table": jax.random.normal(next(ks), (1, 6, d)) / d ** 0.5,
        "attn1": {
            "to_q": init_dense(next(ks), d, d),
            "to_k": init_dense(next(ks), d, d),
            "to_v": init_dense(next(ks), d, d),
            "to_out": init_dense(next(ks), d, d),
            "norm_q": {"weight": jnp.ones((d,))},
            "norm_k": {"weight": jnp.ones((d,))},
        },
        "attn2": {
            "to_q": init_dense(next(ks), d, d),
            "to_k": init_dense(next(ks), d, d),
            "to_v": init_dense(next(ks), d, d),
            "to_out": init_dense(next(ks), d, d),
            "norm_q": {"weight": jnp.ones((d,))},
            "norm_k": {"weight": jnp.ones((d,))},
        },
        "ffn": {
            "fc1": init_dense(next(ks), d, cfg.ffn_dim),
            "fc2": init_dense(next(ks), cfg.ffn_dim, d),
        },
    }
    if cfg.cross_attn_norm:
        p["norm2"] = {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))}
    if cfg.added_kv_proj_dim is not None:
        p["attn2"]["add_k_proj"] = init_dense(next(ks), cfg.added_kv_proj_dim, d)
        p["attn2"]["add_v_proj"] = init_dense(next(ks), cfg.added_kv_proj_dim, d)
        p["attn2"]["norm_added_k"] = {"weight": jnp.ones((d,))}
    return p


def init_wan_dit(key, cfg: WanDiTConfig) -> Params:
    d = cfg.inner_dim
    pt, ph, pw = cfg.patch_size
    patch_in = cfg.in_channels * pt * ph * pw
    ks = iter(jax.random.split(key, 16 + cfg.num_layers))
    params: Params = {
        # Conv3d(kernel=stride=patch) as dense over (C, pt, ph, pw) patches.
        "patch_embedding": init_dense(next(ks), patch_in, d),
        "condition_embedder": {
            "time_embedder": {
                "linear_1": init_dense(next(ks), cfg.freq_dim, d),
                "linear_2": init_dense(next(ks), d, d),
            },
            "time_proj": init_dense(next(ks), d, 6 * d),
            "text_embedder": {
                "linear_1": init_dense(next(ks), cfg.text_dim, d),
                "linear_2": init_dense(next(ks), d, d),
            },
        },
        "norm_out_table": jax.random.normal(next(ks), (1, 2, d)) / d ** 0.5,
        "proj_out": init_dense(next(ks), d, cfg.out_channels * pt * ph * pw),
    }
    if cfg.image_dim is not None:
        ie: Params = {
            "norm1": {"weight": jnp.ones((cfg.image_dim,)),
                      "bias": jnp.zeros((cfg.image_dim,))},
            "ff": {"fc1": init_dense(next(ks), cfg.image_dim, cfg.image_dim),
                   "fc2": init_dense(next(ks), cfg.image_dim, d)},
            "norm2": {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        }
        if cfg.pos_embed_seq_len is not None:
            ie["pos_embed"] = jnp.zeros((1, cfg.pos_embed_seq_len, cfg.image_dim))
        params["condition_embedder"]["image_embedder"] = ie
    blocks = [_init_block(k, cfg) for k in
              jax.random.split(next(ks), cfg.num_layers)]
    params["blocks"] = stack_layers(blocks)
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _patchify_tokens(x: jax.Array, patch: Tuple[int, int, int]) -> jax.Array:
    """[B, C, F, H, W] -> [B, (F/pt)(H/ph)(W/pw), C*pt*ph*pw] with patch
    vector layout (C, pt, ph, pw) — matching Conv3d weight flattening."""
    B, C, F, H, W = x.shape
    pt, ph, pw = patch
    x = x.reshape(B, C, F // pt, pt, H // ph, ph, W // pw, pw)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)      # B, Ft, Hp, Wp, C, pt, ph, pw
    return x.reshape(B, (F // pt) * (H // ph) * (W // pw), C * pt * ph * pw)


def _unpatchify_tokens(x: jax.Array, grid: Tuple[int, int, int],
                       patch: Tuple[int, int, int], out_ch: int) -> jax.Array:
    """Inverse of the reference unpatchify (transformer_wan.py:539-543).
    x: [B, S, out_ch*pt*ph*pw] -> [B, out_ch, F, H, W]."""
    B = x.shape[0]
    f, h, w = grid
    pt, ph, pw = patch
    x = x.reshape(B, f, h, w, pt, ph, pw, out_ch)
    x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)      # B, C, f, pt, h, ph, w, pw
    return x.reshape(B, out_ch, f * pt, h * ph, w * pw)


def _qk_norm_across_heads(x, params, eps):
    """diffusers RMSNorm over the full inner_dim (reference
    transformer_wan.py:263 'rms_norm_across_heads')."""
    return rms_norm(x, params["weight"], eps=eps)


def _split_heads(x, num_heads):
    B, S, D = x.shape
    return x.reshape(B, S, num_heads, D // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    B, H, S, Dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, S, H * Dh)


def _dispatch_attention(q, k, v, cfg, attn_impl, differentiable, mesh,
                        gather_kv):
    """See ops/attention.dispatch_attention (sp shard_map when active)."""
    return attn_ops.dispatch_attention(q, k, v, mesh=mesh,
                                       gather_kv=gather_kv, impl=attn_impl,
                                       differentiable=differentiable)


def _self_attention(p, x, cos, sin, cfg, attn_impl, differentiable,
                    mesh=None):
    eps = cfg.eps
    q = dense(x, p["to_q"])
    k = dense(x, p["to_k"])
    v = dense(x, p["to_v"])
    # fused-producer flash path (pallas inference): the qk RMS-norm +
    # interleaved RoPE run inside the kernel's tile loads, skipping
    # their [B, S, H*D] HBM round-trips (ops/attention). On dp/fsdp/tp
    # meshes the same kernels run inside a shard_map (bare pallas_calls
    # GSPMD cannot partition): dp/fsdp keep heads local, tp psums the
    # across-heads RMS statistic (fused_qk_flash_attention_sharded).
    # sp>1 meshes take the dispatch_attention path below (the producers
    # need the full sequence's rope rows).
    fused_wanted = (attn_ops.FUSED_QK_PRODUCERS and not differentiable
                    and (attn_impl == "pallas"
                         or (attn_impl is None and attn_ops._on_tpu())))
    if fused_wanted:
        vh = v.reshape(*v.shape[:2], cfg.num_attention_heads,
                       -1).transpose(0, 2, 1, 3)
        if not attn_ops.needs_sharded_attention(mesh):
            o = attn_ops.fused_qk_flash_attention(
                q, k, vh,
                p["norm_q"]["weight"], p["norm_k"]["weight"], cos, sin,
                num_heads=cfg.num_attention_heads, eps=eps,
                interpret=attn_ops.FORCE_INTERPRET)
            return dense(_merge_heads(o), p["to_out"])
        if attn_ops.fused_sharded_supported(mesh, q.shape[0],
                                            cfg.num_attention_heads):
            o = attn_ops.fused_qk_flash_attention_sharded(
                q, k, vh,
                p["norm_q"]["weight"], p["norm_k"]["weight"], cos, sin,
                mesh, num_heads=cfg.num_attention_heads, eps=eps,
                interpret=attn_ops.FORCE_INTERPRET)
            return dense(_merge_heads(o), p["to_out"])
    q = _qk_norm_across_heads(q, p["norm_q"], eps)
    k = _qk_norm_across_heads(k, p["norm_k"], eps)
    q = _split_heads(q, cfg.num_attention_heads)
    k = _split_heads(k, cfg.num_attention_heads)
    v = _split_heads(v, cfg.num_attention_heads)
    q = rope_ops.apply_rope_interleaved(q, cos, sin)
    k = rope_ops.apply_rope_interleaved(k, cos, sin)
    o = _dispatch_attention(q, k, v, cfg, attn_impl, differentiable, mesh,
                            gather_kv=True)
    return dense(_merge_heads(o), p["to_out"])


def _cross_attention(p, x, context, context_img, cfg, attn_impl,
                     differentiable, mesh=None, kv=None):
    eps = cfg.eps
    q = dense(x, p["to_q"])
    q = _qk_norm_across_heads(q, p["norm_q"], eps)
    qh = _split_heads(q, cfg.num_attention_heads)

    if kv is not None:
        # precomputed text K/V (loop-invariant across denoise steps —
        # see precompute_text_kv): skip the per-step projections
        kh, vh = kv["k"], kv["v"]
    else:
        k = dense(context, p["to_k"])
        v = dense(context, p["to_v"])
        k = _qk_norm_across_heads(k, p["norm_k"], eps)
        kh = _split_heads(k, cfg.num_attention_heads)
        vh = _split_heads(v, cfg.num_attention_heads)
    o = _dispatch_attention(qh, kh, vh, cfg, attn_impl, differentiable,
                            mesh, gather_kv=False)

    if kv is not None and "k_img" in kv:
        o_img = _dispatch_attention(qh, kv["k_img"], kv["v_img"], cfg,
                                    attn_impl, differentiable, mesh,
                                    gather_kv=False)
        o = o + o_img
    elif context_img is not None and "add_k_proj" in p:
        k_img = dense(context_img, p["add_k_proj"])
        k_img = _qk_norm_across_heads(k_img, p["norm_added_k"], eps)
        v_img = dense(context_img, p["add_v_proj"])
        o_img = _dispatch_attention(
            qh, _split_heads(k_img, cfg.num_attention_heads),
            _split_heads(v_img, cfg.num_attention_heads),
            cfg, attn_impl, differentiable, mesh, gather_kv=False)
        o = o + o_img
    return dense(_merge_heads(o), p["to_out"])


def precompute_text_kv(cfg: WanDiTConfig, params: Params,
                       encoder_hidden_states: jax.Array,
                       encoder_hidden_states_image: Optional[jax.Array] = None,
                       dtype=jnp.bfloat16) -> Params:
    """Per-block cross-attention K/V for a fixed text context.

    The text context is loop-invariant across denoise steps, but the
    denoise ``lax.scan`` body re-projects it every step (XLA does not
    hoist weights-side matmuls out of a scan whose carry feeds them
    downstream). Computing them once per clip removes, per step,
    2 x num_layers [L_text, D] x [D, D] matmuls + the k RMS-norm and —
    on the int8 path — their per-token activation-quant reduces.

    Returns a pytree of stacked arrays (leading axis = layer):
      ``k``/``v``: [L, B, H, L_text, Dh]  (+ ``k_img``/``v_img`` for
      the Wan2.1 I2V image-KV branch, reference
      ``architecture/transformer_wan.py:92-106``).
    Feed it to ``wan_dit_forward(..., text_kv=...)`` — equality with
    the unhoisted path is exact (same ops, same order).
    """
    ce = params["condition_embedder"]
    context = pixart_text_projection(encoder_hidden_states,
                                     ce["text_embedder"], out_dtype=dtype)
    context_img = None
    if (encoder_hidden_states_image is not None
            and "image_embedder" in ce):
        context_img = _image_embedder(ce["image_embedder"],
                                      encoder_hidden_states_image, cfg.eps)

    def per_block(attn2):
        k = dense(context, attn2["to_k"])
        v = dense(context, attn2["to_v"])
        k = _qk_norm_across_heads(k, attn2["norm_k"], cfg.eps)
        out = {"k": _split_heads(k, cfg.num_attention_heads),
               "v": _split_heads(v, cfg.num_attention_heads)}
        if context_img is not None and "add_k_proj" in attn2:
            k_img = dense(context_img, attn2["add_k_proj"])
            k_img = _qk_norm_across_heads(k_img, attn2["norm_added_k"],
                                          cfg.eps)
            v_img = dense(context_img, attn2["add_v_proj"])
            out["k_img"] = _split_heads(k_img, cfg.num_attention_heads)
            out["v_img"] = _split_heads(v_img, cfg.num_attention_heads)
        return out

    return jax.lax.map(per_block, params["blocks"]["attn2"])


def _block_forward(cfg: WanDiTConfig, p: Params, x, context, context_img,
                   timestep_proj, cos, sin, attn_impl, differentiable,
                   mesh=None, kv=None):
    """WanTransformerBlock.forward (reference :308-350).

    x: [B, S, D] compute dtype; timestep_proj fp32 [B, (S|1), 6, D].
    """
    table = p["scale_shift_table"].astype(jnp.float32)     # [1, 6, D]
    if isinstance(timestep_proj, tuple):
        # Two-level per-token timesteps (Wan2.2 TI2V expand path): the
        # per-token vector is mask*t with only two distinct values, so
        # instead of reading a [B, S, 6, D] fp32 modulation tensor from
        # HBM in every block (~12% of the 5B forward, measured), select
        # per token between two [B, 6, D] rows. The select fuses into
        # each consumer; traffic drops to the bf16 activations + mask.
        pair, sel = timestep_proj          # [B, 2, 6, D] fp32, [B, S, 1]
        mod = table[None] + pair           # [B, 2, 6, D]

        def pick(i):
            lo, hi = mod[:, 0, i][:, None], mod[:, 1, i][:, None]
            return jnp.where(sel > 0.5, hi, lo)            # [B, S, D]

        shift_msa, scale_msa, gate_msa, c_shift, c_scale, c_gate = [
            pick(i) for i in range(6)]
    else:
        mod = table[None] + timestep_proj                  # [B, S|1, 6, D]
        shift_msa, scale_msa, gate_msa, c_shift, c_scale, c_gate = [
            m[:, :, 0] for m in jnp.split(mod, 6, axis=2)]  # each [B,S|1,D]

    # 1. self attention
    norm_x = (layer_norm(x, eps=cfg.eps) * (1 + scale_msa) + shift_msa)
    attn_out = _self_attention(p["attn1"], norm_x.astype(x.dtype), cos, sin,
                               cfg, attn_impl, differentiable, mesh)
    x = (x.astype(jnp.float32) + attn_out.astype(jnp.float32) * gate_msa
         ).astype(x.dtype)

    # 2. cross attention
    if cfg.cross_attn_norm:
        norm_x = layer_norm(x, p["norm2"]["weight"], p["norm2"]["bias"],
                            eps=cfg.eps).astype(x.dtype)
    else:
        norm_x = x
    x = x + _cross_attention(p["attn2"], norm_x, context, context_img, cfg,
                             attn_impl, differentiable, mesh, kv=kv)

    # 3. feed-forward (gelu-approximate)
    norm_x = (layer_norm(x, eps=cfg.eps) * (1 + c_scale) + c_shift)
    h = dense(norm_x.astype(x.dtype), p["ffn"]["fc1"])
    h = gelu_tanh(h)
    h = dense(h, p["ffn"]["fc2"])
    x = (x.astype(jnp.float32) + h.astype(jnp.float32) * c_gate
         ).astype(x.dtype)
    return x


def _image_embedder(p, img, eps):
    """WanImageEmbedding (reference :122-143): FP32LN -> FF(gelu exact,
    mult=1) -> FP32LN, with optional learned pos_embed."""
    if "pos_embed" in p:
        B, S, D = img.shape
        img = img.reshape(-1, 2 * S, D) + p["pos_embed"]
    h = layer_norm(img, p["norm1"]["weight"], p["norm1"]["bias"], eps=1e-5)
    h = dense(h.astype(img.dtype), p["ff"]["fc1"])
    h = jax.nn.gelu(h, approximate=False)
    h = dense(h, p["ff"]["fc2"])
    return layer_norm(h, p["norm2"]["weight"], p["norm2"]["bias"],
                      eps=1e-5).astype(img.dtype)


def wan_dit_forward(cfg: WanDiTConfig, params: Params,
                    hidden_states: jax.Array,
                    timestep: jax.Array,
                    encoder_hidden_states: jax.Array,
                    encoder_hidden_states_image: Optional[jax.Array] = None,
                    *,
                    timestep_mask: Optional[jax.Array] = None,
                    attn_impl: Optional[str] = None,
                    differentiable: bool = False,
                    remat: bool = False,
                    mesh=None,
                    pp_microbatches: Optional[int] = None,
                    text_kv: Optional[Params] = None) -> jax.Array:
    """WanTransformer3DModel.forward (reference :454-551).

    hidden_states: [B, C, F, H, W] (latent + condition channels).
    timestep: [B] float, or [B, S] per-token (Wan2.2 TI2V expand path).
    timestep_mask: [B, S] 0/1 — fast two-level form of the expand path:
      effective per-token timestep is ``mask * timestep`` (the exact
      reference semantics, ``(mask[..., ::2, ::2] * t).flatten()``,
      pipeline_wan_i2v_motion_FrameINO.py:832-843) computed as a fused
      per-token select instead of a [B, S, 6, D] fp32 tensor. Requires
      scalar ``timestep`` [B].
    encoder_hidden_states: [B, L, text_dim] UMT5 features.
    Returns [B, out_channels, F, H, W].

    ``mesh``: active jax.sharding.Mesh. With an sp>1 axis, video tokens
    are sharded along the sequence and every attention call runs as a
    sequence-parallel shard_map (all-gather-KV context parallelism) —
    the long-context headroom the reference never had (SURVEY §5).
    With a pp>1 axis, the block sweep runs as a GPipe pipeline over the
    stacked-layer axis (``parallel/pipeline.py``): ``pp_microbatches``
    (default pp) must divide the batch, num_layers must divide by pp,
    and sp must be 1 (the manual pp region excludes the sp shard_map).

    ``text_kv``: precomputed per-block cross-attention K/V
    (``precompute_text_kv``) — ``encoder_hidden_states`` is then unused
    and may be None. Not supported with pp>1 (the pipeline stages the
    layer axis).
    """
    B, C, F, H, W = hidden_states.shape
    pt, ph, pw = cfg.patch_size
    grid = (F // pt, H // ph, W // pw)

    ppn = 1 if mesh is None else mesh.shape.get("pp", 1)
    if ppn > 1:
        from frameino_tpu.parallel import pipeline as pp_mod
        if mesh.shape.get("sp", 1) > 1:
            raise ValueError(
                "pp and sp cannot combine: the manual-pp pipeline region "
                "excludes the sp attention shard_map")
        if not pp_mod.supports_pp(mesh, cfg.num_layers, B, pp_microbatches):
            raise ValueError(
                f"pp={ppn} needs num_layers % pp == 0 and batch % "
                f"microbatches == 0 (L={cfg.num_layers}, B={B}, "
                f"M={pp_microbatches or ppn})")

    cos_np, sin_np = rope_ops.wan_rope_table(cfg.attention_head_dim, *grid,
                                             max_seq_len=cfg.rope_max_seq_len)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)

    x = _patchify_tokens(hidden_states, cfg.patch_size)
    x = dense(x, params["patch_embedding"])
    if mesh is not None:
        from frameino_tpu.parallel.sharding import constrain
        x = constrain(x, mesh, "tokens")

    ce = params["condition_embedder"]
    two_level = timestep_mask is not None
    if two_level:
        assert timestep.ndim == 1, "timestep_mask requires scalar timesteps"
        # embed both distinct values (0 and t) once: [B, 2]
        timestep = jnp.stack([jnp.zeros_like(timestep), timestep], axis=1)
    t_freq = sinusoidal_timestep_embedding(timestep.astype(jnp.float32),
                                           cfg.freq_dim)
    temb = timestep_embedding_mlp(t_freq, ce["time_embedder"])  # [..., D] fp32
    timestep_proj = dense(silu(temb), ce["time_proj"],
                          out_dtype=jnp.float32)
    per_token = timestep.ndim == 2 and not two_level
    if two_level:
        pair = timestep_proj.reshape(B, 2, 6, cfg.inner_dim)
        sel = timestep_mask.astype(jnp.float32)[:, :, None]     # [B, S, 1]
        timestep_proj = (pair, sel)
    elif per_token:
        timestep_proj = timestep_proj.reshape(B, -1, 6, cfg.inner_dim)
    else:
        timestep_proj = timestep_proj.reshape(B, 1, 6, cfg.inner_dim)

    if text_kv is not None:
        context = context_img = None      # K/V already projected per block
    else:
        context = pixart_text_projection(encoder_hidden_states,
                                         ce["text_embedder"],
                                         out_dtype=x.dtype)
        context_img = None
        if encoder_hidden_states_image is not None and "image_embedder" in ce:
            context_img = _image_embedder(ce["image_embedder"],
                                          encoder_hidden_states_image, cfg.eps)

    stacked = params["blocks"]
    if ppn > 1:
        if text_kv is not None:
            raise ValueError("text_kv is not supported with pp>1 (the "
                             "pipeline stages the stacked-layer axis)")
        from frameino_tpu.parallel import pipeline as pp_mod
        aux_batch = {"context": context, "timestep_proj": timestep_proj}
        if context_img is not None:
            aux_batch["context_img"] = context_img

        # blocks run with mesh=None inside the manual-pp region, but the
        # operands are still GSPMD-sharded over any dp/fsdp/tp axes — a
        # bare pallas_call there would be replicated, so force XLA
        # attention when the inner submesh is multi-device
        inner_multi = any(mesh.shape.get(a, 1) > 1
                          for a in ("dp", "fsdp", "tp"))
        pp_attn_impl = ("xla" if inner_multi and attn_impl in (None, "pallas")
                        else attn_impl)

        def block_fn(layer_params, h, aux, shared):
            return _block_forward(cfg, layer_params, h, aux["context"],
                                  aux.get("context_img"),
                                  aux["timestep_proj"], shared[0], shared[1],
                                  pp_attn_impl, differentiable, None)

        x = pp_mod.pipeline_blocks(mesh, stacked, x, aux_batch, (cos, sin),
                                   block_fn, microbatches=pp_microbatches,
                                   remat=remat)
    else:
        def body(carry, xs):
            layer_params, kv = xs
            h = _block_forward(cfg, layer_params, carry, context, context_img,
                               timestep_proj, cos, sin, attn_impl,
                               differentiable, mesh, kv=kv)
            return h, None

        if remat:
            body = jax.checkpoint(body, prevent_cse=False)
        x, _ = jax.lax.scan(body, x, (stacked, text_kv))

    # Output AdaLN + projection (reference :519-537)
    table = params["norm_out_table"].astype(jnp.float32)    # [1, 2, D]
    if two_level:
        pair, sel = timestep_proj
        mod = table[None] + temb[:, :, None, :]             # [B, 2, 2, D]
        shift = jnp.where(sel > 0.5, mod[:, 1, 0][:, None],
                          mod[:, 0, 0][:, None])            # [B, S, D]
        scale = jnp.where(sel > 0.5, mod[:, 1, 1][:, None],
                          mod[:, 0, 1][:, None])
    elif per_token:
        mod = table[None] + temb.reshape(B, -1, 1, cfg.inner_dim)
        shift, scale = mod[:, :, 0], mod[:, :, 1]
    else:
        mod = table + temb[:, None, :]                      # [B, 2, D]
        shift, scale = mod[:, :1], mod[:, 1:2]
    x = (layer_norm(x, eps=cfg.eps) * (1 + scale) + shift).astype(x.dtype)
    x = dense(x, params["proj_out"])
    return _unpatchify_tokens(x, grid, cfg.patch_size, cfg.out_channels)
