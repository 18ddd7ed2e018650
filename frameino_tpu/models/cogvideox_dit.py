"""CogVideoX video DiT (joint text+video sequence) — pure-functional JAX.

Reference: ``architecture/cogvideox_transformer_3d.py`` plus the custom
``CogVideoXPatchEmbed`` (``architecture/embeddings.py:626-805``) and
``CogVideoXAttnProcessor2_0`` (``architecture/attention_processor.py:
2805-2877``). Key behaviors reproduced exactly:

- Patch embed concatenates projected text tokens BEFORE video tokens and
  adds the joint 3D-sincos positional embedding to the merged sequence
  (``embeddings.py:718-805``); the FrameIn extension appends one extra
  frame of positional embeddings sliced at the *actual* text length —
  including the reference's own off-by-text-length quirk at
  ``embeddings.py:773-775`` (slice starts at text_seq_length rather than
  max_text_seq_length; the two agree at the default 226) — and
  trilinear-resizes position embeddings for variable resolution
  (``:781-798``).
- Joint self-attention over [text; video] with per-head LayerNorm qk
  norm (eps 1e-6) and RoPE applied to the VIDEO tokens only
  (``attention_processor.py:2854-2860``).
- AdaLN-Zero (``CogVideoXLayerNormZero``): silu(temb) -> 6-way linear;
  separate gates for text and video streams; FFN runs on the re-merged
  sequence (``cogvideox_transformer_3d.py:122-161``).
- Final LayerNorm over the re-merged sequence, then AdaLayerNorm with
  chunk order (shift, scale) at chunk_dim=1, proj_out, 2D unpatchify
  (``:531-555``).

TPU-first: blocks under ``lax.scan``; the Conv2d patchify is a dense
matmul; attention uses the Pallas flash kernels on TPU.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from frameino_tpu.core.tree import stack_layers
from frameino_tpu.ops import attention as attn_ops
from frameino_tpu.ops import rope as rope_ops
from frameino_tpu.ops.embeddings import (cogvideox_3d_sincos_pos_embed,
                                         sinusoidal_timestep_embedding,
                                         timestep_embedding_mlp)
from frameino_tpu.ops.linear import dense, gelu_tanh, init_dense, silu
from frameino_tpu.ops.norms import layer_norm
from frameino_tpu.ops.rope import apply_rope_interleaved

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class CogVideoXConfig:
    num_attention_heads: int = 48
    attention_head_dim: int = 64
    in_channels: int = 32
    out_channels: int = 16
    time_embed_dim: int = 512
    ofs_embed_dim: Optional[int] = None
    text_embed_dim: int = 4096
    num_layers: int = 42
    attention_bias: bool = True
    sample_width: int = 90
    sample_height: int = 60
    sample_frames: int = 49
    patch_size: int = 2
    patch_size_t: Optional[int] = None
    temporal_compression_ratio: int = 4
    max_text_seq_length: int = 226
    norm_eps: float = 1e-5
    qk_norm_eps: float = 1e-6
    spatial_interpolation_scale: float = 1.875
    temporal_interpolation_scale: float = 1.0
    use_rotary_positional_embeddings: bool = True
    use_learned_positional_embeddings: bool = True
    use_frame_in: bool = False
    freq_shift: int = 0

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim


# CogVideoX-I2V-5B (motion variant: in_channels 48 = 16 noisy + 16 image
# + 16 traj after the reference's channel surgery,
# train_code/train_cogvideox_motion.py:641-654)
COGVIDEOX_5B_I2V = CogVideoXConfig()
COGVIDEOX_5B_I2V_MOTION = dataclasses.replace(COGVIDEOX_5B_I2V,
                                              in_channels=48)
COGVIDEOX_5B_I2V_FRAMEINO = dataclasses.replace(COGVIDEOX_5B_I2V,
                                                in_channels=48,
                                                use_frame_in=True)


def tiny_config(**kw) -> CogVideoXConfig:
    base = dict(num_attention_heads=2, attention_head_dim=16, in_channels=12,
                out_channels=4, time_embed_dim=16, text_embed_dim=16,
                num_layers=2, sample_width=8, sample_height=8,
                sample_frames=9, max_text_seq_length=8)
    base.update(kw)
    return CogVideoXConfig(**base)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _init_ln(dim, affine=True):
    return ({"weight": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}
            if affine else {})


def _init_block(key, cfg: CogVideoXConfig) -> Params:
    d = cfg.inner_dim
    hd = cfg.attention_head_dim
    ks = iter(jax.random.split(key, 16))
    return {
        "norm1": {
            "linear": init_dense(next(ks), cfg.time_embed_dim, 6 * d),
            "norm": _init_ln(d),
        },
        "attn1": {
            "to_q": init_dense(next(ks), d, d, bias=cfg.attention_bias),
            "to_k": init_dense(next(ks), d, d, bias=cfg.attention_bias),
            "to_v": init_dense(next(ks), d, d, bias=cfg.attention_bias),
            "to_out": init_dense(next(ks), d, d),
            "norm_q": _init_ln(hd),
            "norm_k": _init_ln(hd),
        },
        "norm2": {
            "linear": init_dense(next(ks), cfg.time_embed_dim, 6 * d),
            "norm": _init_ln(d),
        },
        "ff": {
            "fc1": init_dense(next(ks), d, 4 * d),
            "fc2": init_dense(next(ks), 4 * d, d),
        },
    }


def init_cogvideox_dit(key, cfg: CogVideoXConfig) -> Params:
    d = cfg.inner_dim
    p = cfg.patch_size
    patch_in = cfg.in_channels * p * p * (cfg.patch_size_t or 1)
    ks = iter(jax.random.split(key, 24))
    params: Params = {
        "patch_embed": {
            "proj": init_dense(next(ks), patch_in, d),
            "text_proj": init_dense(next(ks), cfg.text_embed_dim, d),
        },
        "time_embedding": {
            "linear_1": init_dense(next(ks), d, cfg.time_embed_dim),
            "linear_2": init_dense(next(ks), cfg.time_embed_dim,
                                   cfg.time_embed_dim),
        },
        "norm_final": _init_ln(d),
        "norm_out": {
            "linear": init_dense(next(ks), cfg.time_embed_dim, 2 * d),
            "norm": _init_ln(d),
        },
        "proj_out": init_dense(
            next(ks), d,
            cfg.out_channels * p * p * (cfg.patch_size_t or 1)),
    }
    if cfg.ofs_embed_dim:
        params["ofs_embedding"] = {
            "linear_1": init_dense(next(ks), cfg.ofs_embed_dim,
                                   cfg.ofs_embed_dim),
            "linear_2": init_dense(next(ks), cfg.ofs_embed_dim,
                                   cfg.ofs_embed_dim),
        }
    if not cfg.use_rotary_positional_embeddings or \
            cfg.use_learned_positional_embeddings:
        params["patch_embed"]["pos_embedding"] = _default_pos_embedding(cfg)
    blocks = [_init_block(k, cfg)
              for k in jax.random.split(next(ks), cfg.num_layers)]
    params["blocks"] = stack_layers(blocks)
    return params


def _default_pos_embedding(cfg: CogVideoXConfig) -> jnp.ndarray:
    """_get_positional_embeddings (embeddings.py:692-715): zeros over the
    text slots, 3D sincos over the video patch grid."""
    ph = cfg.sample_height // cfg.patch_size
    pw = cfg.sample_width // cfg.patch_size
    pf = (cfg.sample_frames - 1) // cfg.temporal_compression_ratio + 1
    pos = cogvideox_3d_sincos_pos_embed(
        cfg.inner_dim, ph, pw, pf,
        cfg.spatial_interpolation_scale, cfg.temporal_interpolation_scale)
    pos = pos.reshape(pf * ph * pw, cfg.inner_dim)
    joint = np.zeros((1, cfg.max_text_seq_length + pos.shape[0],
                      cfg.inner_dim), np.float32)
    joint[:, cfg.max_text_seq_length:] = pos
    return jnp.asarray(joint)


# ---------------------------------------------------------------------------
# Patch embed (embeddings.py:718-805)
# ---------------------------------------------------------------------------

def patch_embed_forward(cfg: CogVideoXConfig, p: Params,
                        text_embeds: jax.Array,
                        video: jax.Array) -> jax.Array:
    """text [B, L, text_dim]; video [B, F, C, H, W] -> [B, L+S, D]."""
    B, F, C, H, W = video.shape
    text = dense(text_embeds, p["text_proj"])
    L = text.shape[1]

    ps = cfg.patch_size
    pt = cfg.patch_size_t
    if pt is None:
        # Conv2d(k=s=p) as dense: patch vector layout (C, ph, pw)
        v = video.reshape(B, F, C, H // ps, ps, W // ps, ps)
        v = v.transpose(0, 1, 3, 5, 2, 4, 6)
        v = v.reshape(B, F * (H // ps) * (W // ps), C * ps * ps)
    else:
        # CogVideoX 1.5 linear patchify (embeddings.py:739-748):
        # layout (pt, ph, pw, C) flattened
        v = video.transpose(0, 1, 3, 4, 2)              # B,F,H,W,C
        v = v.reshape(B, F // pt, pt, H // ps, ps, W // ps, ps, C)
        v = v.transpose(0, 1, 3, 5, 2, 4, 6, 7)
        v = v.reshape(B, (F // pt) * (H // ps) * (W // ps),
                      pt * ps * ps * C)
    v = dense(v, p["proj"])
    embeds = jnp.concatenate([text, v], axis=1)

    if "pos_embedding" in p:
        pos = p["pos_embedding"]
        num_frames = F
        if cfg.use_frame_in:
            # reference embeddings.py:772-775 (quirk reproduced: the
            # appended first-frame slice starts at the ACTUAL text length)
            first_frame_tokens = (pos.shape[1] - cfg.max_text_seq_length) \
                // (num_frames - 1)
            pos = jnp.concatenate(
                [pos, pos[:, L:L + first_frame_tokens]], axis=1)

        pre_t_frames = (num_frames - 1) * cfg.temporal_compression_ratio + 1
        post_t = (cfg.sample_frames - 1) // cfg.temporal_compression_ratio + 1
        ph = cfg.sample_height // ps
        pw = cfg.sample_width // ps
        seq_length = H * W * num_frames // (ps * ps)
        if (cfg.sample_height != H or cfg.sample_width != W or
                cfg.sample_frames != pre_t_frames):
            if cfg.use_frame_in:
                post_t = post_t + 1
            D = embeds.shape[-1]
            pv = pos[:, L:].reshape(1, post_t, ph, pw, D)
            pv = jax.image.resize(
                pv, (1, num_frames, H // ps, W // ps, D), method="trilinear")
            pos = jnp.concatenate(
                [pos[:, :L], pv.reshape(1, -1, D)], axis=1)
            pos = pos[:, :L + seq_length]
        embeds = embeds + pos.astype(embeds.dtype)
    return embeds


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def _adaln_zero(p: Params, x, temb, eps, video_mask):
    """CogVideoXLayerNormZero on the JOINT [text; video] sequence.

    The reference (cogvideox_transformer_3d.py:122-161) norms the two
    streams separately with per-stream (shift, scale, gate); both are
    per-token affine with only two distinct rows, so a per-token select
    over ``video_mask`` [1, S, 1] is exact while keeping the sequence
    un-split — no [B,S,D] concat/slice materializations per block (the
    Wan two-level-timestep lesson, ROADMAP r2: the selects fuse into
    the layer_norm/gate consumers).

    Returns (norm_x in x.dtype, gate broadcastable fp32)."""
    mod = dense(silu(temb.astype(jnp.float32)), p["linear"],
                out_dtype=jnp.float32)
    shift, scale, gate, e_shift, e_scale, e_gate = jnp.split(mod, 6, axis=-1)
    m = video_mask

    def sel(v, e):                       # [B,D] pair -> fused [B,S,D]
        return e[:, None] + (v[:, None] - e[:, None]) * m

    w, b = p["norm"]["weight"], p["norm"]["bias"]
    nx = layer_norm(x, w, b, eps=eps) * (1 + sel(scale, e_scale)) \
        + sel(shift, e_shift)
    return nx.astype(x.dtype), sel(gate, e_gate)


def _joint_attention(cfg: CogVideoXConfig, p: Params, x, cos_j, sin_j,
                     attn_impl, differentiable, mesh=None):
    """CogVideoXAttnProcessor2_0: joint [text; video] SDPA with RoPE on
    video tokens only — the tables arrive identity-padded (cos=1,
    sin=0) over the text prefix, so the whole joint sequence rotates
    with identical math and no slice/concat copies."""
    B, S, D = x.shape
    nh = cfg.num_attention_heads
    hd = cfg.attention_head_dim

    def qk_head_norm(t, np_):
        if not np_:
            return t
        return layer_norm(t, np_["weight"], np_["bias"],
                          eps=cfg.qk_norm_eps).astype(t.dtype)

    # fused-producer flash path (pallas inference): per-head LayerNorm +
    # joint-sequence RoPE run inside Pallas producer passes
    # (ops/attention.fused_ln_qk_flash_attention). On dp/fsdp/tp meshes
    # the same kernels run inside a shard_map — per-head LN stats are
    # head-local, so tp needs no collective, just the plumbing.
    fused_wanted = (attn_ops.FUSED_QK_PRODUCERS and not differentiable
                    and cos_j is not None and p.get("norm_q") is not None
                    and (attn_impl == "pallas"
                         or (attn_impl is None and attn_ops._on_tpu())))
    if fused_wanted and (
            not attn_ops.needs_sharded_attention(mesh)
            or attn_ops.fused_sharded_supported(mesh, B, nh)):
        q_raw = dense(x, p["to_q"])
        k_raw = dense(x, p["to_k"])
        v_h = dense(x, p["to_v"]).reshape(B, S, nh, hd).transpose(
            0, 2, 1, 3)
        if attn_ops.needs_sharded_attention(mesh):
            o = attn_ops.fused_ln_qk_flash_attention_sharded(
                q_raw, k_raw, v_h,
                p["norm_q"]["weight"], p["norm_q"]["bias"],
                p["norm_k"]["weight"], p["norm_k"]["bias"], cos_j, sin_j,
                mesh, num_heads=nh, head_dim=hd, eps=cfg.qk_norm_eps,
                interpret=attn_ops.FORCE_INTERPRET)
        else:
            o = attn_ops.fused_ln_qk_flash_attention(
                q_raw, k_raw, v_h,
                p["norm_q"]["weight"], p["norm_q"]["bias"],
                p["norm_k"]["weight"], p["norm_k"]["bias"], cos_j, sin_j,
                num_heads=nh, head_dim=hd, eps=cfg.qk_norm_eps,
                interpret=attn_ops.FORCE_INTERPRET)
        o = o.transpose(0, 2, 1, 3).reshape(B, S, D)
        return dense(o, p["to_out"])

    q = dense(x, p["to_q"]).reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
    k = dense(x, p["to_k"]).reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
    v = dense(x, p["to_v"]).reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
    q = qk_head_norm(q, p.get("norm_q"))
    k = qk_head_norm(k, p.get("norm_k"))

    if cos_j is not None:
        q = apply_rope_interleaved(q, cos_j, sin_j)
        k = apply_rope_interleaved(k, cos_j, sin_j)

    # joint [text; video] sequence: sequence-parallel over sp when the
    # mesh is active and L+S_video divides (ops/attention.sp_supported)
    o = attn_ops.dispatch_attention(q, k, v, mesh=mesh, impl=attn_impl,
                                    differentiable=differentiable)
    o = o.transpose(0, 2, 1, 3).reshape(B, S, D)
    return dense(o, p["to_out"])


def _block_forward(cfg: CogVideoXConfig, p: Params, x, temb, cos_j, sin_j,
                   video_mask, attn_impl, differentiable, mesh=None):
    """CogVideoXBlock.forward (reference :122-161) on the joint
    sequence (see _adaln_zero for the per-token-select equivalence)."""
    nx, gate = _adaln_zero(p["norm1"], x, temb, cfg.norm_eps, video_mask)
    a = _joint_attention(cfg, p["attn1"], nx, cos_j, sin_j,
                         attn_impl, differentiable, mesh)
    x = x + (gate * a.astype(jnp.float32)).astype(x.dtype)

    nx, gate_ff = _adaln_zero(p["norm2"], x, temb, cfg.norm_eps, video_mask)
    f = dense(gelu_tanh(dense(nx, p["ff"]["fc1"])), p["ff"]["fc2"])
    x = x + (gate_ff * f.astype(jnp.float32)).astype(x.dtype)
    return x


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def cogvideox_rope(cfg: CogVideoXConfig, F: int, H: int, W: int,
                   duplicate_first_frame_for_id: bool = False):
    """RoPE tables for the latent patch grid (pipeline
    ``_prepare_rotary_positional_embeddings`` semantics)."""
    cos, sin = rope_ops.cogvideox_rope_table(
        cfg.attention_head_dim, F, H // cfg.patch_size, W // cfg.patch_size,
        base_h=cfg.sample_height // cfg.patch_size,
        base_w=cfg.sample_width // cfg.patch_size,
        duplicate_first_frame_for_id=duplicate_first_frame_for_id)
    return jnp.asarray(cos), jnp.asarray(sin)


def cogvideox_forward(cfg: CogVideoXConfig, params: Params,
                      hidden_states: jax.Array,
                      encoder_hidden_states: jax.Array,
                      timestep: jax.Array,
                      image_rotary_emb: Optional[Tuple[jax.Array, jax.Array]] = None,
                      ofs: Optional[jax.Array] = None,
                      *,
                      attn_impl: Optional[str] = None,
                      differentiable: bool = False,
                      remat: bool = False,
                      mesh=None,
                      pp_microbatches: Optional[int] = None) -> jax.Array:
    """CogVideoXTransformer3DModel.forward (reference :446-562).

    hidden_states: [B, F, C, H, W] (frame-first, like the reference).
    encoder_hidden_states: [B, L, text_dim]. timestep: [B].
    Returns [B, F, out_channels, H, W].

    With a mesh pp>1 axis the 42-block sweep runs as a GPipe pipeline
    over the stacked-layer axis (``parallel/pipeline.py``); the joint
    (video, text) stream pair is the pipelined activation.
    """
    B, F, C, H, W = hidden_states.shape

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

    t_freq = sinusoidal_timestep_embedding(
        timestep.astype(jnp.float32), cfg.inner_dim,
        downscale_freq_shift=float(cfg.freq_shift))
    emb = timestep_embedding_mlp(t_freq, params["time_embedding"])
    if cfg.ofs_embed_dim and ofs is not None:
        ofs_freq = sinusoidal_timestep_embedding(
            ofs.astype(jnp.float32), cfg.ofs_embed_dim)
        emb = emb + timestep_embedding_mlp(ofs_freq, params["ofs_embedding"])

    x = patch_embed_forward(cfg, params["patch_embed"],
                            encoder_hidden_states, hidden_states)
    L = encoder_hidden_states.shape[1]
    S = x.shape[1]

    # video-token select mask + identity-padded (cos=1, sin=0 over the
    # text prefix) joint RoPE tables, hoisted out of the block sweep
    video_mask = jnp.concatenate(
        [jnp.zeros((L,), jnp.float32),
         jnp.ones((S - L,), jnp.float32)])[None, :, None]
    if image_rotary_emb is not None:
        cos, sin = image_rotary_emb
        cos_j = jnp.concatenate(
            [jnp.ones((L, cos.shape[-1]), cos.dtype), cos], axis=0)
        sin_j = jnp.concatenate(
            [jnp.zeros((L, sin.shape[-1]), sin.dtype), sin], axis=0)
    else:
        cos_j = sin_j = None

    if ppn > 1:
        from frameino_tpu.parallel import pipeline as pp_mod

        # mesh=None inside the manual-pp region: force XLA attention
        # when the inner dp/fsdp/tp submesh is multi-device (a bare
        # pallas_call there would be replicated by GSPMD)
        inner_multi = any(mesh.shape.get(a, 1) > 1
                          for a in ("dp", "fsdp", "tp"))
        pp_attn_impl = ("xla" if inner_multi and attn_impl in (None, "pallas")
                        else attn_impl)

        def block_fn(layer_params, carry, aux, shared):
            return _block_forward(cfg, layer_params, carry, aux,
                                  shared[0], shared[1], shared[2],
                                  pp_attn_impl, differentiable, None)

        x = pp_mod.pipeline_blocks(
            mesh, params["blocks"], x, emb, (cos_j, sin_j, video_mask),
            block_fn, microbatches=pp_microbatches, remat=remat)
    else:
        def body(carry, layer_params):
            carry = _block_forward(cfg, layer_params, carry, emb, cos_j,
                                   sin_j, video_mask, attn_impl,
                                   differentiable, mesh)
            return carry, None

        if remat:
            body = jax.checkpoint(body, prevent_cse=False)
        x, _ = jax.lax.scan(body, x, params["blocks"])

    if not cfg.use_rotary_positional_embeddings:
        # CogVideoX-2B: norm over the video stream only
        h = layer_norm(x[:, L:], params["norm_final"]["weight"],
                       params["norm_final"]["bias"],
                       eps=cfg.norm_eps).astype(x.dtype)
    else:
        # CogVideoX-5B: norm over the (still-merged) joint sequence,
        # then slice the video span
        joint = layer_norm(x, params["norm_final"]["weight"],
                           params["norm_final"]["bias"],
                           eps=cfg.norm_eps).astype(x.dtype)
        h = joint[:, L:]

    # AdaLayerNorm out: chunk order (shift, scale) at dim 1
    mod = dense(silu(emb.astype(jnp.float32)), params["norm_out"]["linear"],
                out_dtype=jnp.float32)
    shift, scale = jnp.split(mod, 2, axis=-1)
    h = layer_norm(h, params["norm_out"]["norm"]["weight"],
                   params["norm_out"]["norm"]["bias"], eps=cfg.norm_eps)
    h = (h * (1 + scale[:, None]) + shift[:, None]).astype(
        hidden_states.dtype)
    h = dense(h, params["proj_out"])

    p = cfg.patch_size
    pt = cfg.patch_size_t
    if pt is None:
        # reference :548-550
        out = h.reshape(B, F, H // p, W // p, -1, p, p)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6)
        out = out.reshape(B, F, -1, H, W)
    else:
        # reference :551-555
        out = h.reshape(B, (F + pt - 1) // pt, H // p, W // p, -1, pt, p, p)
        out = out.transpose(0, 1, 5, 4, 2, 6, 3, 7)
        out = out.reshape(B, -1, out.shape[3], H, W)
    return out
