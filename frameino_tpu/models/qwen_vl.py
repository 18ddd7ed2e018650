"""Qwen2.5-VL — JAX reimplementation (vision tower + mRoPE LLM + greedy
decode).

The reference runs Qwen2.5-VL-32B-Instruct twice: as the INO_VLM judge
(``evaluation/evaluate_INO_VLM.py:36-49``) and as the step-6 captioner
(``preprocess/caption_qwen_multi.py:290``) — both through torch +
transformers. This module rebuilds the full inference graph TPU-native
so released checkpoints drop in (``qwen_vl_from_state_dict``; both the
canonical ``model.visual.*``/``model.language_model.*`` and the legacy
``visual.*``/``model.layers.*`` namings are accepted):

- **Vision tower**: 3D conv patch embed (2x14x14), 2D rotary embedding
  over the window-permuted patch order, windowed attention (112px
  windows; designated full-attention blocks attend within each
  temporal slice), RMSNorm + bias'd SwiGLU MLP, 2x2 patch merger.
  TPU mapping: the window permutation/inverse, per-window gather
  indices, and rotary tables are host-precomputed per (static) grid;
  windowed attention runs as an equal-capacity padded gather
  ([n_windows, cap, D] + validity mask) and full-attention blocks as a
  per-frame batch reshape — no [S,S] mask is ever materialized.
- **Text model**: GQA attention (q/k/v bias, o no-bias) with
  multimodal-section RoPE (mrope: the head-dim channels are split into
  t/h/w sections fed by 3D position ids), RMSNorm, SwiGLU, untied
  lm_head. Generation is greedy with a static-capacity KV cache: one
  jitted prefill + one jitted decode step, positions following the
  reference's rope-delta rule.

Parity: every component is tested against the live ``transformers``
implementation (tiny random configs) including end-to-end greedy
``generate`` token equality — see ``tests/test_qwen_vl.py``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict


@dataclasses.dataclass(frozen=True)
class QwenVLVisionConfig:
    depth: int = 32
    hidden_size: int = 1280
    num_heads: int = 16
    intermediate_size: int = 3456
    out_hidden_size: int = 5120        # 32B
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    window_size: int = 112
    fullatt_block_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    tokens_per_second: float = 2.0
    rms_eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def merge_unit(self) -> int:
        return self.spatial_merge_size ** 2

    @property
    def merger_window(self) -> int:
        return self.window_size // self.spatial_merge_size \
            // self.patch_size


@dataclasses.dataclass(frozen=True)
class QwenVLTextConfig:
    hidden_size: int = 5120            # 32B
    num_layers: int = 64
    num_heads: int = 40
    num_kv_heads: int = 8
    intermediate_size: int = 27648
    vocab_size: int = 152064
    rope_theta: float = 1_000_000.0
    mrope_section: Tuple[int, ...] = (16, 24, 24)
    rms_eps: float = 1e-6
    tie_word_embeddings: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclasses.dataclass(frozen=True)
class QwenVLConfig:
    vision: QwenVLVisionConfig = QwenVLVisionConfig()
    text: QwenVLTextConfig = QwenVLTextConfig()
    image_token_id: int = 151655
    video_token_id: int = 151656
    vision_start_token_id: int = 151652
    eos_token_id: int = 151645         # <|im_end|>


QWEN25_VL_32B = QwenVLConfig()


def tiny_qwen_vl_config() -> QwenVLConfig:
    return QwenVLConfig(
        vision=QwenVLVisionConfig(
            depth=3, hidden_size=16, num_heads=2, intermediate_size=32,
            out_hidden_size=24, window_size=56,
            fullatt_block_indexes=(1,)),
        text=QwenVLTextConfig(
            hidden_size=24, num_layers=2, num_heads=4, num_kv_heads=2,
            intermediate_size=48, vocab_size=64, rope_theta=10000.0,
            mrope_section=(1, 2, 0)),
        image_token_id=60, video_token_id=61, vision_start_token_id=62,
        eos_token_id=63)


def qwen_vl_config_from_json(path: str) -> QwenVLConfig:
    """Build the config from a checkpoint's config.json (so 3B/7B/32B/
    72B variants all load without hardcoded presets)."""
    import json
    with open(path) as f:
        c = json.load(f)
    v = c["vision_config"]
    t = c.get("text_config", c)
    vision = QwenVLVisionConfig(
        depth=v["depth"], hidden_size=v["hidden_size"],
        num_heads=v["num_heads"],
        intermediate_size=v["intermediate_size"],
        out_hidden_size=v["out_hidden_size"],
        patch_size=v.get("patch_size", 14),
        temporal_patch_size=v.get("temporal_patch_size", 2),
        spatial_merge_size=v.get("spatial_merge_size", 2),
        window_size=v.get("window_size", 112),
        fullatt_block_indexes=tuple(v["fullatt_block_indexes"]),
        tokens_per_second=v.get("tokens_per_second", 2.0))
    text = QwenVLTextConfig(
        hidden_size=t["hidden_size"],
        num_layers=t["num_hidden_layers"],
        num_heads=t["num_attention_heads"],
        num_kv_heads=t["num_key_value_heads"],
        intermediate_size=t["intermediate_size"],
        vocab_size=t["vocab_size"],
        rope_theta=t.get("rope_theta", 1e6),
        mrope_section=tuple(
            t["rope_scaling"]["mrope_section"]),
        rms_eps=t.get("rms_norm_eps", 1e-6),
        tie_word_embeddings=t.get("tie_word_embeddings", False))
    return QwenVLConfig(
        vision=vision, text=text,
        image_token_id=c.get("image_token_id", 151655),
        video_token_id=c.get("video_token_id", 151656),
        vision_start_token_id=c.get("vision_start_token_id", 151652),
        eos_token_id=(c.get("eos_token_id") or 151645))


# ---------------------------------------------------------------------------
# Shared primitives
# ---------------------------------------------------------------------------

def _rms(x, w, eps):
    v = (x.astype(jnp.float32) ** 2).mean(-1, keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(v + eps)
            ).astype(x.dtype) * w


def _rotate_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def _mm(p: Params, name: str, x: jnp.ndarray) -> jnp.ndarray:
    """x @ p[name+'_w'], dispatching to the w8a8 path when the weight
    was replaced by ``quantize_qwen_int8`` (name+'_wq'/'_ws': int8
    kernel + per-out-channel scale; dynamic per-token activation
    scales — the same scheme as the DiT serving path, models/quant.py)."""
    if name + "_wq" in p:
        xf = x.astype(jnp.float32)
        s_x = jnp.maximum(
            jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-12)
        xq = jnp.round(xf / s_x).astype(jnp.int8)
        y = jnp.matmul(xq, p[name + "_wq"],
                       preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32)
                * (s_x * p[name + "_ws"])).astype(x.dtype)
    return x @ p[name + "_w"]


def _swiglu(p, x):
    g = jax.nn.silu(_mm(p, "gate", x) + p.get("gate_b", 0.0))
    u = _mm(p, "up", x) + p.get("up_b", 0.0)
    return _mm(p, "down", g * u) + p.get("down_b", 0.0)


# ---------------------------------------------------------------------------
# Vision tower
# ---------------------------------------------------------------------------

def vision_layout(grid_thw: Tuple[int, int, int],
                  cfg: QwenVLVisionConfig) -> Dict[str, np.ndarray]:
    """Host-side static layout for one image/video grid (t, h, w in
    patch units): window permutation + inverse, padded-window gather
    indices, and the rotary table over the permuted order — the numpy
    port of ``get_window_index`` / ``rot_pos_emb``."""
    t, h, w = grid_thw
    m = cfg.spatial_merge_size
    lh, lw = h // m, w // m
    vw = cfg.merger_window
    # --- window index over merged cells (per temporal slice) ---
    index = np.arange(t * lh * lw).reshape(t, lh, lw)
    pad_h, pad_w = (-lh) % vw, (-lw) % vw
    nh, nw = (lh + pad_h) // vw, (lw + pad_w) // vw
    ip = np.pad(index, ((0, 0), (0, pad_h), (0, pad_w)),
                constant_values=-100)
    ip = ip.reshape(t, nh, vw, nw, vw).transpose(0, 1, 3, 2, 4)
    ip = ip.reshape(t * nh * nw, vw * vw)
    win_lens = (ip != -100).sum(-1)                 # cells per window
    window_index = ip.reshape(-1)
    window_index = window_index[window_index != -100]
    # --- rotary position ids over the ORIGINAL cell x merge order ---
    hpos = np.broadcast_to(np.arange(h)[:, None], (h, w))
    hpos = hpos.reshape(lh, m, lw, m).transpose(0, 2, 1, 3).reshape(-1)
    wpos = np.broadcast_to(np.arange(w)[None, :], (h, w))
    wpos = wpos.reshape(lh, m, lw, m).transpose(0, 2, 1, 3).reshape(-1)
    pos = np.stack([hpos, wpos], -1)                # [h*w, 2]
    pos = np.tile(pos, (t, 1))                      # [S, 2]
    hd = cfg.head_dim
    inv = 1.0 / (10000.0 ** (np.arange(0, hd // 2, 2,
                                       dtype=np.float32) / (hd // 2)))
    freqs = (pos[:, :, None] * inv[None, None]).reshape(len(pos), -1)
    # [S, hd/2]: h-angles then w-angles (flatten over (2, hd/4))
    # --- permute tokens (cells x merge_unit) by window order ---
    mu = cfg.merge_unit
    S = t * h * w
    tok_perm = (window_index[:, None] * mu
                + np.arange(mu)[None]).reshape(-1)  # [S]
    freqs = freqs[tok_perm]
    emb = np.concatenate([freqs, freqs], axis=-1)
    # --- padded-window token gather (capacity = vw*vw cells) ---
    cap = vw * vw * mu
    starts = np.concatenate([[0], np.cumsum(win_lens)[:-1]]) * mu
    gather = np.full((len(win_lens), cap), S, np.int64)
    for i, (s, n) in enumerate(zip(starts, win_lens * mu)):
        gather[i, :n] = np.arange(s, s + n)
    valid = gather < S
    inv_perm = np.argsort(tok_perm)
    return {"tok_perm": tok_perm, "inv_tok_perm": inv_perm,
            "cell_perm": window_index,
            "cos": np.cos(emb).astype(np.float32),
            "sin": np.sin(emb).astype(np.float32),
            "win_gather": gather, "win_valid": valid,
            "grid": np.asarray(grid_thw)}


def _vision_attn(p, x, cos, sin, heads):
    """x [..., L, C] (batch dims fold); joint qkv; rotate-half RoPE."""
    *lead, L, C = x.shape
    qkv = x @ p["qkv_w"] + p["qkv_b"]
    qkv = qkv.reshape(*lead, L, 3, heads, -1)
    q, k, v = [jnp.moveaxis(qkv[..., i, :, :], -2, -3)
               for i in range(3)]                   # [..., h, L, d]
    c, s = cos[..., None, :, :], sin[..., None, :, :]
    q = q * c + _rotate_half(q) * s
    k = k * c + _rotate_half(k) * s
    scale = q.shape[-1] ** -0.5
    att = (q * scale) @ jnp.swapaxes(k, -1, -2)
    if "bias" in p:
        att = att + p["bias"]
    att = jax.nn.softmax(att, axis=-1)
    o = jnp.moveaxis(att @ v, -3, -2).reshape(*lead, L, C)
    return o @ p["proj_w"] + p["proj_b"]


def qwen_vision_forward(params: Params, pixels: jnp.ndarray,
                        layout: Dict[str, np.ndarray],
                        cfg: QwenVLVisionConfig) -> jnp.ndarray:
    """pixels [S, 3*tp*p*p] (the processor's flattened patches, original
    order) -> merged embeddings [S/merge_unit, out_hidden] in the
    ORIGINAL cell order."""
    p = params["visual"]
    x = pixels @ p["patch_w"]                       # conv == dense
    S = x.shape[0]
    x = x[jnp.asarray(layout["tok_perm"])]
    cos = jnp.asarray(layout["cos"])
    sin = jnp.asarray(layout["sin"])
    t = int(layout["grid"][0])
    gather = jnp.asarray(layout["win_gather"])
    valid = jnp.asarray(layout["win_valid"])
    win_bias = jnp.where(valid, 0.0, -1e30)[:, None, None, :]
    for i, bp in enumerate(p["blocks"]):
        h = _rms(x, bp["n1w"], cfg.rms_eps)
        if i in cfg.fullatt_block_indexes:
            # full attention within each temporal slice (equal sizes)
            hs = h.reshape(t, S // t, -1)
            att = _vision_attn(
                {**bp["attn"]}, hs, cos.reshape(t, S // t, -1),
                sin.reshape(t, S // t, -1), cfg.num_heads)
            x = x + att.reshape(S, -1)
        else:
            hp = jnp.concatenate(
                [h, jnp.zeros((1, h.shape[-1]), h.dtype)], 0)
            hw = hp[gather]                         # [nW, cap, C]
            cosw = jnp.concatenate(
                [cos, jnp.zeros((1, cos.shape[-1]))], 0)[gather]
            sinw = jnp.concatenate(
                [sin, jnp.zeros((1, sin.shape[-1]))], 0)[gather]
            att = _vision_attn({**bp["attn"], "bias": win_bias}, hw,
                               cosw, sinw, cfg.num_heads)
            flat = att.reshape(-1, att.shape[-1])
            x = x + flat[jnp.asarray(
                np.nonzero(layout["win_valid"].reshape(-1))[0])]
        h2 = _rms(x, bp["n2w"], cfg.rms_eps)
        x = x + _swiglu(bp["mlp"], h2)
    # merger: RMSNorm then group merge_unit tokens -> MLP
    mu = cfg.merge_unit
    h = _rms(x, p["merger_lnq_w"], cfg.rms_eps).reshape(S // mu, -1)
    h = jax.nn.gelu(h @ p["merger_w1"] + p["merger_b1"],
                    approximate=False)
    out = h @ p["merger_w2"] + p["merger_b2"]
    return out[jnp.asarray(np.argsort(layout["cell_perm"]))]


# ---------------------------------------------------------------------------
# Text model (mRoPE GQA decoder) with static KV cache
# ---------------------------------------------------------------------------

def mrope_tables(pos_ids: np.ndarray, cfg: QwenVLTextConfig
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """pos_ids [3, S] -> merged (cos, sin) [S, head_dim] per the
    mrope_section channel split (t/h/w interleaved half-dim blocks)."""
    hd = cfg.head_dim
    inv = 1.0 / (cfg.rope_theta
                 ** (np.arange(0, hd, 2, dtype=np.float32) / hd))
    freqs = pos_ids[:, :, None].astype(np.float32) * inv  # [3,S,hd/2]
    emb = np.concatenate([freqs, freqs], axis=-1)         # [3,S,hd]
    sections = list(cfg.mrope_section) * 2
    axis = np.concatenate([np.full(n, i % 3, np.int64)
                           for i, n in enumerate(sections)])
    cos = np.take_along_axis(np.cos(emb), axis[None, None, :],
                             axis=0)[0]
    sin = np.take_along_axis(np.sin(emb), axis[None, None, :],
                             axis=0)[0]
    return cos.astype(np.float32), sin.astype(np.float32)


def _text_layer(lp, x, cos, sin, cache_k, cache_v, idx, mask,
                cfg: QwenVLTextConfig):
    """x [B,L,C]; cos/sin [L,hd]; cache [B,kvh,T,hd]; writes new k/v at
    positions idx..idx+L; mask [L,T] additive."""
    B, L, C = x.shape
    nh, kvh, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    h = _rms(x, lp["ln1"], cfg.rms_eps)
    q = (_mm(lp, "q", h) + lp["q_b"]).reshape(B, L, nh, hd)
    k = (_mm(lp, "k", h) + lp["k_b"]).reshape(B, L, kvh, hd)
    v = (_mm(lp, "v", h) + lp["v_b"]).reshape(B, L, kvh, hd)
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    q = q * cos + _rotate_half(q) * sin
    k = k * cos + _rotate_half(k) * sin
    cache_k = jax.lax.dynamic_update_slice(cache_k, k, (0, 0, idx, 0))
    cache_v = jax.lax.dynamic_update_slice(cache_v, v, (0, 0, idx, 0))
    rep = nh // kvh
    kk = jnp.repeat(cache_k, rep, axis=1)
    vv = jnp.repeat(cache_v, rep, axis=1)
    scale = hd ** -0.5

    def _att(args):
        qc, mc = args                    # [B,nh,Lc,hd], [Lc,T]
        a = (qc * scale) @ kk.transpose(0, 1, 3, 2) + mc[None, None]
        a = jax.nn.softmax(a.astype(jnp.float32), axis=-1
                           ).astype(qc.dtype)
        return a @ vv

    chunk = 512
    if L > chunk:
        # prefill: bound the [L, T] score tensor to one chunk at a
        # time (a 32B judge prefill is ~5k tokens x 40 heads — the
        # unchunked scores would transiently cost gigabytes per layer)
        n = -(-L // chunk)
        pad = n * chunk - L
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        mp = jnp.pad(mask, ((0, pad), (0, 0)),
                     constant_values=0.0)   # pad rows attend somewhere
        qs = qp.reshape(B, nh, n, chunk, hd).transpose(2, 0, 1, 3, 4)
        ms = mp.reshape(n, chunk, -1)
        o = jax.lax.map(_att, (qs, ms))
        o = o.transpose(1, 2, 0, 3, 4).reshape(B, nh, n * chunk,
                                               hd)[:, :, :L]
    else:
        o = _att((q, mask))
    o = o.transpose(0, 2, 1, 3).reshape(B, L, C)
    x = x + _mm(lp, "o", o)
    h2 = _rms(x, lp["ln2"], cfg.rms_eps)
    return x + _swiglu(lp["mlp"], h2), cache_k, cache_v


def text_forward(params: Params, embeds: jnp.ndarray, cos, sin,
                 caches, idx, mask, cfg: QwenVLTextConfig):
    """Returns (logits [B,L,V], new caches)."""
    x = embeds
    new_caches = []
    for li, lp in enumerate(params["layers"]):
        ck, cv = caches[li]
        x, ck, cv = _text_layer(lp, x, cos, sin, ck, cv, idx, mask, cfg)
        new_caches.append((ck, cv))
    x = _rms(x, params["norm_w"], cfg.rms_eps)
    return x @ params["lm_head"], new_caches


class QwenVLGenerator:
    """Greedy decoding with a static-capacity KV cache: one jitted
    prefill program + one jitted decode-step program per (prefill_len,
    capacity) pair."""

    def __init__(self, params: Params, cfg: QwenVLConfig,
                 max_new_tokens: int = 8):
        self.params = params
        self.cfg = cfg
        self.max_new = max_new_tokens
        self._prefill = jax.jit(
            functools.partial(self._prefill_impl, cfg.text),
            static_argnames=("capacity",))
        self._step = jax.jit(functools.partial(self._step_impl,
                                               cfg.text))

    @staticmethod
    def _prefill_impl(tcfg, params, embeds, cos, sin, capacity):
        B, S, _ = embeds.shape
        kvh, hd = tcfg.num_kv_heads, tcfg.head_dim
        caches = [(jnp.zeros((B, kvh, capacity, hd), embeds.dtype),
                   jnp.zeros((B, kvh, capacity, hd), embeds.dtype))
                  for _ in range(tcfg.num_layers)]
        pos = jnp.arange(capacity)
        mask = jnp.where(
            (pos[None, :] <= jnp.arange(S)[:, None])
            & (pos[None, :] < capacity), 0.0, -1e30)
        mask = jnp.where(pos[None, :] < S, mask, -1e30)
        logits, caches = text_forward(params, embeds, cos, sin, caches,
                                      0, mask, tcfg)
        return logits[:, -1], caches

    @staticmethod
    def _step_impl(tcfg, params, tok_embed, cos, sin, caches, idx):
        capacity = caches[0][0].shape[2]
        mask = jnp.where(jnp.arange(capacity)[None, :] <= idx,
                         0.0, -1e30)
        logits, caches = text_forward(params, tok_embed, cos, sin,
                                      caches, idx, mask, tcfg)
        return logits[:, -1], caches

    def generate(self, input_ids: np.ndarray,
                 vision_embeds: Optional[jnp.ndarray],
                 pos_ids: np.ndarray) -> List[int]:
        """input_ids [S] with vision placeholder tokens already
        expanded; vision_embeds [n_vis, C] spliced at the placeholder
        positions; pos_ids [3, S] from ``get_rope_index``."""
        cfg = self.cfg
        ids = np.asarray(input_ids, np.int64)
        S = len(ids)
        embed_tab = self.params["embed_tokens"]
        embeds = jnp.take(embed_tab, jnp.asarray(ids), axis=0)
        if vision_embeds is not None:
            is_vis = np.isin(ids, [cfg.image_token_id,
                                   cfg.video_token_id])
            (vis_idx,) = np.nonzero(is_vis)
            assert len(vis_idx) == vision_embeds.shape[0], \
                (len(vis_idx), vision_embeds.shape)
            embeds = embeds.at[jnp.asarray(vis_idx)].set(
                vision_embeds.astype(embeds.dtype))
        capacity = S + self.max_new
        cos, sin = mrope_tables(pos_ids, cfg.text)
        logits, caches = self._prefill(
            self.params, embeds[None], jnp.asarray(cos),
            jnp.asarray(sin), capacity=capacity)
        delta = int(pos_ids.max()) + 1 - S      # rope_deltas rule
        out = []
        for step in range(self.max_new):
            tok = int(np.asarray(jnp.argmax(logits[0])))
            out.append(tok)
            if tok == cfg.eos_token_id:
                break
            idx = S + step
            pos = np.full((3, 1), idx + delta, np.int64)
            c1, s1 = mrope_tables(pos, cfg.text)
            emb = jnp.take(embed_tab, jnp.asarray([tok]), axis=0)[None]
            logits, caches = self._step(self.params, emb,
                                        jnp.asarray(c1),
                                        jnp.asarray(s1), caches,
                                        jnp.asarray(idx))
        return out


# ---------------------------------------------------------------------------
# 3D rope index (numpy port of Qwen2_5_VLModel.get_rope_index, B=1)
# ---------------------------------------------------------------------------

def get_rope_index(input_ids: np.ndarray,
                   grid_thw: Optional[Tuple[int, int, int]],
                   cfg: QwenVLConfig, is_video: bool = True,
                   second_per_grid_t: float = 1.0) -> np.ndarray:
    """pos ids [3, S] for one sequence with at most one image/video."""
    ids = list(np.asarray(input_ids, np.int64))
    S = len(ids)
    if grid_thw is None:
        return np.broadcast_to(np.arange(S), (3, S)).copy()
    tok = cfg.video_token_id if is_video else cfg.image_token_id
    ed = ids.index(tok)
    t, h, w = grid_thw
    m = cfg.vision.spatial_merge_size
    lt, lh, lw = t, h // m, w // m
    parts = [np.broadcast_to(np.arange(ed), (3, ed))]
    tps = 0.0 if not is_video else \
        second_per_grid_t * cfg.vision.tokens_per_second
    t_idx = (np.arange(lt)[:, None] * tps).astype(np.int64)
    t_idx = np.broadcast_to(t_idx, (lt, lh * lw)).reshape(-1)
    h_idx = np.broadcast_to(np.arange(lh)[None, :, None],
                            (lt, lh, lw)).reshape(-1)
    w_idx = np.broadcast_to(np.arange(lw)[None, None, :],
                            (lt, lh, lw)).reshape(-1)
    parts.append(np.stack([t_idx, h_idx, w_idx]) + ed)
    st = ed + lt * lh * lw
    if st < S:
        st_idx = parts[-1].max() + 1
        parts.append(np.broadcast_to(np.arange(S - st), (3, S - st))
                     + st_idx)
    return np.concatenate(parts, axis=1)


# ---------------------------------------------------------------------------
# int8 w8a8 serving (v5e MXU 2x; 7B fits one chip, 32B fits tp=4)
# ---------------------------------------------------------------------------

def quantize_qwen_int8(params: Params) -> Params:
    """Replace the LLM's matmul weights with int8 kernels +
    per-out-channel scales (same scheme as the certified DiT serving
    path, ``models/quant.py``; ``_mm`` dispatches). Quantized: q/k/v/o
    and gate/up/down per layer. Kept high precision: embeddings,
    lm_head (logit-sensitive), norms, the vision tower. Halves LLM
    param bytes vs bf16 and runs the MXU at 2x."""
    from frameino_tpu.models.quant import _quantize_device
    out = dict(params)
    layers = []
    for lp in params["layers"]:
        nl = dict(lp)
        for name in ("q", "k", "v", "o"):
            q, s = _quantize_device(nl.pop(name + "_w"))
            nl[name + "_wq"], nl[name + "_ws"] = q, s
        mlp = dict(lp["mlp"])
        for name in ("gate", "up", "down"):
            q, s = _quantize_device(mlp.pop(name + "_w"))
            mlp[name + "_wq"], mlp[name + "_ws"] = q, s
        nl["mlp"] = mlp
        layers.append(nl)
    out["layers"] = layers
    return out


# ---------------------------------------------------------------------------
# Tensor-parallel sharding (32B on a v5e-8: 64 GB bf16 params / 8 chips)
# ---------------------------------------------------------------------------

def shard_qwen_params(params: Params, mesh, cfg: QwenVLConfig,
                      axis: str = "tp") -> Params:
    """Place the LLM under Megatron-style tensor parallelism on
    ``mesh[axis]``: q/k/v and gate/up column-parallel, o/down
    row-parallel, embed row(vocab)-parallel, lm_head column-parallel;
    norms replicated. The vision tower is replicated (~1.3 GB bf16 at
    32B). GSPMD propagates activation shardings and inserts the
    all-reduces; the KV cache inherits the kv-head sharding from the
    projections. ``axis`` size must divide num_kv_heads."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    t = cfg.text
    assert t.num_kv_heads % mesh.shape[axis] == 0, \
        (t.num_kv_heads, mesh.shape)

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    rep = functools.partial(put, spec=P())
    col = functools.partial(put, spec=P(None, axis))
    row = functools.partial(put, spec=P(axis, None))
    vec = functools.partial(put, spec=P(axis))

    def put_w(dst, src, name, parallel):
        """Shard name_w — or its int8 (name_wq, name_ws) pair: the
        per-out-channel scale follows the out axis (sharded for
        column-parallel, replicated for row-parallel)."""
        if name + "_wq" in src:
            dst[name + "_wq"] = parallel(src[name + "_wq"])
            dst[name + "_ws"] = (vec if parallel is col else rep)(
                src[name + "_ws"])
        else:
            dst[name + "_w"] = parallel(src[name + "_w"])

    out = {"visual": jax.tree.map(rep, params["visual"]),
           "embed_tokens": row(params["embed_tokens"]),
           "norm_w": rep(params["norm_w"]),
           "lm_head": col(params["lm_head"]),
           "layers": []}
    for lp in params["layers"]:
        nl = {"ln1": rep(lp["ln1"]), "ln2": rep(lp["ln2"]),
              "q_b": vec(lp["q_b"]), "k_b": vec(lp["k_b"]),
              "v_b": vec(lp["v_b"])}
        for name in ("q", "k", "v"):
            put_w(nl, lp, name, col)
        put_w(nl, lp, "o", row)
        mlp = {}
        for name in ("gate", "up"):
            put_w(mlp, lp["mlp"], name, col)
        put_w(mlp, lp["mlp"], "down", row)
        nl["mlp"] = mlp
        out["layers"].append(nl)
    return out


# ---------------------------------------------------------------------------
# Released-checkpoint adapter (judge / captioner backends)
# ---------------------------------------------------------------------------

def load_qwen_vl_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    """Load all safetensors shards (or a pytorch_model.bin) from a
    checkpoint directory into numpy."""
    import glob
    import os
    sd = {}
    shards = sorted(glob.glob(os.path.join(model_dir,
                                           "*.safetensors")))
    if shards:
        from safetensors import safe_open
        for shard in shards:
            with safe_open(shard, framework="np") as f:
                for k in f.keys():
                    sd[k] = f.get_tensor(k)
        return sd
    import torch
    for binf in sorted(glob.glob(os.path.join(model_dir,
                                              "pytorch_model*.bin"))):
        part = torch.load(binf, map_location="cpu", weights_only=True)
        sd.update({k: v.numpy() for k, v in part.items()})
    if not sd:
        raise FileNotFoundError(
            f"no safetensors/bin weights under {model_dir}")
    return sd


def load_qwen_vl_jax(model_dir: str, max_new_tokens: int = 8,
                     dtype=jnp.bfloat16, mesh=None,
                     quantize: Optional[str] = None):
    """TPU-native Qwen2.5-VL runner from a released checkpoint dir:
    returns ``run(frames [T,H,W,3] uint8, instruction str) -> str``.
    Tokenization/video preprocessing use the checkpoint's local
    processor (host-side); all compute is this module's JAX graph.
    Pass a ``jax.sharding.Mesh`` with a 'tp' axis to tensor-parallel
    the LLM (required for 32B: 64 GB bf16 params > one 16 GB chip)."""
    import os
    from transformers import AutoProcessor
    cfg = qwen_vl_config_from_json(os.path.join(model_dir,
                                                "config.json"))
    params = qwen_vl_from_state_dict(load_qwen_vl_state_dict(model_dir),
                                     cfg)
    if dtype is not None:
        params = jax.tree.map(
            lambda x: x.astype(dtype)
            if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32
            else x, params)
    if quantize == "int8":
        params = quantize_qwen_int8(params)
    elif quantize:
        raise ValueError(f"unknown quantize mode {quantize!r}")
    if mesh is not None:
        params = shard_qwen_params(params, mesh, cfg)
    processor = AutoProcessor.from_pretrained(model_dir)
    generator = QwenVLGenerator(params, cfg, max_new_tokens)

    def run(frames: np.ndarray, instruction: str,
            max_pixels: int = 360 * 420, fps: float = 1.0) -> str:
        import torch as _t
        messages = [{"role": "user", "content": [
            {"type": "video", "video": [fr for fr in frames],
             "max_pixels": max_pixels, "fps": fps},
            {"type": "text", "text": instruction}]}]
        text = processor.apply_chat_template(
            messages, tokenize=False, add_generation_prompt=True)
        frames_t = _t.tensor(np.stack(frames)).permute(0, 3, 1, 2)
        inputs = processor(text=[text], videos=[frames_t],
                           return_tensors="np")
        ids = np.asarray(inputs["input_ids"][0], np.int64)
        pixels = jnp.asarray(np.asarray(inputs["pixel_values_videos"],
                                        np.float32))
        grid = tuple(int(g) for g in inputs["video_grid_thw"][0])
        spg = float(np.asarray(
            inputs.get("second_per_grid_ts", [1.0])).reshape(-1)[0])
        layout = vision_layout(grid, cfg.vision)
        vis = qwen_vision_forward(params, pixels, layout, cfg.vision)
        pos = get_rope_index(ids, grid, cfg, is_video=True,
                             second_per_grid_t=spg)
        out_ids = generator.generate(ids, vis, pos)
        return processor.batch_decode([out_ids],
                                      skip_special_tokens=True)[0]

    return run


# ---------------------------------------------------------------------------
# Checkpoint mapping
# ---------------------------------------------------------------------------

def _canon(name: str) -> str:
    """Normalize legacy checkpoint names to the canonical transformers
    layout (the inverse of _checkpoint_conversion_mapping)."""
    if name.startswith("visual."):
        return "model." + name
    if name == "lm_head.weight" or name.startswith("model.visual.") \
            or name.startswith("model.language_model."):
        return name
    if name.startswith("model."):
        return "model.language_model." + name[len("model."):]
    return name


def qwen_vl_from_state_dict(sd: Dict[str, np.ndarray],
                            cfg: QwenVLConfig) -> Params:
    """Map a released Qwen2.5-VL checkpoint 1:1 (every key consumed)."""
    sd = {_canon(k): np.asarray(v) for k, v in sd.items()}

    def take(name):
        return sd.pop(name).astype(np.float32)

    def lin_t(name):
        return jnp.asarray(take(name + ".weight").T.copy())

    v = cfg.vision
    pw = take("model.visual.patch_embed.proj.weight")  # [E,3,tp,p,p]
    visual = {
        "patch_w": jnp.asarray(pw.reshape(pw.shape[0], -1).T.copy()),
        "blocks": [],
        "merger_lnq_w": jnp.asarray(
            take("model.visual.merger.ln_q.weight")),
        "merger_w1": lin_t("model.visual.merger.mlp.0"),
        "merger_b1": jnp.asarray(
            take("model.visual.merger.mlp.0.bias")),
        "merger_w2": lin_t("model.visual.merger.mlp.2"),
        "merger_b2": jnp.asarray(
            take("model.visual.merger.mlp.2.bias")),
    }
    for i in range(v.depth):
        b = f"model.visual.blocks.{i}."
        visual["blocks"].append({
            "n1w": jnp.asarray(take(b + "norm1.weight")),
            "n2w": jnp.asarray(take(b + "norm2.weight")),
            "attn": {"qkv_w": lin_t(b + "attn.qkv"),
                     "qkv_b": jnp.asarray(take(b + "attn.qkv.bias")),
                     "proj_w": lin_t(b + "attn.proj"),
                     "proj_b": jnp.asarray(
                         take(b + "attn.proj.bias"))},
            "mlp": {"gate_w": lin_t(b + "mlp.gate_proj"),
                    "gate_b": jnp.asarray(
                        take(b + "mlp.gate_proj.bias")),
                    "up_w": lin_t(b + "mlp.up_proj"),
                    "up_b": jnp.asarray(take(b + "mlp.up_proj.bias")),
                    "down_w": lin_t(b + "mlp.down_proj"),
                    "down_b": jnp.asarray(
                        take(b + "mlp.down_proj.bias"))},
        })

    t = cfg.text
    lm = "model.language_model."
    layers = []
    for i in range(t.num_layers):
        b = f"{lm}layers.{i}."
        layers.append({
            "ln1": jnp.asarray(take(b + "input_layernorm.weight")),
            "ln2": jnp.asarray(
                take(b + "post_attention_layernorm.weight")),
            "q_w": lin_t(b + "self_attn.q_proj"),
            "q_b": jnp.asarray(take(b + "self_attn.q_proj.bias")),
            "k_w": lin_t(b + "self_attn.k_proj"),
            "k_b": jnp.asarray(take(b + "self_attn.k_proj.bias")),
            "v_w": lin_t(b + "self_attn.v_proj"),
            "v_b": jnp.asarray(take(b + "self_attn.v_proj.bias")),
            "o_w": lin_t(b + "self_attn.o_proj"),
            "mlp": {"gate_w": lin_t(b + "mlp.gate_proj"),
                    "up_w": lin_t(b + "mlp.up_proj"),
                    "down_w": lin_t(b + "mlp.down_proj")},
        })
    embed = jnp.asarray(take(lm + "embed_tokens.weight"))
    if cfg.text.tie_word_embeddings or "lm_head.weight" not in sd:
        lm_head = embed.T
    else:
        lm_head = lin_t("lm_head")
    params = {"visual": visual, "layers": layers,
              "embed_tokens": embed,
              "norm_w": jnp.asarray(take(lm + "norm.weight")),
              "lm_head": lm_head}
    # rotary inv_freq buffers may or may not be serialized
    sd = {k: v for k, v in sd.items() if not k.endswith("inv_freq")}
    assert not sd, f"unconsumed checkpoint keys: {sorted(sd)[:8]}"
    return params
