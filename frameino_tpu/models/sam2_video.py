"""SAM2.1 video propagation — JAX memory machinery + predictor.

Companion to ``sam2.py`` (image-level graph + checkpoint mapping).
Implements the video half of the released SAM2.1 behavior the reference
depends on (``evaluation/evaluate_INO_VSeg_MAE.py:160-196``: point
prompts on frame 0, ``propagate_in_video`` over the clip;
``preprocess/track_FrameINO.py:215-398`` uses the same API):

- **RoPE memory attention** (4 layers): the current frame's stride-16
  tokens self-attend (axial 2D RoPE) and cross-attend to the memory
  bank — up to ``num_maskmem`` spatial memories (64-d, RoPE tiled per
  frame block) plus up to 16 object pointers (256-d each split into
  four 64-d tokens, sine time-position encoded, excluded from RoPE).
- **Memory encoder**: 16x mask downsampling pyramid fused with the
  projected pixel features through two ConvNeXt blocks, projected to
  64-d, with the 2.1 ``no_obj_embed_spatial`` blend on object-absent
  frames.
- **SAM heads driver** (``_forward_sam_heads``): prompt encode ->
  memory-conditioned features -> mask decoder; NO_OBJ_SCORE masking,
  best-IoU multimask selection, object-pointer projection with the
  fixed no-object pointer blend.
- **Predictor state machine**: conditioning frame from point clicks
  (binarized-mask memory), forward propagation with the reference's
  memory-selection rule (immediately previous frame + stride-1 older
  frames + the conditioning frame, past-only object pointers).

TPU notes: the memory bank is **fixed-capacity** (7 spatial slots + 64
pointer-token slots) with additive key masking, so exactly two programs
compile (conditioning step, propagation step) regardless of how many
memories exist — the torch implementation re-traces per memory count.
All resizes reproduce torch's ``F.interpolate(bilinear,
align_corners=False, antialias=False)`` taps exactly.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from frameino_tpu.models.sam2 import (Params, Sam2Config, _attn, _conv2d,
                                      _gelu, _linear, _ln, _ln2d,
                                      image_encoder_forward,
                                      mask_decoder_forward,
                                      prompt_dense_pe,
                                      prompt_encoder_points,
                                      sine_pos_embed)

NO_OBJ_SCORE = -1024.0


# ---------------------------------------------------------------------------
# torch-exact bilinear resize (align_corners=False, antialias=False)
# ---------------------------------------------------------------------------

def _bilinear_matrix(n_out: int, n_in: int) -> np.ndarray:
    """[n_out, n_in] row-interpolation matrix with half-pixel centers
    and border-clamped taps (torch upsample/downsample without AA)."""
    src = (np.arange(n_out, dtype=np.float64) + 0.5) * (n_in / n_out) - 0.5
    i0 = np.floor(src).astype(np.int64)
    t = src - i0
    m = np.zeros((n_out, n_in), np.float64)
    lo = np.clip(i0, 0, n_in - 1)
    hi = np.clip(i0 + 1, 0, n_in - 1)
    m[np.arange(n_out), lo] += 1.0 - t
    m[np.arange(n_out), hi] += t
    return m.astype(np.float32)


def bilinear_resize_torch(x: jnp.ndarray,
                          out_hw: Tuple[int, int]) -> jnp.ndarray:
    """x [..., H, W] -> [..., out_h, out_w], torch bilinear semantics."""
    h_in, w_in = x.shape[-2:]
    ry = jnp.asarray(_bilinear_matrix(out_hw[0], h_in))
    cx = jnp.asarray(_bilinear_matrix(out_hw[1], w_in))
    return jnp.einsum("oh,...hw,pw->...op", ry, x, cx)


# ---------------------------------------------------------------------------
# Axial 2D RoPE (sam2 compute_axial_cis / apply_rotary_enc)
# ---------------------------------------------------------------------------

def axial_rope_tables(dim: int, end_x: int, end_y: int,
                      theta: float) -> Tuple[np.ndarray, np.ndarray]:
    """(cos, sin) [L, dim//2]: first dim//4 pairs rotate by the x
    coordinate's angles, the next dim//4 by y (t_x = t % end_x)."""
    n4 = dim // 4
    freqs = 1.0 / (theta ** (np.arange(0, dim, 4,
                                       dtype=np.float32)[:n4] / dim))
    t = np.arange(end_x * end_y, dtype=np.float32)
    fx = np.outer(t % end_x, freqs)
    fy = np.outer(np.floor(t / end_x), freqs)
    ang = np.concatenate([fx, fy], axis=-1)
    return np.cos(ang), np.sin(ang)


def _apply_rope(x: jnp.ndarray, cos: jnp.ndarray,
                sin: jnp.ndarray) -> jnp.ndarray:
    """x [..., L, D] with consecutive (even, odd) complex pairs."""
    e, o = x[..., 0::2], x[..., 1::2]
    re = e * cos - o * sin
    im = e * sin + o * cos
    return jnp.stack([re, im], axis=-1).reshape(x.shape)


def _rope_attn(p, q_in, k_in, v_in, heads, q_cs, k_cs,
               k_bias=None):
    """RoPEAttention: separate projections, RoPE on q and on the first
    rope-eligible k tokens (k_cs covers them; remaining tokens pass
    through), optional additive key bias [B, Lk] for slot masking."""
    B, Lq = q_in.shape[:2]
    Lk = k_in.shape[1]
    q = _linear(p["q"], q_in).reshape(B, Lq, heads, -1).transpose(0, 2, 1, 3)
    k = _linear(p["k"], k_in).reshape(B, Lk, heads, -1).transpose(0, 2, 1, 3)
    v = _linear(p["v"], v_in).reshape(B, Lk, heads, -1).transpose(0, 2, 1, 3)
    q = _apply_rope(q, *q_cs)
    n_rope = k_cs[0].shape[0]
    k = jnp.concatenate(
        [_apply_rope(k[:, :, :n_rope], *k_cs), k[:, :, n_rope:]], axis=2)
    scale = q.shape[-1] ** -0.5
    att = (q * scale) @ k.transpose(0, 1, 3, 2)
    if k_bias is not None:
        att = att + k_bias[:, None, None, :]
    att = jax.nn.softmax(att, axis=-1)
    o = (att @ v).transpose(0, 2, 1, 3).reshape(B, Lq, -1)
    return _linear(p["out"], o)


def memory_attention_forward(params: Params, curr: jnp.ndarray,
                             curr_pos: jnp.ndarray, memory: jnp.ndarray,
                             memory_pos: jnp.ndarray,
                             mem_bias: jnp.ndarray,
                             rope_q: Tuple[jnp.ndarray, jnp.ndarray],
                             rope_k: Tuple[jnp.ndarray, jnp.ndarray],
                             cfg: Sam2Config) -> jnp.ndarray:
    """curr [B, HW, C]; memory [B, S_mem, mem_dim] (spatial slots first,
    then pointer tokens — rope_k covers exactly the spatial slots);
    mem_bias [B, S_mem] additive (0 valid / -1e30 padded)."""
    p = params["memory_attention"]
    out = curr + 0.1 * curr_pos
    heads = 1   # sam2.1 memory attention is single-head
    for lp in p["layers"]:
        t2 = _ln(out, lp["n1w"], lp["n1b"], 1e-5)
        out = out + _rope_attn(lp["self_attn"], t2, t2, t2, heads,
                               rope_q, rope_q)
        t2 = _ln(out, lp["n2w"], lp["n2b"], 1e-5)
        out = out + _rope_attn(lp["cross_attn"], t2,
                               memory + memory_pos, memory, heads,
                               rope_q, rope_k, k_bias=mem_bias)
        t2 = _ln(out, lp["n3w"], lp["n3b"], 1e-5)
        out = out + _linear(lp["lin2"],
                            jax.nn.relu(_linear(lp["lin1"], t2)))
    return _ln(out, p["nw"], p["nb"], 1e-5)


# ---------------------------------------------------------------------------
# Memory encoder
# ---------------------------------------------------------------------------

def _dwconv7(p, x):
    """Depthwise 7x7 conv, padding 3. p['w'] [7,7,1,C]."""
    c = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1, 1), "SAME",
        feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"].astype(x.dtype)


def memory_encoder_forward(params: Params, pix_feat: jnp.ndarray,
                           mask_for_mem: jnp.ndarray,
                           cfg: Sam2Config) -> jnp.ndarray:
    """pix_feat [B,h,w,C] (stride-16, pre-memory); mask_for_mem
    [B, image, image, 1] already sigmoid/binarized + scale/bias ->
    memory features [B,h,w,mem_dim]."""
    p = params["memory_encoder"]
    x = mask_for_mem
    for conv, (nw, nb) in zip(p["mask_down"][:-1], p["mask_down_ln"]):
        x = _conv2d(conv, x, stride=2, padding=((1, 1), (1, 1)))
        x = _gelu(_ln2d(x, nw, nb))
    x = _conv2d(p["mask_down"][-1], x, padding="VALID")
    x = _conv2d(p["pix_proj"], pix_feat, padding="VALID") + x
    for f in p["fuser"]:
        h = _dwconv7(f["dwconv"], x)
        h = _ln2d(h, f["nw"], f["nb"])
        h = _linear(f["pw2"], _gelu(_linear(f["pw1"], h))) * f["gamma"]
        x = x + h
    return _conv2d(p["out_proj"], x, padding="VALID")


def get_1d_sine_pe(pos: np.ndarray, dim: int,
                   temperature: float = 10000.0) -> np.ndarray:
    """sam2_utils.get_1d_sine_pe: [N] -> [N, dim]."""
    half = dim // 2
    dim_t = np.arange(half, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / half)
    pe = np.asarray(pos, np.float32)[..., None] / dim_t
    return np.concatenate([np.sin(pe), np.cos(pe)], axis=-1)


# ---------------------------------------------------------------------------
# SAM heads driver (SAM2Base._forward_sam_heads)
# ---------------------------------------------------------------------------

def forward_sam_heads(params: Params, pix_feat_with_mem: jnp.ndarray,
                      high_res_feats, points: jnp.ndarray,
                      labels: jnp.ndarray, cfg: Sam2Config,
                      multimask_output: bool):
    """pix_feat_with_mem [B,h,w,C]; points [B,N,2] (1024-scale x,y),
    labels [B,N] (-1 = no point). Returns (low_res_masks [B,1,4h,4w],
    high_res_masks [B,1,image,image], obj_ptr [B,C],
    object_score_logits [B,1])."""
    B, h, w, C = pix_feat_with_mem.shape
    sparse = prompt_encoder_points(params, points, labels, cfg)
    dense = jnp.broadcast_to(params["prompt"]["no_mask"],
                             (B, h, w, C))
    image_pe = prompt_dense_pe(params, cfg, grid=h)
    masks, ious, toks, obj_score = mask_decoder_forward(
        params, pix_feat_with_mem + dense, image_pe, sparse,
        high_res_feats, cfg, multimask_output)
    is_obj = (obj_score > 0)                      # [B,1]
    masks = jnp.where(is_obj[..., None, None], masks, NO_OBJ_SCORE)
    if multimask_output:
        best = jnp.argmax(ious, axis=-1)
        masks = jnp.take_along_axis(masks, best[:, None, None, None],
                                    axis=1)
        tok = jnp.take_along_axis(toks, best[:, None, None], axis=1)[:, 0]
    else:
        tok = toks[:, 0]
    high_res = bilinear_resize_torch(masks,
                                     (cfg.image_size, cfg.image_size))
    from frameino_tpu.models.sam2 import _mlp
    obj_ptr = _mlp(params["obj_ptr_proj"], tok)
    lam = is_obj.astype(obj_ptr.dtype)
    obj_ptr = lam * obj_ptr + (1.0 - lam) * params["no_obj_ptr"]
    return masks, high_res, obj_ptr, obj_score


def encode_new_memory(params: Params, pix_feat: jnp.ndarray,
                      high_res_masks: jnp.ndarray,
                      object_score_logits: jnp.ndarray,
                      cfg: Sam2Config, binarize: bool) -> jnp.ndarray:
    """SAM2Base._encode_new_memory: high_res_masks [B,1,S,S] logits ->
    memory features [B,h,w,mem_dim]. ``binarize`` on the point-prompted
    conditioning frame (2.1 behavior), sigmoid elsewhere."""
    m = high_res_masks.transpose(0, 2, 3, 1)     # [B,S,S,1]
    if binarize:
        m = (m > 0).astype(jnp.float32)
    else:
        m = jax.nn.sigmoid(m)
    m = m * cfg.sigmoid_scale_for_mem_enc + cfg.sigmoid_bias_for_mem_enc
    mem = memory_encoder_forward(params, pix_feat, m, cfg)
    is_obj = (object_score_logits > 0).astype(mem.dtype)  # [B,1]
    mem = mem + (1.0 - is_obj[:, :, None, None]) \
        * params["no_obj_embed_spatial"][None]
    return mem


# ---------------------------------------------------------------------------
# Video predictor
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class _FrameOutput:
    mem: np.ndarray          # [HW, mem_dim] spatial memory
    obj_ptr: np.ndarray      # [C]
    low_res_mask: np.ndarray  # [1, hq, wq] logits


class Sam2VideoPredictor:
    """Single-object video propagation with the reference's protocol:
    ``init_state`` -> ``add_new_points(frame 0)`` ->
    ``propagate_in_video`` (yields per-frame video-resolution mask
    logits, conditioning frame included)."""

    IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
    IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

    def __init__(self, params: Params, cfg: Sam2Config):
        self.params = params
        self.cfg = cfg
        g = cfg.image_size // 16
        self.grid = g
        self.hw = g * g
        self.ptr_split = cfg.d_model // cfg.mem_dim
        self.n_ptr_tokens = cfg.max_obj_ptrs_in_encoder * self.ptr_split
        self.curr_pos = jnp.asarray(
            sine_pos_embed(g, g, cfg.d_model)).reshape(1, self.hw,
                                                       cfg.d_model)
        self.maskmem_pos = np.asarray(
            sine_pos_embed(g, g, cfg.mem_dim)).reshape(self.hw,
                                                       cfg.mem_dim)
        cos, sin = axial_rope_tables(cfg.d_model, g, g, cfg.rope_theta)
        self.rope_q = (jnp.asarray(cos), jnp.asarray(sin))
        tile = cfg.num_maskmem
        self.rope_k = (jnp.asarray(np.tile(cos, (tile, 1))),
                       jnp.asarray(np.tile(sin, (tile, 1))))

        from frameino_tpu.models.sam2 import hiera_pos_embed
        trunk_grid = cfg.image_size // 4
        self._hiera_pe = hiera_pos_embed(
            params["trunk"], (trunk_grid, trunk_grid), cfg)
        self._encode = jax.jit(functools.partial(self._encode_impl, cfg,
                                                 self._hiera_pe))
        self._cond_step = jax.jit(
            functools.partial(self._cond_impl, cfg))
        self._prop_step = jax.jit(
            functools.partial(self._prop_impl, cfg))
        self._mem_cond = jax.jit(functools.partial(
            encode_new_memory, cfg=cfg, binarize=True))
        self._mem_prop = jax.jit(functools.partial(
            encode_new_memory, cfg=cfg, binarize=False))

    # -- jitted cores ------------------------------------------------------

    @staticmethod
    def _encode_impl(cfg, hiera_pe, params, img):
        feats, _ = image_encoder_forward(params, img, cfg,
                                         pos_embed=hiera_pe)
        return feats

    def _cond_impl(self, cfg, params, s0, s1, s2, points, labels):
        B = s2.shape[0]
        tok = s2.reshape(B, self.hw, cfg.d_model) + params["no_mem_embed"]
        pix = tok.reshape(B, self.grid, self.grid, cfg.d_model)
        return forward_sam_heads(params, pix, (s0, s1), points, labels,
                                 cfg, multimask_output=True)

    def _prop_impl(self, cfg, params, s0, s1, s2, memory, memory_pos,
                   mem_bias):
        B = s2.shape[0]
        curr = s2.reshape(B, self.hw, cfg.d_model)
        out = memory_attention_forward(
            params, curr, self.curr_pos, memory, memory_pos, mem_bias,
            self.rope_q, self.rope_k, cfg)
        pix = out.reshape(B, self.grid, self.grid, cfg.d_model)
        pts = jnp.zeros((B, 1, 2), jnp.float32)
        lbl = -jnp.ones((B, 1), jnp.int32)
        return forward_sam_heads(params, pix, (s0, s1), pts, lbl, cfg,
                                 multimask_output=True)

    # -- state machine -----------------------------------------------------

    def init_state(self, frames: np.ndarray) -> Dict:
        """frames [T,H,W,3] uint8 RGB."""
        import cv2
        T, H, W = frames.shape[:3]
        s = self.cfg.image_size
        imgs = np.stack([cv2.resize(f, (s, s),
                                    interpolation=cv2.INTER_LINEAR)
                         for f in frames])
        imgs = (imgs.astype(np.float32) / 255.0 - self.IMAGENET_MEAN) \
            / self.IMAGENET_STD
        # run activations in the params' dtype (bf16 serving, fp32 tests)
        dt = self.params["trunk"]["patch_embed"]["w"].dtype
        return {"imgs": imgs.astype(dt), "orig_hw": (H, W),
                "num_frames": T, "cond": {}, "non_cond": {}}

    def _features(self, state, t):
        feats = self._encode(self.params,
                             jnp.asarray(state["imgs"][t][None]))
        return feats

    def add_new_points(self, state: Dict, frame_idx: int,
                       points: np.ndarray, labels: np.ndarray) -> np.ndarray:
        """points [N,2] (x,y) in video pixels; labels [N] {1 pos,0 neg}.
        Returns video-res mask logits [H,W]."""
        H, W = state["orig_hw"]
        s = self.cfg.image_size
        pts = np.asarray(points, np.float32) * np.asarray(
            [s / W, s / H], np.float32)
        s0, s1, s2 = self._features(state, frame_idx)
        low, high, ptr, score = self._cond_step(
            self.params, s0, s1, s2, jnp.asarray(pts[None]),
            jnp.asarray(np.asarray(labels, np.int32)[None]))
        mem = self._mem_cond(self.params, s2, high, score)
        state["cond"][frame_idx] = _FrameOutput(
            mem=np.asarray(mem).reshape(self.hw, self.cfg.mem_dim),
            obj_ptr=np.asarray(ptr)[0],
            low_res_mask=np.asarray(low)[0])
        return np.asarray(
            bilinear_resize_torch(high, (H, W)))[0, 0]

    def _build_memory(self, state: Dict, t: int):
        """The reference memory-selection rule (stride 1): the
        conditioning frame + up to num_maskmem-1 previous frames, plus
        past object pointers."""
        cfg = self.cfg
        n_slots = cfg.num_maskmem
        mem = np.zeros((n_slots * self.hw + self.n_ptr_tokens,
                        cfg.mem_dim), np.float32)
        pos = np.zeros_like(mem)
        bias = np.full((mem.shape[0],), -1e30, np.float32)
        tpos = np.asarray(self.params["maskmem_tpos_enc"],
                          np.float32)[:, 0, 0, :]     # [num_maskmem, mem_dim]
        entries = []
        for ct, out in state["cond"].items():
            if ct <= t:
                entries.append((0, out))
        for t_pos in range(1, n_slots):
            prev = t - (n_slots - t_pos)
            out = state["non_cond"].get(prev)
            if out is not None:
                entries.append((t_pos, out))
        for slot, (t_pos, out) in enumerate(entries):
            lo = slot * self.hw
            mem[lo:lo + self.hw] = out.mem
            pos[lo:lo + self.hw] = self.maskmem_pos \
                + tpos[n_slots - t_pos - 1]
            bias[lo:lo + self.hw] = 0.0
        # object pointers: conditioning frames in the past, then the
        # previous max_obj_ptrs-1 frames (signed tpos, forward track)
        ptr_list, pos_list = [], []
        max_ptrs = min(state["num_frames"], cfg.max_obj_ptrs_in_encoder)
        for ct, out in state["cond"].items():
            if ct <= t:
                ptr_list.append(out.obj_ptr)
                pos_list.append(t - ct)
        for t_diff in range(1, max_ptrs):
            prev = t - t_diff
            if prev < 0:
                break
            out = state["non_cond"].get(prev)
            if out is not None:
                ptr_list.append(out.obj_ptr)
                pos_list.append(t_diff)
        if ptr_list:
            ptrs = np.stack(ptr_list)                 # [P, C]
            t_max = max_ptrs - 1
            pe = get_1d_sine_pe(np.asarray(pos_list, np.float32)
                                / max(t_max, 1), cfg.d_model)
            proj = self.params["obj_ptr_tpos_proj"]
            pe = pe @ np.asarray(proj["w"]) + np.asarray(proj["b"])
            ptrs = ptrs.reshape(len(ptr_list) * self.ptr_split,
                                cfg.mem_dim)
            pe = np.repeat(pe, self.ptr_split, axis=0)
            lo = n_slots * self.hw
            n = ptrs.shape[0]
            mem[lo:lo + n] = ptrs
            pos[lo:lo + n] = pe
            bias[lo:lo + n] = 0.0
        return (jnp.asarray(mem[None]), jnp.asarray(pos[None]),
                jnp.asarray(bias[None]))

    def propagate_in_video(self, state: Dict,
                           start_frame_idx: int = 0
                           ) -> Iterator[Tuple[int, np.ndarray]]:
        """Yields (frame_idx, video-res mask logits [H,W]) for every
        frame from the conditioning frame forward."""
        H, W = state["orig_hw"]
        assert state["cond"], "add_new_points first"
        cond_t = min(state["cond"])
        for t in range(max(start_frame_idx, cond_t),
                       state["num_frames"]):
            if t in state["cond"]:
                out = state["cond"][t]
                high = bilinear_resize_torch(
                    jnp.asarray(out.low_res_mask[None]),
                    (self.cfg.image_size, self.cfg.image_size))
                yield t, np.asarray(
                    bilinear_resize_torch(high, (H, W)))[0, 0]
                continue
            s0, s1, s2 = self._features(state, t)
            memory, memory_pos, bias = self._build_memory(state, t)
            low, high, ptr, score = self._prop_step(
                self.params, s0, s1, s2, memory, memory_pos, bias)
            mem = self._mem_prop(self.params, s2, high, score)
            state["non_cond"][t] = _FrameOutput(
                mem=np.asarray(mem).reshape(self.hw, self.cfg.mem_dim),
                obj_ptr=np.asarray(ptr)[0],
                low_res_mask=np.asarray(low)[0])
            yield t, np.asarray(
                bilinear_resize_torch(high, (H, W)))[0, 0]


def load_sam2_jax(checkpoint_path: str,
                  cfg: Sam2Config = None):
    """Released-checkpoint segmenter backend (perception.py contract):
    frames [T,H,W,3] uint8 + queries [N,2] on frame 0 -> [T,H,W]
    uint8 {0,1} masks (logits thresholded at 0, like the reference's
    ``evaluate_INO_VSeg_MAE.py`` usage)."""
    import torch
    from frameino_tpu.models.sam2 import (SAM21_HIERA_LARGE,
                                          sam2_from_state_dict)
    cfg = cfg or SAM21_HIERA_LARGE
    ckpt = torch.load(checkpoint_path, map_location="cpu",
                      weights_only=True)
    sd = ckpt.get("model", ckpt)
    sd = {k: v.numpy() for k, v in sd.items()}
    params = sam2_from_state_dict(sd, cfg)
    return make_segmenter_adapter(params, cfg)


def make_segmenter_adapter(params, cfg: Sam2Config = None):
    """Wrap a params tree as the ``segment(frames, queries)`` perception
    adapter (shared by the released-checkpoint loader and the
    random-init timing benches)."""
    from frameino_tpu.models.sam2 import SAM21_HIERA_LARGE
    cfg = cfg or SAM21_HIERA_LARGE
    predictor = Sam2VideoPredictor(params, cfg)

    def segment(frames: np.ndarray, queries: np.ndarray) -> np.ndarray:
        state = predictor.init_state(frames)
        pts = np.asarray(queries, np.float32)
        predictor.add_new_points(state, 0, pts,
                                 np.ones((len(pts),), np.int32))
        T = frames.shape[0]
        masks = {t: m for t, m in predictor.propagate_in_video(state)}
        blank = np.zeros(frames.shape[1:3], np.float32)
        return np.stack([(masks.get(t, blank) > 0).astype(np.uint8)
                         for t in range(T)])

    return segment
