"""SAM2.1 (Segment Anything 2) — JAX reimplementation, image-level parts.

The reference depends on the external ``sam2`` package twice: the
INO_VSeg_MAE metric video-propagates an object mask with
``facebook/sam2.1-hiera-large`` (``evaluation/evaluate_INO_VSeg_MAE.py:
33-48,160-196``) and preprocess step 8's ``SAM2_Refine`` builds the ID
masks the same way (``preprocess/track_FrameINO.py:215-398``). This
module rebuilds the SAM2.1 inference graph TPU-native so the released
``sam2.1_hiera_large.pt`` checkpoint drops in (name mapping in
``sam2_from_state_dict``; every key consumed) — no ``sam2`` package,
torch.hub, or network access required. Video memory logic lives in
``sam2_video.py``.

Image-level graph rebuilt here:

- **Hiera trunk** (hierarchical ViT): 7x7/stride-4 conv patch embed,
  windowed MHSA with background+window positional embedding, 4 stages
  (dim and heads double at each transition via the qkv projection, with
  2x2 max-pool Q pooling at the 3 transition blocks), designated global
  -attention blocks, GELU MLP. The per-block window size lags the stage
  by one block (first block of a stage uses the previous stage's
  window, halved by Q pooling) — a weight-level fact of the released
  checkpoints.
- **FPN neck**: per-level 1x1 convs to 256, nearest top-down merge on
  the configured levels only, DETR-style sine position encodings; the
  top (stride-32) level is scalped, leaving stride-4/8/16 features.
- **Prompt encoder**: random-Gaussian-matrix point position encoding,
  per-label learned embeddings, no-mask dense embedding.
- **Mask decoder**: two-way transformer (token<->image cross attention
  with internal 2x channel downsample), object-score/IoU/mask tokens,
  transposed-conv upscaling fused with the stride-4/8 high-res skip
  features, per-token hypernetwork MLPs, dynamic multimask-via-
  stability selection.

Everything is static-shape and channels-last; attention runs as plain
batched SDPA on the MXU (windows fold into the batch axis).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict


@dataclasses.dataclass(frozen=True)
class Sam2Config:
    image_size: int = 1024
    # Hiera trunk (sam2.1_hiera_l)
    embed_dim: int = 144
    num_heads: int = 2
    stages: Tuple[int, ...] = (2, 6, 36, 4)
    global_att_blocks: Tuple[int, ...] = (23, 33, 43)
    window_pos_embed_bkg_spatial_size: Tuple[int, int] = (7, 7)
    window_spec: Tuple[int, ...] = (8, 4, 16, 8)
    q_pool: int = 3
    mlp_ratio: float = 4.0
    # FPN neck
    d_model: int = 256
    fpn_top_down_levels: Tuple[int, ...] = (2, 3)
    scalp: int = 1
    # SAM heads
    dec_heads: int = 8
    dec_mlp_dim: int = 2048
    num_multimask: int = 3
    # memory machinery (sam2_video.py)
    mem_dim: int = 64
    num_maskmem: int = 7
    mem_attn_layers: int = 4
    mem_ffn_dim: int = 2048
    rope_theta: float = 10000.0
    max_obj_ptrs_in_encoder: int = 16
    sigmoid_scale_for_mem_enc: float = 20.0
    sigmoid_bias_for_mem_enc: float = -10.0
    stability_delta: float = 0.05
    stability_thresh: float = 0.98
    ln_eps: float = 1e-6

    @property
    def depth(self) -> int:
        return sum(self.stages)

    @property
    def stage_ends(self) -> Tuple[int, ...]:
        ends, tot = [], 0
        for s in self.stages:
            tot += s
            ends.append(tot - 1)
        return tuple(ends)

    @property
    def q_pool_blocks(self) -> Tuple[int, ...]:
        return tuple(e + 1 for e in self.stage_ends[:self.q_pool])

    def block_spec(self) -> List[Dict]:
        """Per-block (dim, dim_out, heads, window, q_pool) — the exact
        construction loop of sam2's Hiera (window size lags the stage
        transition by one block)."""
        specs = []
        dim, heads, cur_stage = self.embed_dim, self.num_heads, 1
        for i in range(self.depth):
            dim_out = dim
            window = self.window_spec[cur_stage - 1]
            if i in self.global_att_blocks:
                window = 0
            if i - 1 in self.stage_ends:
                dim_out = dim * 2
                heads = heads * 2
                cur_stage += 1
            specs.append(dict(dim=dim, dim_out=dim_out, heads=heads,
                              window=window,
                              q_pool=i in self.q_pool_blocks))
            dim = dim_out
        return specs

    @property
    def backbone_dims(self) -> Tuple[int, ...]:
        """Feature dim at each stage end (low->high stride)."""
        d = self.embed_dim
        return tuple(d * (2 ** i) for i in range(len(self.stages)))


SAM21_HIERA_LARGE = Sam2Config()
SAM21_HIERA_BASE_PLUS = Sam2Config(
    embed_dim=112, num_heads=2, stages=(2, 3, 16, 3),
    global_att_blocks=(12, 16, 20), window_spec=(8, 4, 14, 7))


def tiny_sam2_config() -> Sam2Config:
    return Sam2Config(image_size=64, embed_dim=8, num_heads=1,
                      stages=(1, 1, 2, 1), global_att_blocks=(2,),
                      window_spec=(4, 2, 4, 4), d_model=16, dec_heads=2,
                      dec_mlp_dim=32, mem_dim=8, mem_attn_layers=2,
                      mem_ffn_dim=32, num_maskmem=3,
                      max_obj_ptrs_in_encoder=4)


# ---------------------------------------------------------------------------
# Shared primitives
# ---------------------------------------------------------------------------

def _ln(x, w, b, eps=1e-6):
    m = x.mean(-1, keepdims=True)
    v = ((x - m) ** 2).mean(-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * w + b


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _linear(p, x):
    return x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)


def _conv2d(p, x, stride=1, padding="SAME"):
    """x [B,H,W,Cin]; p['w'] [kh,kw,Cin,Cout] (HWIO)."""
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"].astype(x.dtype)


def _sdpa(q, k, v):
    """q [B,h,Lq,d], k/v [B,h,Lk,d] — torch F.scaled_dot_product_attention."""
    scale = q.shape[-1] ** -0.5
    att = jax.nn.softmax(
        (q * scale) @ k.transpose(0, 1, 3, 2), axis=-1)
    return att @ v


def sine_pos_embed(h: int, w: int, num_pos_feats: int,
                   temperature: float = 10000.0) -> np.ndarray:
    """DETR-style sine PE (sam2 PositionEmbeddingSine, normalize=True):
    returns [H, W, C] with C = num_pos_feats (y features then x)."""
    half = num_pos_feats // 2
    eps, scale = 1e-6, 2 * math.pi
    y = np.arange(1, h + 1, dtype=np.float32)[:, None] * np.ones((1, w),
                                                                 np.float32)
    x = np.ones((h, 1), np.float32) * np.arange(1, w + 1,
                                                dtype=np.float32)[None, :]
    y = y / (y[-1:, :] + eps) * scale
    x = x / (x[:, -1:] + eps) * scale
    dim_t = np.arange(half, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / half)
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t
    px = np.stack([np.sin(px[..., 0::2]), np.cos(px[..., 1::2])],
                  axis=-1).reshape(h, w, -1)
    py = np.stack([np.sin(py[..., 0::2]), np.cos(py[..., 1::2])],
                  axis=-1).reshape(h, w, -1)
    return np.concatenate([py, px], axis=-1)


# ---------------------------------------------------------------------------
# Hiera trunk
# ---------------------------------------------------------------------------

def _window_partition(x, win):
    """[B,H,W,C] -> [B*nH*nW, win, win, C] (H,W divisible by win —
    SAM2's 1024 grid divides at every stage; asserted statically)."""
    B, H, W, C = x.shape
    assert H % win == 0 and W % win == 0, (H, W, win)
    x = x.reshape(B, H // win, win, W // win, win, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win, win, C)


def _window_unpartition(x, win, hw):
    H, W = hw
    C = x.shape[-1]
    B = x.shape[0] // ((H // win) * (W // win))
    x = x.reshape(B, H // win, W // win, win, win, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


def _max_pool2x2(x):
    """torch nn.MaxPool2d(2,2) on [B,H,W,C]."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _hiera_block(p, x, spec):
    """One MultiScaleBlock. x [B,H,W,C]."""
    B, H, W, _ = x.shape
    heads, win = spec["heads"], spec["window"]
    shortcut = x
    x = _ln(x, p["n1w"], p["n1b"])
    if spec["dim"] != spec["dim_out"]:
        shortcut = _max_pool2x2(_linear(p["proj"], x))
    if win > 0:
        x = _window_partition(x, win)
    # attention (with Q pooling at stage-transition blocks)
    b, h, w_, _ = x.shape
    qkv = _linear(p["qkv"], x).reshape(b, h * w_, 3, heads, -1)
    q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
    if spec["q_pool"]:
        qs = q.transpose(0, 2, 1, 3).reshape(b, h, w_, -1)
        qs = _max_pool2x2(qs)
        h, w_ = qs.shape[1:3]
        q = qs.reshape(b, h * w_, heads, -1).transpose(0, 2, 1, 3)
    o = _sdpa(q, k, v).transpose(0, 2, 1, 3).reshape(b, h, w_, -1)
    o = _linear(p["attn_proj"], o)
    if spec["q_pool"]:
        win = win // 2
        H, W = shortcut.shape[1:3]
    if spec["window"] > 0:
        o = _window_unpartition(o, win, (H, W))
    x = shortcut + o
    h2 = _ln(x, p["n2w"], p["n2b"])
    x = x + _linear(p["mlp2"], _gelu(_linear(p["mlp1"], h2)))
    return x


def hiera_pos_embed(params, hw: Tuple[int, int],
                    cfg: Sam2Config) -> jnp.ndarray:
    """Background PE bicubic-resized to the token grid + the window PE
    tiled across it (sam2 Hiera._get_pos_embed). Host-side numpy; the
    result is static per input shape."""
    from frameino_tpu.models.dinov2 import _torch_bicubic_resize
    h, w = hw
    bkg = np.asarray(params["pos_embed"], np.float32)[0]  # [C,hb,wb]
    bkg = np.moveaxis(bkg, 0, -1)                         # [hb,wb,C]
    # torch F.interpolate(size=...) maps with out/in ratio scales
    bkg = _torch_bicubic_resize(bkg, (h, w),
                                (h / bkg.shape[0], w / bkg.shape[1]))
    winp = np.asarray(params["pos_embed_window"], np.float32)[0]
    winp = np.moveaxis(winp, 0, -1)                       # [wh,ww,C]
    wh, ww = winp.shape[:2]
    assert h % wh == 0 and w % ww == 0, (hw, winp.shape)
    tiled = np.tile(winp, (h // wh, w // ww, 1))
    return jnp.asarray(bkg + tiled)[None]


def hiera_forward(params: Params, x: jnp.ndarray, cfg: Sam2Config,
                  pos_embed: Optional[jnp.ndarray] = None
                  ) -> List[jnp.ndarray]:
    """x [B,H,W,3] (normalized) -> stage-end features (low->high
    stride), each [B,h,w,C]. ``pos_embed`` must be precomputed via
    ``hiera_pos_embed`` when this runs under jit (the bicubic resize is
    host-side numpy); defaults to computing it from concrete params."""
    p = params["trunk"]
    x = _conv2d(p["patch_embed"], x, stride=4,
                padding=((3, 2), (3, 2)))   # k7 s4 p3: torch pads 3;
    # torch Conv2d(k=7,s=4,p=3) on size N: out = floor((N+6-7)/4)+1 =
    # N/4 for N%4==0 — lax needs (3,2) to produce the same windows
    if pos_embed is None:
        pos_embed = hiera_pos_embed(p, x.shape[1:3], cfg)
    x = x + pos_embed.astype(x.dtype)
    outs = []
    for i, spec in enumerate(cfg.block_spec()):
        x = _hiera_block(p["blocks"][i], x, spec)
        if i in cfg.stage_ends:
            outs.append(x)
    return outs


def neck_forward(params: Params, xs: List[jnp.ndarray],
                 cfg: Sam2Config) -> Tuple[List[jnp.ndarray],
                                           List[jnp.ndarray]]:
    """FpnNeck: per-level 1x1 conv + nearest top-down on the configured
    levels; returns (features, sine position encodings), scalped."""
    p = params["neck"]
    n = len(xs) - 1
    out = [None] * len(xs)
    prev = None
    for i in range(n, -1, -1):
        lateral = _conv2d(p["convs"][n - i], xs[i], stride=1,
                          padding="VALID")
        if i in cfg.fpn_top_down_levels and prev is not None:
            up = jnp.repeat(jnp.repeat(prev, 2, axis=1), 2, axis=2)
            prev = lateral + up
        else:
            prev = lateral
        out[i] = prev
    pos = [jnp.asarray(sine_pos_embed(f.shape[1], f.shape[2],
                                      cfg.d_model))[None]
           for f in out]
    if cfg.scalp:
        out, pos = out[:-cfg.scalp], pos[:-cfg.scalp]
    return out, pos


def image_encoder_forward(params: Params, x: jnp.ndarray,
                          cfg: Sam2Config,
                          pos_embed: Optional[jnp.ndarray] = None):
    """Full image encoder. Returns (backbone_fpn, pos) with the
    stride-4/8 levels already projected to the mask decoder's high-res
    skip dims (conv_s0/conv_s1 — SAM2Base.forward_image)."""
    feats, pos = neck_forward(
        params, hiera_forward(params, x, cfg, pos_embed), cfg)
    feats = list(feats)
    feats[0] = _conv2d(params["decoder"]["conv_s0"], feats[0],
                       padding="VALID")
    feats[1] = _conv2d(params["decoder"]["conv_s1"], feats[1],
                       padding="VALID")
    return feats, pos


# ---------------------------------------------------------------------------
# Prompt encoder
# ---------------------------------------------------------------------------

def pe_with_coords(gauss: jnp.ndarray, coords: jnp.ndarray,
                   size: Tuple[int, int]) -> jnp.ndarray:
    """PositionEmbeddingRandom.forward_with_coords: coords [...,2]
    (x, y) in pixels -> [..., 2*half]."""
    c = coords / jnp.asarray([size[1], size[0]], coords.dtype)
    c = (2 * c - 1) @ gauss
    c = 2 * jnp.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def prompt_encoder_points(params: Params, points: jnp.ndarray,
                          labels: jnp.ndarray,
                          cfg: Sam2Config) -> jnp.ndarray:
    """Sparse embeddings for point prompts (PromptEncoder._embed_points,
    pad=True): points [B,N,2] pixel (x,y), labels [B,N] in
    {-1 pad, 0 neg, 1 pos}; a (0,0)/-1 pad point is appended."""
    p = params["prompt"]
    B = points.shape[0]
    points = jnp.concatenate(      # +0.5 pixel-center shift BEFORE the
        [points + 0.5,             # (0,0) pad point, matching torch
         jnp.zeros((B, 1, 2), points.dtype)], axis=1)
    labels = jnp.concatenate(
        [labels, -jnp.ones((B, 1), labels.dtype)], axis=1)
    pe = pe_with_coords(p["gauss"], points,
                        (cfg.image_size, cfg.image_size))
    lab = labels[..., None]
    pe = jnp.where(lab == -1, p["not_a_point"], pe)
    pe = pe + jnp.where(lab == 0, p["point_embed"][0], 0.0)
    pe = pe + jnp.where(lab == 1, p["point_embed"][1], 0.0)
    pe = pe + jnp.where(lab == 2, p["point_embed"][2], 0.0)
    pe = pe + jnp.where(lab == 3, p["point_embed"][3], 0.0)
    return pe


def prompt_dense_pe(params: Params, cfg: Sam2Config,
                    grid: Optional[int] = None) -> jnp.ndarray:
    """PositionEmbeddingRandom on the feature grid (get_dense_pe):
    [1, gh, gw, C]."""
    g = grid if grid is not None else cfg.image_size // 16
    ys = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    xs = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    c = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
    c = (2 * c - 1) @ params["prompt"]["gauss"]
    c = 2 * jnp.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)[None]


# ---------------------------------------------------------------------------
# Two-way transformer + mask decoder
# ---------------------------------------------------------------------------

def _attn(p, q, k, v, heads):
    """SAM decoder Attention: separate q/k/v/out projections with an
    internal channel downsample folded into the projection shapes."""
    B, Lq = q.shape[:2]
    Lk = k.shape[1]
    q = _linear(p["q"], q).reshape(B, Lq, heads, -1).transpose(0, 2, 1, 3)
    k = _linear(p["k"], k).reshape(B, Lk, heads, -1).transpose(0, 2, 1, 3)
    v = _linear(p["v"], v).reshape(B, Lk, heads, -1).transpose(0, 2, 1, 3)
    o = _sdpa(q, k, v).transpose(0, 2, 1, 3).reshape(B, Lq, -1)
    return _linear(p["out"], o)


def two_way_transformer(params: Params, image_embedding: jnp.ndarray,
                        image_pe: jnp.ndarray, tokens: jnp.ndarray,
                        cfg: Sam2Config):
    """image_embedding/image_pe [B,h,w,C]; tokens [B,N,C] ->
    (queries [B,N,C], keys [B,hw,C])."""
    p = params["decoder"]["transformer"]
    B, h, w, C = image_embedding.shape
    keys = image_embedding.reshape(B, h * w, C)
    key_pe = jnp.broadcast_to(image_pe.reshape(1, h * w, C),
                              keys.shape)
    queries = tokens
    for li, lp in enumerate(p["layers"]):
        if li == 0:
            # skip_first_layer_pe: the first self-attention REPLACES
            # the queries (no residual) — sam TwoWayAttentionBlock
            queries = _attn(lp["self_attn"], queries, queries,
                            queries, cfg.dec_heads)
        else:
            q = queries + tokens
            queries = queries + _attn(lp["self_attn"], q, q, queries,
                                      cfg.dec_heads)
        queries = _ln(queries, lp["n1w"], lp["n1b"], 1e-5)
        q = queries + tokens
        k = keys + key_pe
        queries = queries + _attn(lp["t2i"], q, k, keys, cfg.dec_heads)
        queries = _ln(queries, lp["n2w"], lp["n2b"], 1e-5)
        queries = queries + _linear(
            lp["mlp2"], jax.nn.relu(_linear(lp["mlp1"], queries)))
        queries = _ln(queries, lp["n3w"], lp["n3b"], 1e-5)
        q = queries + tokens
        k = keys + key_pe
        keys = keys + _attn(lp["i2t"], k, q, queries, cfg.dec_heads)
        keys = _ln(keys, lp["n4w"], lp["n4b"], 1e-5)
    q = queries + tokens
    k = keys + key_pe
    queries = queries + _attn(p["final_t2i"], q, k, keys, cfg.dec_heads)
    queries = _ln(queries, p["nfw"], p["nfb"], 1e-5)
    return queries, keys


def _mlp(p, x, act=jax.nn.relu, sigmoid_output=False):
    n = len(p["layers"])
    for i, lp in enumerate(p["layers"]):
        x = _linear(lp, x)
        if i < n - 1:
            x = act(x)
    return jax.nn.sigmoid(x) if sigmoid_output else x


def _conv_transpose2x2(p, x):
    """torch ConvTranspose2d(k=2, s=2) on [B,H,W,C]; p['w'] stored HWIO
    (already flipped/transposed from torch's [Cin,Cout,kh,kw])."""
    y = jax.lax.conv_transpose(
        x, p["w"].astype(x.dtype), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"].astype(x.dtype)


def _ln2d(x, w, b):
    """sam2 LayerNorm2d on channels-last input: normalize channel dim."""
    m = x.mean(-1, keepdims=True)
    v = ((x - m) ** 2).mean(-1, keepdims=True)
    return (x - m) / jnp.sqrt(v + 1e-6) * w + b


def _mask_stability(masks: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IoU of +delta/-delta logit thresholdings, per mask [B,M,h,w]."""
    hi = (masks > delta).sum((-1, -2)).astype(jnp.float32)
    lo = (masks > -delta).sum((-1, -2)).astype(jnp.float32)
    return jnp.where(lo > 0, hi / jnp.maximum(lo, 1e-6), 1.0)


def mask_decoder_forward(params: Params, src: jnp.ndarray,
                         image_pe: jnp.ndarray,
                         sparse_prompt: jnp.ndarray,
                         high_res_feats: Sequence[jnp.ndarray],
                         cfg: Sam2Config,
                         multimask_output: bool,
                         dynamic_multimask: bool = True):
    """src [B,h,w,C] = image features + dense prompt; returns
    (low_res_masks [B,K,4h,4w], iou [B,K], sam_tokens [B,K,C],
    object_score_logits [B,1]) — K=3 multimask candidates when
    ``multimask_output`` (best-IoU selection happens in the caller,
    matching sam2 MaskDecoder.forward/_forward_sam_heads), else K=1
    (token 0, with dynamic stability fallback on the mask)."""
    p = params["decoder"]
    B = src.shape[0]
    out_tokens = jnp.concatenate(
        [p["obj_score_token"], p["iou_token"], p["mask_tokens"]], axis=0)
    n_mask = 1 + cfg.num_multimask
    tokens = jnp.concatenate(
        [jnp.broadcast_to(out_tokens[None], (B,) + out_tokens.shape),
         sparse_prompt], axis=1)
    hs, keys = two_way_transformer(params, src, image_pe, tokens, cfg)
    iou_tok = hs[:, 1]
    mask_toks = hs[:, 2:2 + n_mask]
    h, w, C = src.shape[1:]
    src_out = keys.reshape(B, h, w, C)
    feat_s0, feat_s1 = high_res_feats
    up = _conv_transpose2x2(p["up1"], src_out) + feat_s1
    up = _gelu(_ln2d(up, p["up_ln_w"], p["up_ln_b"]))
    up = _gelu(_conv_transpose2x2(p["up2"], up) + feat_s0)
    hyper = jnp.stack(
        [_mlp(p["hyper"][i], mask_toks[:, i]) for i in range(n_mask)],
        axis=1)                                             # [B,4,C/8]
    hb, wb = up.shape[1:3]
    masks = (hyper @ up.reshape(B, hb * wb, -1).transpose(0, 2, 1)
             ).reshape(B, n_mask, hb, wb)
    iou_pred = _mlp(p["iou_head"], iou_tok,
                    sigmoid_output=True)                    # [B,4]
    obj_score = _mlp(p["obj_score_head"], hs[:, 0])         # [B,1]
    if multimask_output:
        # all 3 candidates; best-IoU selection + multimask obj-ptr
        # token happen in forward_sam_heads (sam2_video.py)
        return masks[:, 1:], iou_pred[:, 1:], mask_toks[:, 1:], obj_score
    # single-mask path with dynamic stability fallback
    m0, i0 = masks[:, 0:1], iou_pred[:, 0:1]
    tok0 = mask_toks[:, 0:1]
    if dynamic_multimask:
        stability = _mask_stability(m0, cfg.stability_delta)[:, 0]
        best = jnp.argmax(iou_pred[:, 1:], axis=-1)
        mb = jnp.take_along_axis(masks[:, 1:],
                                 best[:, None, None, None], axis=1)
        ib = jnp.take_along_axis(iou_pred[:, 1:], best[:, None], axis=1)
        use0 = (stability >= cfg.stability_thresh)[:, None]
        m0 = jnp.where(use0[..., None, None], m0, mb)
        i0 = jnp.where(use0, i0, ib)
    return m0, i0, tok0, obj_score


# ---------------------------------------------------------------------------
# Random init (tests / shape reference)
# ---------------------------------------------------------------------------

def init_sam2(key, cfg: Sam2Config) -> Params:
    """Random params with the exact tree/shapes of
    ``sam2_from_state_dict`` output (tests, shape documentation)."""
    import itertools
    counter = itertools.count()

    def nrm(*shape, scale=0.1):
        k = jax.random.fold_in(key, next(counter))
        return scale * jax.random.normal(k, shape, jnp.float32)

    def lin(din, dout):
        return {"w": nrm(din, dout), "b": nrm(dout)}

    def conv(kh, kw, cin, cout):
        return {"w": nrm(kh, kw, cin, cout), "b": nrm(cout)}

    def mlp(din, dh, dout, n):
        dims = [din] + [dh] * (n - 1) + [dout]
        return {"layers": [lin(dims[i], dims[i + 1]) for i in range(n)]}

    def attnp(dq, internal, dkv=None):
        dkv = dkv if dkv is not None else dq
        return {"q": lin(dq, internal), "k": lin(dkv, internal),
                "v": lin(dkv, internal), "out": lin(internal, dq)}

    E, C, M = cfg.embed_dim, cfg.d_model, cfg.mem_dim
    trunk = {"patch_embed": conv(7, 7, 3, E),
             "pos_embed": nrm(1, E, *cfg.window_pos_embed_bkg_spatial_size),
             "pos_embed_window": nrm(1, E, cfg.window_spec[0],
                                     cfg.window_spec[0]),
             "blocks": []}
    for spec in cfg.block_spec():
        d, do = spec["dim"], spec["dim_out"]
        blk = {"n1w": jnp.ones(d), "n1b": nrm(d),
               "n2w": jnp.ones(do), "n2b": nrm(do),
               "qkv": lin(d, 3 * do), "attn_proj": lin(do, do),
               "mlp1": lin(do, int(do * cfg.mlp_ratio)),
               "mlp2": lin(int(do * cfg.mlp_ratio), do)}
        if d != do:
            blk["proj"] = lin(d, do)
        trunk["blocks"].append(blk)
    neck = {"convs": [conv(1, 1, d, C)
                      for d in reversed(cfg.backbone_dims)]}
    prompt = {"gauss": nrm(2, C // 2, scale=1.0),
              "point_embed": nrm(4, C), "not_a_point": nrm(C),
              "no_mask": nrm(C),
              "mask_down": [conv(2, 2, 1, 4), conv(2, 2, 4, 16),
                            conv(1, 1, 16, C)],
              "mask_down_ln": [(jnp.ones(4), nrm(4)),
                               (jnp.ones(16), nrm(16))]}
    dec_internal = C // 2
    layers = []
    for _ in range(2):
        layers.append({
            "self_attn": attnp(C, C),
            "t2i": attnp(C, dec_internal), "i2t": attnp(C, dec_internal),
            "mlp1": lin(C, cfg.dec_mlp_dim),
            "mlp2": lin(cfg.dec_mlp_dim, C),
            **{f"n{i}w": jnp.ones(C) for i in range(1, 5)},
            **{f"n{i}b": nrm(C) for i in range(1, 5)}})
    n_mask = 1 + cfg.num_multimask
    decoder = {
        "transformer": {"layers": layers,
                        "final_t2i": attnp(C, dec_internal),
                        "nfw": jnp.ones(C), "nfb": nrm(C)},
        "iou_token": nrm(1, C), "mask_tokens": nrm(n_mask, C),
        "obj_score_token": nrm(1, C),
        "up1": conv(2, 2, C, C // 4),
        "up_ln_w": jnp.ones(C // 4), "up_ln_b": nrm(C // 4),
        "up2": conv(2, 2, C // 4, C // 8),
        "conv_s0": conv(1, 1, C, C // 8), "conv_s1": conv(1, 1, C, C // 4),
        "hyper": [mlp(C, C, C // 8, 3) for _ in range(n_mask)],
        "iou_head": mlp(C, C, n_mask, 3),
        "obj_score_head": mlp(C, C, 1, 3)}
    mem_layers = [{
        "self_attn": attnp(C, C), "cross_attn": attnp(C, C, dkv=M),
        "lin1": lin(C, cfg.mem_ffn_dim), "lin2": lin(cfg.mem_ffn_dim, C),
        **{f"n{i}w": jnp.ones(C) for i in range(1, 4)},
        **{f"n{i}b": nrm(C) for i in range(1, 4)}}
        for _ in range(cfg.mem_attn_layers)]
    memory_attention = {"layers": mem_layers, "nw": jnp.ones(C),
                        "nb": nrm(C)}
    md_ch = [1, 4, 16, 64, 256]
    memory_encoder = {
        "mask_down": [conv(3, 3, md_ch[i], md_ch[i + 1])
                      for i in range(4)] + [conv(1, 1, 256, C)],
        "mask_down_ln": [(jnp.ones(c), nrm(c)) for c in md_ch[1:]],
        "pix_proj": conv(1, 1, C, C),
        "fuser": [{"dwconv": conv(7, 7, 1, C),
                   "nw": jnp.ones(C), "nb": nrm(C),
                   "pw1": lin(C, 4 * C), "pw2": lin(4 * C, C),
                   "gamma": nrm(C)} for _ in range(2)],
        "out_proj": conv(1, 1, C, M)}
    return {"trunk": trunk, "neck": neck, "prompt": prompt,
            "decoder": decoder, "memory_attention": memory_attention,
            "memory_encoder": memory_encoder,
            "maskmem_tpos_enc": nrm(cfg.num_maskmem, 1, 1, M),
            "no_mem_embed": nrm(1, 1, C), "no_mem_pos_enc": nrm(1, 1, C),
            "no_obj_ptr": nrm(1, C), "no_obj_embed_spatial": nrm(1, M),
            "obj_ptr_proj": mlp(C, C, C, 3),
            "obj_ptr_tpos_proj": lin(C, M)}


# ---------------------------------------------------------------------------
# Checkpoint mapping
# ---------------------------------------------------------------------------

def _lin(sd, name):
    return {"w": jnp.asarray(sd.pop(name + ".weight").T.copy()),
            "b": jnp.asarray(sd.pop(name + ".bias"))}


def _conv(sd, name):
    w = sd.pop(name + ".weight")                  # [Cout,Cin,kh,kw]
    return {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0)).copy()),
            "b": jnp.asarray(sd.pop(name + ".bias"))}


def _convT(sd, name):
    # torch ConvTranspose2d weight [Cin,Cout,kh,kw]; lax.conv_transpose
    # correlates the zero-dilated input with the kernel, so torch's
    # semantics need a spatial flip on top of the HWIO transpose
    w = sd.pop(name + ".weight")[:, :, ::-1, ::-1]
    return {"w": jnp.asarray(np.ascontiguousarray(
                np.transpose(w, (2, 3, 0, 1)))),
            "b": jnp.asarray(sd.pop(name + ".bias"))}


def _lnp(sd, name):
    return (jnp.asarray(sd.pop(name + ".weight")),
            jnp.asarray(sd.pop(name + ".bias")))


def _mlpp(sd, name, n):
    return {"layers": [_lin(sd, f"{name}.layers.{i}") for i in range(n)]}


def _attnp(sd, name):
    return {"q": _lin(sd, name + ".q_proj"),
            "k": _lin(sd, name + ".k_proj"),
            "v": _lin(sd, name + ".v_proj"),
            "out": _lin(sd, name + ".out_proj")}


def sam2_from_state_dict(sd: Dict[str, np.ndarray],
                         cfg: Sam2Config) -> Params:
    """Map the released SAM2.1 checkpoint (the ``model`` dict of
    ``sam2.1_hiera_large.pt``) 1:1; every key consumed. Returns the
    params tree shared by this module and ``sam2_video.py``."""
    sd = {k: np.asarray(v) for k, v in sd.items()}

    # --- Hiera trunk ---
    t = "image_encoder.trunk."
    trunk = {
        "patch_embed": _conv(sd, t + "patch_embed.proj"),
        "pos_embed": jnp.asarray(sd.pop(t + "pos_embed")),
        "pos_embed_window": jnp.asarray(sd.pop(t + "pos_embed_window")),
        "blocks": [],
    }
    for i, spec in enumerate(cfg.block_spec()):
        b = f"{t}blocks.{i}."
        n1w, n1b = _lnp(sd, b + "norm1")
        n2w, n2b = _lnp(sd, b + "norm2")
        blk = {"n1w": n1w, "n1b": n1b, "n2w": n2w, "n2b": n2b,
               "qkv": _lin(sd, b + "attn.qkv"),
               "attn_proj": _lin(sd, b + "attn.proj"),
               "mlp1": _lin(sd, b + "mlp.layers.0"),
               "mlp2": _lin(sd, b + "mlp.layers.1")}
        if spec["dim"] != spec["dim_out"]:
            blk["proj"] = _lin(sd, b + "proj")
        trunk["blocks"].append(blk)

    # --- FPN neck ---
    neck = {"convs": [_conv(sd, f"image_encoder.neck.convs.{i}.conv")
                      for i in range(len(cfg.stages))]}

    # --- prompt encoder ---
    pp = "sam_prompt_encoder."
    prompt = {
        "gauss": jnp.asarray(
            sd.pop(pp + "pe_layer.positional_encoding_gaussian_matrix")),
        "point_embed": jnp.concatenate(
            [jnp.asarray(sd.pop(f"{pp}point_embeddings.{i}.weight"))
             for i in range(4)], axis=0),
        "not_a_point": jnp.asarray(
            sd.pop(pp + "not_a_point_embed.weight"))[0],
        "no_mask": jnp.asarray(sd.pop(pp + "no_mask_embed.weight"))[0],
        "mask_down": [_conv(sd, f"{pp}mask_downscaling.{i}")
                      for i in (0, 3, 6)],
        "mask_down_ln": [_lnp(sd, f"{pp}mask_downscaling.{i}")
                         for i in (1, 4)],
    }

    # --- mask decoder ---
    dp = "sam_mask_decoder."
    layers = []
    for i in range(2):
        lpfx = f"{dp}transformer.layers.{i}."
        n1w, n1b = _lnp(sd, lpfx + "norm1")
        n2w, n2b = _lnp(sd, lpfx + "norm2")
        n3w, n3b = _lnp(sd, lpfx + "norm3")
        n4w, n4b = _lnp(sd, lpfx + "norm4")
        layers.append({
            "self_attn": _attnp(sd, lpfx + "self_attn"),
            "t2i": _attnp(sd, lpfx + "cross_attn_token_to_image"),
            "i2t": _attnp(sd, lpfx + "cross_attn_image_to_token"),
            "mlp1": _lin(sd, lpfx + "mlp.layers.0"),
            "mlp2": _lin(sd, lpfx + "mlp.layers.1"),
            "n1w": n1w, "n1b": n1b, "n2w": n2w, "n2b": n2b,
            "n3w": n3w, "n3b": n3b, "n4w": n4w, "n4b": n4b})
    nfw, nfb = _lnp(sd, dp + "transformer.norm_final_attn")
    up_ln_w, up_ln_b = _lnp(sd, dp + "output_upscaling.1")
    n_mask = 1 + cfg.num_multimask
    decoder = {
        "transformer": {
            "layers": layers, "nfw": nfw, "nfb": nfb,
            "final_t2i": _attnp(sd,
                                dp + "transformer.final_attn_token_to_image"),
        },
        "iou_token": jnp.asarray(sd.pop(dp + "iou_token.weight")),
        "mask_tokens": jnp.asarray(sd.pop(dp + "mask_tokens.weight")),
        "obj_score_token": jnp.asarray(
            sd.pop(dp + "obj_score_token.weight")),
        "up1": _convT(sd, dp + "output_upscaling.0"),
        "up_ln_w": up_ln_w, "up_ln_b": up_ln_b,
        "up2": _convT(sd, dp + "output_upscaling.3"),
        "conv_s0": _conv(sd, dp + "conv_s0"),
        "conv_s1": _conv(sd, dp + "conv_s1"),
        "hyper": [_mlpp(sd, f"{dp}output_hypernetworks_mlps.{i}", 3)
                  for i in range(n_mask)],
        "iou_head": _mlpp(sd, dp + "iou_prediction_head", 3),
        "obj_score_head": _mlpp(sd, dp + "pred_obj_score_head", 3),
    }

    # --- memory attention ---
    ma = "memory_attention."
    mem_layers = []
    for i in range(cfg.mem_attn_layers):
        lpfx = f"{ma}layers.{i}."
        n1w, n1b = _lnp(sd, lpfx + "norm1")
        n2w, n2b = _lnp(sd, lpfx + "norm2")
        n3w, n3b = _lnp(sd, lpfx + "norm3")
        mem_layers.append({
            "self_attn": _attnp(sd, lpfx + "self_attn"),
            "cross_attn": _attnp(sd, lpfx + "cross_attn_image"),
            "lin1": _lin(sd, lpfx + "linear1"),
            "lin2": _lin(sd, lpfx + "linear2"),
            "n1w": n1w, "n1b": n1b, "n2w": n2w, "n2b": n2b,
            "n3w": n3w, "n3b": n3b})
    mnw, mnb = _lnp(sd, ma + "norm")
    memory_attention = {"layers": mem_layers, "nw": mnw, "nb": mnb}

    # --- memory encoder ---
    me = "memory_encoder."
    md = me + "mask_downsampler.encoder."
    fuser_layers = []
    for i in range(2):
        f = f"{me}fuser.layers.{i}."
        nw, nb = _lnp(sd, f + "norm")
        fuser_layers.append({
            "dwconv": _conv(sd, f + "dwconv"),
            "nw": nw, "nb": nb,
            "pw1": _lin(sd, f + "pwconv1"),
            "pw2": _lin(sd, f + "pwconv2"),
            "gamma": jnp.asarray(sd.pop(f + "gamma"))})
    memory_encoder = {
        "mask_down": [_conv(sd, md + str(i)) for i in (0, 3, 6, 9, 12)],
        "mask_down_ln": [_lnp(sd, md + str(i)) for i in (1, 4, 7, 10)],
        "pix_proj": _conv(sd, me + "pix_feat_proj"),
        "fuser": fuser_layers,
        "out_proj": _conv(sd, me + "out_proj"),
    }

    params = {
        "trunk": trunk, "neck": neck, "prompt": prompt,
        "decoder": decoder, "memory_attention": memory_attention,
        "memory_encoder": memory_encoder,
        "maskmem_tpos_enc": jnp.asarray(sd.pop("maskmem_tpos_enc")),
        "no_mem_embed": jnp.asarray(sd.pop("no_mem_embed")),
        "no_mem_pos_enc": jnp.asarray(sd.pop("no_mem_pos_enc")),
        "no_obj_ptr": jnp.asarray(sd.pop("no_obj_ptr")),
        "no_obj_embed_spatial": jnp.asarray(
            sd.pop("no_obj_embed_spatial")),
        "obj_ptr_proj": _mlpp(sd, "obj_ptr_proj", 3),
        "obj_ptr_tpos_proj": _lin(sd, "obj_ptr_tpos_proj"),
    }
    sd.pop("mask_downsample.weight", None)   # unused video-API conv
    sd.pop("mask_downsample.bias", None)
    assert not sd, f"unconsumed checkpoint keys: {sorted(sd)[:8]}"
    return params
