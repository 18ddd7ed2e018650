"""CoTracker3-offline point tracker — JAX reimplementation.

The reference drives CoTracker3 via ``torch.hub`` in two places:
evaluation's INO_Traj metric (``evaluation/evaluate_INO_Traj.py:79,176``)
and preprocess step 7's forward+backward cycle tracking
(``preprocess/track_regular_motion_cycle.py:199,320-342``); the same
architecture is vendored at
``preprocess/SpaTrackV2_code/models/tracker3D/co_tracker/cotracker_base.py``
(CoTrackerThreeOffline) whose released-checkpoint state-dict this module's
``cotracker_from_state_dict`` maps 1:1, so the public
``cotracker3_offline`` weights (``scaled_offline.pth``) drop in.

Inference graph (behavior parity with ``cotracker_base.py:191-405``):

  BasicEncoder CNN (stride 4, 128-d, instance-norm, 4 residual stages
  fused at 1/4 resolution) -> channel-L2-normalized feature maps
  -> 4-level avg-pool pyramid
  -> per-query 7x7 support features at the query frame (all levels)
  -> iterative refinement (default 6 iters): 7x7-patch correlation
     volumes (49x49) -> shared corr MLP per level -> [vis, conf,
     corr embeddings, rel-coord sinusoid posenc] tokens (1110-d)
     + interpolated time embedding
  -> EfficientUpdateFormer: 3 time blocks over (track, T) tokens
     interleaved with 3 virtual-track space bottlenecks
     (virtual<-point cross, virtual self, point<-virtual cross)
  -> additive (coords, vis, conf) deltas; sigmoid on read-out.

TPU notes: everything is static-shape; the refinement loop is a
``lax.scan`` over iterations (carry = coords/vis/conf) so the 6
iterations compile once; gathers implement ``grid_sample``'s
border-padded align-corners=True bilinear exactly (coordinate clamp,
then 2-tap interpolation per axis). The time dimension of the
reference's 3D (t, x, y) track-feature sampling is always queried at
integer t (query frames), so it reduces exactly to a frame gather +
2D bilinear — no trilinear pass is needed.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict


@dataclasses.dataclass(frozen=True)
class CoTrackerConfig:
    window_len: int = 60            # offline model; time_emb table length
    stride: int = 4
    corr_radius: int = 3
    corr_levels: int = 4
    latent_dim: int = 128
    hidden_size: int = 384
    num_heads: int = 8
    time_depth: int = 3
    space_depth: int = 3
    num_virtual_tracks: int = 64
    model_resolution: Tuple[int, int] = (384, 512)
    corr_mlp_hidden: int = 384
    corr_mlp_out: int = 256
    mlp_ratio: float = 4.0
    iters: int = 6                  # predictor default (hub wrapper)

    @property
    def input_dim(self) -> int:
        # vis + conf + corr_levels*corr_mlp_out + posenc(4 rel coords,
        # 10 degrees): 4 + 4*2*10 = 84
        return 2 + self.corr_levels * self.corr_mlp_out + 84


COTRACKER3_OFFLINE = CoTrackerConfig()


def tiny_cotracker_config() -> CoTrackerConfig:
    return CoTrackerConfig(window_len=8, latent_dim=16, hidden_size=32,
                           num_heads=2, time_depth=2, space_depth=2,
                           num_virtual_tracks=4, corr_levels=2,
                           corr_mlp_hidden=16, corr_mlp_out=8,
                           model_resolution=(16, 24), iters=2)


# ---------------------------------------------------------------------------
# Primitives (torch-layout params: conv [O,I,kh,kw], linear [out,in])
# ---------------------------------------------------------------------------

def _conv2d(p, x, stride=1):
    kh, kw = p["weight"].shape[2:]
    y = jax.lax.conv_general_dilated(
        x, p["weight"], (stride, stride),
        [(kh // 2, kh // 2), (kw // 2, kw // 2)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if "bias" in p:
        y = y + p["bias"][None, :, None, None]
    return y


def _inorm(x, eps=1e-5):
    """InstanceNorm2d, affine=False (torch default), biased variance."""
    mu = x.mean((2, 3), keepdims=True)
    var = ((x - mu) ** 2).mean((2, 3), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def _lin(p, x):
    y = x @ p["weight"].T
    if "bias" in p:
        y = y + p["bias"]
    return y


def _ln(x, p=None, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    if p is not None:
        y = y * p["weight"] + p["bias"]
    return y


def _mlp(p, x, approximate=True):
    # transformer MLPs use tanh-approx GELU, the corr MLP the exact one
    # (utils.py:412 vs the Mlp default at :303)
    h = jax.nn.gelu(_lin(p["fc1"], x), approximate=approximate)
    return _lin(p["fc2"], h)


def _resize_bilinear_ac(x, out_hw):
    """[B,C,H,W] bilinear resize, align_corners=True."""
    b, c, h, w = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x

    def coords(insz, outsz):
        if outsz == 1:
            return jnp.zeros((1,), x.dtype)
        return jnp.arange(outsz, dtype=x.dtype) * ((insz - 1) / (outsz - 1))

    yc, xc = coords(h, oh), coords(w, ow)
    y0 = jnp.clip(jnp.floor(yc).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xc).astype(jnp.int32), 0, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fy = (yc - y0.astype(x.dtype))[None, None, :, None]
    fx = (xc - x0.astype(x.dtype))[None, None, None, :]
    g = x[:, :, y0][:, :, :, x0] * (1 - fx) + x[:, :, y0][:, :, :, x1] * fx
    g1 = x[:, :, y1][:, :, :, x0] * (1 - fx) + x[:, :, y1][:, :, :, x1] * fx
    return g * (1 - fy) + g1 * fy


def bilinear_sample(fmap, xy):
    """grid_sample(align_corners=True, padding_mode='border') on pixel
    coords. fmap: [C,H,W]; xy: [..., 2] (x, y). Returns [..., C]."""
    C, H, W = fmap.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.0)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, W - 1)
    y1i = jnp.minimum(y0i + 1, H - 1)
    flat = fmap.reshape(C, H * W).T                      # [H*W, C]

    def tap(yi, xi):
        return flat[yi * W + xi]                         # [..., C]

    top = tap(y0i, x0i) * (1 - fx) + tap(y0i, x1i) * fx
    bot = tap(y1i, x0i) * (1 - fx) + tap(y1i, x1i) * fx
    return top * (1 - fy) + bot * fy


# ---------------------------------------------------------------------------
# BasicEncoder (cotracker_base utils BasicEncoder, instance-norm ResNet)
# ---------------------------------------------------------------------------

def _res_block(p, x, stride=1):
    y = jax.nn.relu(_inorm(_conv2d(p["conv1"], x, stride)))
    y = jax.nn.relu(_inorm(_conv2d(p["conv2"], y)))
    if "downsample" in p:
        # 1x1 strided conv + instance norm
        x = _inorm(_conv2d(p["downsample"], x, stride))
    return jax.nn.relu(x + y)


def _res_layer(p, x, stride):
    x = _res_block(p["0"], x, stride)
    return _res_block(p["1"], x, 1)


def basic_encoder_forward(cfg: CoTrackerConfig, p: Params, x) -> jnp.ndarray:
    """[B,3,H,W] -> [B,latent,H/stride,W/stride]."""
    H, W = x.shape[2], x.shape[3]
    tgt = (H // cfg.stride, W // cfg.stride)
    x = jax.nn.relu(_inorm(_conv2d(p["conv1"], x, 2)))
    a = _res_layer(p["layer1"], x, 1)
    b = _res_layer(p["layer2"], a, 2)
    c = _res_layer(p["layer3"], b, 2)
    d = _res_layer(p["layer4"], c, 2)
    cat = jnp.concatenate([_resize_bilinear_ac(t, tgt)
                           for t in (a, b, c, d)], axis=1)
    y = jax.nn.relu(_inorm(_conv2d(p["conv2"], cat)))
    return _conv2d(p["conv3"], y)


# ---------------------------------------------------------------------------
# EfficientUpdateFormer
# ---------------------------------------------------------------------------

def _attention(p, x, context, heads):
    """Pre-projected softmax attention; q from x, fused kv from context."""
    B, N1, _ = x.shape
    N2 = context.shape[1]
    q = _lin(p["to_q"], x)
    kv = _lin(p["to_kv"], context)
    k, v = jnp.split(kv, 2, axis=-1)
    Dh = q.shape[-1] // heads
    q = q.reshape(B, N1, heads, Dh).transpose(0, 2, 1, 3)
    k = k.reshape(B, N2, heads, Dh).transpose(0, 2, 1, 3)
    v = v.reshape(B, N2, heads, Dh).transpose(0, 2, 1, 3)
    sim = jnp.einsum("bhid,bhjd->bhij", q, k) * (Dh ** -0.5)
    attn = jax.nn.softmax(sim, axis=-1)
    o = jnp.einsum("bhij,bhjd->bhid", attn, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, N1, heads * Dh)
    return _lin(p["to_out"], o)


def _attn_block(p, x, heads):
    x = x + _attention(p["attn"], _ln(x), _ln(x), heads)
    return x + _mlp(p["mlp"], _ln(x))


def _cross_attn_block(p, x, context, heads):
    x = x + _attention(p["cross_attn"], _ln(x),
                       _ln(context, p["norm_context"], eps=1e-5), heads)
    return x + _mlp(p["mlp"], _ln(x))


def updateformer_forward(cfg: CoTrackerConfig, p: Params,
                         x: jnp.ndarray) -> jnp.ndarray:
    """x: [B, N, T, input_dim] -> delta [B, N, T, 4]."""
    B, N, T, _ = x.shape
    tokens = _lin(p["input_transform"], x)
    virtual = jnp.broadcast_to(
        p["virual_tracks"], (B, cfg.num_virtual_tracks, 1,
                             cfg.hidden_size))
    virtual = jnp.broadcast_to(
        virtual, (B, cfg.num_virtual_tracks, T, cfg.hidden_size))
    tokens = jnp.concatenate([tokens, virtual], axis=1)
    Nv = N + cfg.num_virtual_tracks
    every = cfg.time_depth // cfg.space_depth
    j = 0
    for i in range(cfg.time_depth):
        tt = tokens.reshape(B * Nv, T, cfg.hidden_size)
        tt = _attn_block(p["time_blocks"][str(i)], tt, cfg.num_heads)
        tokens = tt.reshape(B, Nv, T, cfg.hidden_size)
        if i % every == 0 and j < cfg.space_depth:
            st = tokens.transpose(0, 2, 1, 3).reshape(B * T, Nv,
                                                      cfg.hidden_size)
            pts, virt = st[:, :N], st[:, N:]
            virt = _cross_attn_block(
                p["space_virtual2point_blocks"][str(j)], virt, pts,
                cfg.num_heads)
            virt = _attn_block(p["space_virtual_blocks"][str(j)], virt,
                               cfg.num_heads)
            pts = _cross_attn_block(
                p["space_point2virtual_blocks"][str(j)], pts, virt,
                cfg.num_heads)
            st = jnp.concatenate([pts, virt], axis=1)
            tokens = st.reshape(B, T, Nv, cfg.hidden_size).transpose(
                0, 2, 1, 3)
            j += 1
    tokens = tokens[:, :N]
    flow = _lin(p["flow_head"], tokens)
    vis_conf = _lin(p["vis_conf_head"], tokens)
    return jnp.concatenate([flow, vis_conf], axis=-1)


# ---------------------------------------------------------------------------
# Positional encodings (cotracker_base.py:19-66)
# ---------------------------------------------------------------------------

def sincos_time_embed(embed_dim: int, window_len: int) -> np.ndarray:
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega = 1.0 / 10000 ** (omega / (embed_dim / 2.0))
    pos = np.linspace(0, window_len - 1, window_len)
    out = np.einsum("m,d->md", pos, omega)
    return np.concatenate([np.sin(out), np.cos(out)],
                          axis=1)[None].astype(np.float32)


def interpolate_time_embed(table: jnp.ndarray, t: int) -> jnp.ndarray:
    """F.interpolate(mode='linear', align_corners=False) over time."""
    T = table.shape[1]
    if t == T:
        return table
    # half-pixel source coords
    src = (jnp.arange(t, dtype=jnp.float32) + 0.5) * (T / t) - 0.5
    src = jnp.clip(src, 0.0, T - 1.0)
    i0 = jnp.floor(src).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, T - 1)
    f = (src - i0.astype(jnp.float32))[None, :, None]
    return table[:, i0] * (1 - f) + table[:, i1] * f


def posenc(x: jnp.ndarray, min_deg: int, max_deg: int) -> jnp.ndarray:
    scales = jnp.asarray([2 ** i for i in range(min_deg, max_deg)],
                         x.dtype)
    xb = (x[..., None, :] * scales[:, None]).reshape(
        *x.shape[:-1], -1)
    four = jnp.sin(jnp.concatenate([xb, xb + 0.5 * jnp.pi], axis=-1))
    return jnp.concatenate([x, four], axis=-1)


# ---------------------------------------------------------------------------
# Offline forward (cotracker_base.py:191-405)
# ---------------------------------------------------------------------------

def _support_grid(r: int, dtype=jnp.float32):
    """[2r+1, 2r+1, (x, y)] — the FIRST patch axis is the x offset
    (reference get_support_points stacks meshgrid's row output as the
    x component, cotracker_base.py:125-131); the flattened 49*49 corr
    ordering feeds trained corr_mlp weights, so this orientation is
    checkpoint-load-bearing."""
    d = jnp.linspace(-r, r, 2 * r + 1, dtype=dtype)
    gx, gy = jnp.meshgrid(d, d, indexing="ij")
    return jnp.stack([gx, gy], axis=-1)


def cotracker_forward(cfg: CoTrackerConfig, params: Params,
                      video: jnp.ndarray, queries: jnp.ndarray,
                      iters: Optional[int] = None):
    """video: [B,T,3,H,W] uint8-range floats; queries: [B,N,3] (t,x,y)
    in pixels. Returns (coords [B,T,N,2] pixels, vis [B,T,N] prob,
    conf [B,T,N] prob) — the last iteration's predictions
    (cotracker_base.py:405)."""
    B, T, _, H, W = video.shape
    N = queries.shape[1]
    iters = iters or cfg.iters
    r = 2 * cfg.corr_radius + 1
    video = 2 * (video / 255.0) - 1.0
    qframe = queries[..., 0].astype(jnp.int32)          # [B,N]
    qcoord = queries[..., 1:3] / cfg.stride             # [B,N,2]

    fmaps = basic_encoder_forward(
        cfg, params["fnet"], video.reshape(B * T, 3, H, W))
    fmaps = fmaps * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(fmaps ** 2, axis=1, keepdims=True), 1e-12))
    Hf, Wf = fmaps.shape[2], fmaps.shape[3]
    fmaps = fmaps.reshape(B, T, cfg.latent_dim, Hf, Wf)

    # avg-pool pyramid over the normalized maps
    pyramid = [fmaps]
    for _ in range(cfg.corr_levels - 1):
        f = pyramid[-1]
        bt = f.reshape(B * T, cfg.latent_dim, f.shape[-2], f.shape[-1])
        bt = jax.lax.reduce_window(
            bt, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2),
            "VALID") / 4.0
        pyramid.append(bt.reshape(B, T, cfg.latent_dim,
                                  bt.shape[-2], bt.shape[-1]))

    grid = _support_grid(cfg.corr_radius)               # [r,r,2]

    # 7x7 track support features at the query frame, per level.
    # The reference samples (t, x, y) triplets with integer t
    # (cotracker_base.py:139-154); trilinear over integer t is exactly
    # a frame gather, so: gather the query frame, then 2D bilinear.
    support_feats = []
    for i, fm in enumerate(pyramid):
        qf = jnp.take_along_axis(
            fm, qframe[:, :, None, None, None].astype(jnp.int32),
            axis=1)                                      # [B,N,C,Hf,Wf]
        pts = qcoord[:, :, None, None, :] / (2 ** i) + grid  # [B,N,r,r,2]
        feat = jax.vmap(jax.vmap(bilinear_sample))(
            qf, pts)                                     # [B,N,r,r,C]
        support_feats.append(feat)

    coords0 = jnp.broadcast_to(qcoord[:, None], (B, T, N, 2)
                               ).astype(jnp.float32)
    vis0 = jnp.zeros((B, T, N), jnp.float32)
    conf0 = jnp.zeros((B, T, N), jnp.float32)
    scale = jnp.asarray([cfg.model_resolution[1], cfg.model_resolution[0]],
                        jnp.float32) / cfg.stride
    time_emb = interpolate_time_embed(
        jnp.asarray(params["time_emb"]), T)              # [1,T,input_dim]

    def iteration(carry, _):
        coords, vis, conf = carry
        corr_embs = []
        for i, fm in enumerate(pyramid):
            pts = coords[:, :, :, None, None, :] / (2 ** i) + grid
            # [B,T,N,r,r,2] sampled on each frame's map
            feat = jax.vmap(jax.vmap(bilinear_sample))(
                fm, pts)                                 # [B,T,N,r,r,C]
            corr = jnp.einsum("btnhwc,bnijc->btnhwij", feat,
                              support_feats[i])
            emb = _mlp(params["corr_mlp"],
                       corr.reshape(B, T, N, r * r * r * r))
            corr_embs.append(emb)
        corr_embs = jnp.concatenate(corr_embs, axis=-1)  # [B,T,N,4*256]

        fwd = jnp.pad(coords[:, :-1] - coords[:, 1:],
                      ((0, 0), (0, 1), (0, 0), (0, 0))) / scale
        bwd = jnp.pad(coords[:, 1:] - coords[:, :-1],
                      ((0, 0), (1, 0), (0, 0), (0, 0))) / scale
        rel = posenc(jnp.concatenate([fwd, bwd], axis=-1), 0, 10)

        x = jnp.concatenate([vis[..., None], conf[..., None],
                             corr_embs, rel], axis=-1)   # [B,T,N,1110]
        x = x.transpose(0, 2, 1, 3)                      # [B,N,T,D]
        x = x + time_emb[None]
        delta = updateformer_forward(cfg, params["updateformer"], x)
        d_coords = delta[..., :2].transpose(0, 2, 1, 3)
        coords = coords + d_coords
        vis = vis + delta[..., 2].transpose(0, 2, 1)
        conf = conf + delta[..., 3].transpose(0, 2, 1)
        return (coords, vis, conf), None

    (coords, vis, conf), _ = jax.lax.scan(
        iteration, (coords0, vis0, conf0), None, length=iters)
    return (coords * cfg.stride, jax.nn.sigmoid(vis),
            jax.nn.sigmoid(conf))


# ---------------------------------------------------------------------------
# Predictor wrapper (torch-hub CoTrackerPredictor behavior)
# ---------------------------------------------------------------------------

def cotracker_predict(cfg: CoTrackerConfig, params: Params,
                      video: jnp.ndarray, queries: jnp.ndarray,
                      backward_tracking: bool = False,
                      vis_threshold: float = 0.6):
    """The hub wrapper's contract: resize to model_resolution
    (bilinear, align_corners=True), scale queries, track, rescale;
    with ``backward_tracking`` also track the time-reversed video and
    splice in tracks for frames before each query frame. Returns
    (tracks [B,T,N,2] in input pixels, visibility [B,T,N] bool =
    vis*conf > threshold)."""
    B, T, C, H, W = video.shape
    mh, mw = cfg.model_resolution
    v = _resize_bilinear_ac(video.reshape(B * T, C, H, W), (mh, mw))
    v = v.reshape(B, T, C, mh, mw)
    sx = (mw - 1) / max(W - 1, 1)
    sy = (mh - 1) / max(H - 1, 1)
    q = jnp.concatenate(
        [queries[..., :1],
         queries[..., 1:2] * sx, queries[..., 2:3] * sy], axis=-1)

    coords, vis, conf = cotracker_forward(cfg, params, v, q)
    if backward_tracking:
        inv_q = jnp.concatenate(
            [(T - 1) - q[..., :1], q[..., 1:]], axis=-1)
        bcoords, bvis, bconf = cotracker_forward(
            cfg, params, v[:, ::-1], inv_q)
        bcoords, bvis, bconf = (bcoords[:, ::-1], bvis[:, ::-1],
                                bconf[:, ::-1])
        before = (jnp.arange(T)[None, :, None]
                  < q[..., 0].astype(jnp.int32)[:, None, :])
        coords = jnp.where(before[..., None], bcoords, coords)
        vis = jnp.where(before, bvis, vis)
        conf = jnp.where(before, bconf, conf)
    coords = coords / jnp.asarray([sx, sy], coords.dtype)
    return coords, (vis * conf) > vis_threshold


# ---------------------------------------------------------------------------
# Init + checkpoint mapping
# ---------------------------------------------------------------------------

def _init_lin(key, i, o, bias=True):
    k1, k2 = jax.random.split(key)
    p = {"weight": jax.random.normal(k1, (o, i), jnp.float32) * 0.02}
    if bias:
        p["bias"] = jnp.zeros((o,), jnp.float32)
    return p


def _init_conv(key, i, o, k):
    bound = float(np.sqrt(1.0 / (i * k * k)))
    k1, k2 = jax.random.split(key)
    return {"weight": jax.random.uniform(k1, (o, i, k, k), jnp.float32,
                                         -bound, bound),
            "bias": jax.random.uniform(k2, (o,), jnp.float32,
                                       -bound, bound)}


def _init_res_block(key, i, o, stride):
    ks = jax.random.split(key, 3)
    p = {"conv1": _init_conv(ks[0], i, o, 3),
         "conv2": _init_conv(ks[1], o, o, 3)}
    if stride != 1:
        p["downsample"] = _init_conv(ks[2], i, o, 1)
    return p


def _init_res_layer(key, i, o, stride):
    k1, k2 = jax.random.split(key)
    return {"0": _init_res_block(k1, i, o, stride),
            "1": _init_res_block(k2, o, o, 1)}


def _init_attn(key, dim, ctx, heads):
    ks = jax.random.split(key, 3)
    inner = dim  # dim_head*heads == hidden for the checkpoint shapes
    return {"to_q": _init_lin(ks[0], dim, inner),
            "to_kv": _init_lin(ks[1], ctx, 2 * inner),
            "to_out": _init_lin(ks[2], inner, dim)}


def _init_attn_block(key, dim, heads, mlp_ratio):
    ks = jax.random.split(key, 3)
    hid = int(dim * mlp_ratio)
    return {"attn": _init_attn(ks[0], dim, dim, heads),
            "mlp": {"fc1": _init_lin(ks[1], dim, hid),
                    "fc2": _init_lin(ks[2], hid, dim)}}


def _init_cross_block(key, dim, heads, mlp_ratio):
    ks = jax.random.split(key, 3)
    hid = int(dim * mlp_ratio)
    return {"cross_attn": _init_attn(ks[0], dim, dim, heads),
            "norm_context": {"weight": jnp.ones((dim,), jnp.float32),
                             "bias": jnp.zeros((dim,), jnp.float32)},
            "mlp": {"fc1": _init_lin(ks[1], dim, hid),
                    "fc2": _init_lin(ks[2], hid, dim)}}


def init_cotracker(key, cfg: CoTrackerConfig = COTRACKER3_OFFLINE
                   ) -> Params:
    D = cfg.latent_dim
    ks = iter(jax.random.split(key, 64))
    fnet = {
        "conv1": _init_conv(next(ks), 3, D // 2, 7),
        "layer1": _init_res_layer(next(ks), D // 2, D // 2, 1),
        "layer2": _init_res_layer(next(ks), D // 2, D * 3 // 4, 2),
        "layer3": _init_res_layer(next(ks), D * 3 // 4, D, 2),
        "layer4": _init_res_layer(next(ks), D, D, 2),
        "conv2": _init_conv(next(ks), D * 3 + D // 4, D * 2, 3),
        "conv3": _init_conv(next(ks), D * 2, D, 1),
    }
    uf = {
        "input_transform": _init_lin(next(ks), cfg.input_dim,
                                     cfg.hidden_size),
        "flow_head": _init_lin(next(ks), cfg.hidden_size, 2),
        "vis_conf_head": _init_lin(next(ks), cfg.hidden_size, 2),
        "virual_tracks": jax.random.normal(
            next(ks), (1, cfg.num_virtual_tracks, 1, cfg.hidden_size)),
        "time_blocks": {str(i): _init_attn_block(
            next(ks), cfg.hidden_size, cfg.num_heads, cfg.mlp_ratio)
            for i in range(cfg.time_depth)},
        "space_virtual_blocks": {str(i): _init_attn_block(
            next(ks), cfg.hidden_size, cfg.num_heads, cfg.mlp_ratio)
            for i in range(cfg.space_depth)},
        "space_point2virtual_blocks": {str(i): _init_cross_block(
            next(ks), cfg.hidden_size, cfg.num_heads, cfg.mlp_ratio)
            for i in range(cfg.space_depth)},
        "space_virtual2point_blocks": {str(i): _init_cross_block(
            next(ks), cfg.hidden_size, cfg.num_heads, cfg.mlp_ratio)
            for i in range(cfg.space_depth)},
    }
    r = 2 * cfg.corr_radius + 1
    return {
        "fnet": fnet,
        "corr_mlp": {"fc1": _init_lin(next(ks), r * r * r * r,
                                      cfg.corr_mlp_hidden),
                     "fc2": _init_lin(next(ks), cfg.corr_mlp_hidden,
                                      cfg.corr_mlp_out)},
        "updateformer": uf,
        "time_emb": jnp.asarray(
            sincos_time_embed(cfg.input_dim, cfg.window_len)),
    }


def cotracker_from_state_dict(sd: Dict[str, np.ndarray],
                              cfg: CoTrackerConfig = COTRACKER3_OFFLINE
                              ) -> Params:
    """Map the released ``cotracker3_offline`` torch state dict
    (``scaled_offline.pth['model']``; identical names in
    ``cotracker_base.py``) onto this module's param tree."""
    def g(name):
        return jnp.asarray(np.asarray(sd[name]))

    def lin(name):
        p = {"weight": g(name + ".weight")}
        if name + ".bias" in sd:
            p["bias"] = g(name + ".bias")
        return p

    conv = lin

    def res_block(name, stride):
        p = {"conv1": conv(name + ".conv1"), "conv2": conv(name + ".conv2")}
        if stride != 1:
            p["downsample"] = conv(name + ".downsample.0")
        return p

    def res_layer(name, stride):
        return {"0": res_block(name + ".0", stride),
                "1": res_block(name + ".1", 1)}

    def attn(name):
        return {"to_q": lin(name + ".to_q"), "to_kv": lin(name + ".to_kv"),
                "to_out": lin(name + ".to_out")}

    def attn_block(name):
        return {"attn": attn(name + ".attn"),
                "mlp": {"fc1": lin(name + ".mlp.fc1"),
                        "fc2": lin(name + ".mlp.fc2")}}

    def cross_block(name):
        return {"cross_attn": attn(name + ".cross_attn"),
                "norm_context": lin(name + ".norm_context"),
                "mlp": {"fc1": lin(name + ".mlp.fc1"),
                        "fc2": lin(name + ".mlp.fc2")}}

    uf = "updateformer."
    params = {
        "fnet": {
            "conv1": conv("fnet.conv1"),
            "layer1": res_layer("fnet.layer1", 1),
            "layer2": res_layer("fnet.layer2", 2),
            "layer3": res_layer("fnet.layer3", 2),
            "layer4": res_layer("fnet.layer4", 2),
            "conv2": conv("fnet.conv2"),
            "conv3": conv("fnet.conv3"),
        },
        "corr_mlp": {"fc1": lin("corr_mlp.fc1"),
                     "fc2": lin("corr_mlp.fc2")},
        "updateformer": {
            "input_transform": lin(uf + "input_transform"),
            "flow_head": lin(uf + "flow_head"),
            "vis_conf_head": lin(uf + "vis_conf_head"),
            "virual_tracks": g(uf + "virual_tracks"),
            "time_blocks": {
                str(i): attn_block(uf + f"time_blocks.{i}")
                for i in range(cfg.time_depth)},
            "space_virtual_blocks": {
                str(i): attn_block(uf + f"space_virtual_blocks.{i}")
                for i in range(cfg.space_depth)},
            "space_point2virtual_blocks": {
                str(i): cross_block(uf + f"space_point2virtual_blocks.{i}")
                for i in range(cfg.space_depth)},
            "space_virtual2point_blocks": {
                str(i): cross_block(uf + f"space_virtual2point_blocks.{i}")
                for i in range(cfg.space_depth)},
        },
        "time_emb": (g("time_emb") if "time_emb" in sd else jnp.asarray(
            sincos_time_embed(cfg.input_dim, cfg.window_len))),
    }
    return params


def load_cotracker_jax(checkpoint_path: str,
                       cfg: CoTrackerConfig = COTRACKER3_OFFLINE,
                       backward_tracking: bool = False):
    """Load released weights (.pth via torch, or .safetensors) and
    return a ``track(frames, queries)`` callable with the
    ``evaluation/perception.load_cotracker`` contract.
    ``backward_tracking=True`` gives the preprocess step-7 protocol
    (``track_regular_motion_cycle.py:320``)."""
    if checkpoint_path.endswith(".safetensors"):
        from frameino_tpu.models.weights import load_safetensors_dir
        sd = load_safetensors_dir(checkpoint_path)
    else:
        import torch
        sd = torch.load(checkpoint_path, map_location="cpu",
                        weights_only=True)
        if "model" in sd:
            sd = sd["model"]
        sd = {k: v.numpy() for k, v in sd.items()}
    params = cotracker_from_state_dict(sd, cfg)
    return make_tracker_adapter(params, cfg,
                                backward_tracking=backward_tracking)


def make_tracker_adapter(params, cfg: CoTrackerConfig = COTRACKER3_OFFLINE,
                         backward_tracking: bool = False):
    """Wrap a params tree as the ``track(frames, queries)`` perception
    adapter (shared by the released-checkpoint loader and the
    random-init timing benches)."""
    # params as an argument (closure capture would lower ~100 MB of
    # weights as HLO constants — slow remote compiles on the tunnel)
    jfwd = jax.jit(lambda p, v, q: cotracker_predict(
        cfg, p, v, q, backward_tracking=backward_tracking))
    fwd = lambda v, q: jfwd(params, v, q)  # noqa: E731

    def track(frames: np.ndarray, queries: np.ndarray) -> np.ndarray:
        video = jnp.asarray(frames, jnp.float32).transpose(0, 3, 1, 2)[None]
        q = jnp.asarray(
            [[0.0, float(x), float(y)] for (x, y) in queries],
            jnp.float32)[None]
        coords, _ = fwd(video, q)
        return np.asarray(coords[0]).astype(np.int64)

    return track
