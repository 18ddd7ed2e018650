"""VGGT4Track camera estimation — JAX reimplementation of the
reference's step-5 3D camera tracker (``preprocess/SpaTrackV2_code/
models/vggt4track/``; driven by
``preprocess/track_camera_pose_spatracker2.py:35-64``).

Inference graph (``models/vggt_moe.py:30-122``, camera path only — the
curation step consumes extrinsics + intrinsics; the DPT depth head only
feeds the unused points map):

  DINOv2 ViT-L/14-reg patch embed (``layers/vision_transformer.py``)
  -> Aggregator: 24 alternating frame/global attention pairs over
     [camera; 4 registers; patches] tokens with per-head qk LayerNorm,
     LayerScale, and 2D half-split RoPE (freq 100) on patch tokens
     (``models/aggregator.py``)
  -> CameraHead: 4-iteration AdaLN-modulated trunk refining a 9-dim
     absT_quaR_FoV encoding (``heads/camera_head.py``)
  -> pose_encoding_to_extri_intri + matrix inverse -> camera-to-world
     poses + pixel intrinsics (``utils/pose_enc.py:65-130``).

``vggt_from_state_dict`` maps the released VGGT4Track checkpoint names
so public weights drop in; numerics are parity-tested against a
hand-built torch mirror (``tests/test_vggt.py``). The adapter at the
bottom emits the SpaTrackV2 ``camera_info`` dict that
``preprocess/camera_pose.calculate_camera_motion`` scores directly.

TPU notes: the 23 leading aggregator pairs run as one ``lax.scan`` over
stacked params (the last pair runs unstacked because only ITS frame+
global intermediates feed the camera head); attention uses the shared
flash kernel on TPU; static shapes per (S, H, W).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict


@dataclasses.dataclass(frozen=True)
class VGGTConfig:
    img_size: int = 518
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24               # aggregator frame/global pairs
    num_heads: int = 16
    vit_depth: int = 24           # DINOv2 patch-embed ViT
    vit_heads: int = 16
    num_register_tokens: int = 4  # both the ViT's and the aggregator's
    mlp_ratio: float = 4.0
    rope_freq: float = 100.0
    cam_trunk_depth: int = 4
    cam_iterations: int = 4
    eps: float = 1e-6


VGGT_1B = VGGTConfig()


def tiny_vggt_config() -> VGGTConfig:
    return VGGTConfig(img_size=8, patch_size=2, embed_dim=16, depth=2,
                      num_heads=2, vit_depth=2, vit_heads=2,
                      num_register_tokens=1, cam_trunk_depth=2,
                      cam_iterations=2)


RESNET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
RESNET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _ln(p, x, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    out = (x - mu) * jax.lax.rsqrt(var + eps)
    if p is not None:
        out = out * p["scale"] + p["bias"]
    return out


def _lin(p, x):
    out = x @ p["w"]
    if "b" in p:
        out = out + p["b"]
    return out


def _mlp(p, x):
    return _lin(p["fc2"], jax.nn.gelu(_lin(p["fc1"], x),
                                      approximate=False))


def _attention(p, x, nheads: int, rope=None, eps=1e-6,
               qk_norm: bool = False):
    """timm/DINOv2 Attention (``layers/attention.py:20-86``). x:
    [B, N, C]; rope: (cos, sin) [N, head_dim/2] or None."""
    B, N, C = x.shape
    d = C // nheads
    qkv = _lin(p["qkv"], x).reshape(B, N, 3, nheads, d)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    if qk_norm:
        q = _ln(p["q_norm"], q, eps)
        k = _ln(p["k_norm"], k, eps)
    if rope is not None:
        q = _rope2d_apply(q, *rope)
        k = _rope2d_apply(k, *rope)
    from frameino_tpu.ops.attention import attention
    o = attention(q.astype(x.dtype), k.astype(x.dtype),
                  v.astype(x.dtype))
    return _lin(p["proj"], o.transpose(0, 2, 1, 3).reshape(B, N, C))


def _block(p, x, nheads: int, rope=None, qk_norm=False, eps=1e-6):
    """Pre-norm block with LayerScale (``layers/block.py:27-110``)."""
    h = _attention(p["attn"], _ln(p["norm1"], x, eps), nheads,
                   rope=rope, eps=eps, qk_norm=qk_norm)
    if "ls1" in p:
        h = h * p["ls1"]
    x = x + h
    h = _mlp(p["mlp"], _ln(p["norm2"], x, eps))
    if "ls2" in p:
        h = h * p["ls2"]
    return x + h


# ---------------------------------------------------------------------------
# 2D RoPE (``layers/rope.py``): half-split (NeoX-style) rotation per
# spatial axis — vertical on the first feature half, horizontal second.
# ---------------------------------------------------------------------------

def rope2d_tables(head_dim: int, gh: int, gw: int, n_special: int,
                  freq: float = 100.0) -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin [n_special + gh*gw, head_dim/2] for the token layout
    [special(pos 0); patches(pos 1..)]; each axis uses head_dim/2 dims
    with angles duplicated (cat(angles, angles), ``rope.py:100-117``)."""
    dim = head_dim // 2                    # per-axis feature dim
    exponents = np.arange(0, dim, 2, dtype=np.float64) / dim
    inv_freq = 1.0 / (freq ** exponents)

    ys, xs = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    # special tokens sit at position 0; patches at coord+1
    pos_y = np.concatenate([np.zeros(n_special), ys.ravel() + 1])
    pos_x = np.concatenate([np.zeros(n_special), xs.ravel() + 1])

    def tab(pos):
        ang = pos[:, None] * inv_freq[None, :]
        ang = np.concatenate([ang, ang], axis=-1)      # [N, dim]
        return np.cos(ang), np.sin(ang)

    (cy, sy), (cx, sx) = tab(pos_y), tab(pos_x)
    return (np.concatenate([cy, cx], -1).astype(np.float32),
            np.concatenate([sy, sx], -1).astype(np.float32))


def _rotate_half(x):
    d = x.shape[-1]
    return jnp.concatenate([-x[..., d // 2:], x[..., :d // 2]], axis=-1)


def _rope2d_apply(x, cos, sin):
    """x: [B, H, N, D]; cos/sin [N, D/2] tables laid out
    [vertical-half, horizontal-half] matching the feature split."""
    D = x.shape[-1]
    half = cos.shape[-1] // 2
    cv, sv = cos[:, :half], sin[:, :half]
    ch, sh = cos[:, half:], sin[:, half:]
    xf = x.astype(jnp.float32)
    xv, xh = xf[..., :D // 2], xf[..., D // 2:]
    ov = xv * cv + _rotate_half(xv) * sv
    oh = xh * ch + _rotate_half(xh) * sh
    return jnp.concatenate([ov, oh], axis=-1).astype(x.dtype)


# ---------------------------------------------------------------------------
# DINOv2 patch embed ViT
# ---------------------------------------------------------------------------

def dino_vit_forward(cfg: VGGTConfig, p: Params,
                     images: jnp.ndarray) -> jnp.ndarray:
    """images: [N, H, W, 3] (resnet-normalized). Returns
    x_norm_patchtokens [N, gh*gw, C]
    (``layers/vision_transformer.py:217-261``)."""
    N, H, W, _ = images.shape
    ps = cfg.patch_size
    x = jax.lax.conv_general_dilated(
        images, p["proj"]["w"], (ps, ps), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["proj"]["b"]
    gh, gw = x.shape[1], x.shape[2]
    x = x.reshape(N, gh * gw, cfg.embed_dim)
    cls = jnp.broadcast_to(p["cls_token"], (N, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + _interp_pos_embed(p["pos_embed"], gh, gw)
    if cfg.num_register_tokens:
        reg = jnp.broadcast_to(
            p["register_tokens"],
            (N, cfg.num_register_tokens, cfg.embed_dim))
        x = jnp.concatenate([x[:, :1], reg, x[:, 1:]], axis=1)
    for i in range(cfg.vit_depth):
        x = _block(p[f"block{i}"], x, cfg.vit_heads)
    x = _ln(p["norm"], x)
    return x[:, cfg.num_register_tokens + 1:]


def _interp_pos_embed(pos_embed, gh: int, gw: int):
    """Bicubic pos-embed interpolation, interpolate_offset=0 ->
    size-based resize, antialias like the reference config
    (``vision_transformer.py:183-215``)."""
    n = pos_embed.shape[1] - 1
    m = int(math.sqrt(n))
    if gh == gw == m:
        return pos_embed
    cls_pe = pos_embed[:, :1]
    patch = pos_embed[:, 1:].reshape(1, m, m, -1)
    patch = jax.image.resize(patch, (1, gh, gw, patch.shape[-1]),
                             method="cubic")
    return jnp.concatenate([cls_pe, patch.reshape(1, gh * gw, -1)],
                           axis=1)


# ---------------------------------------------------------------------------
# Aggregator
# ---------------------------------------------------------------------------

def _slice_expand(token, S):
    """(1, 2, X, C) -> (S, X, C): first-frame variant at index 0, the
    rest-frames variant for frames 1..S-1 (``aggregator.py:316-337``)."""
    first = token[:, 0]
    rest = jnp.broadcast_to(token[:, 1],
                            (S - 1,) + token.shape[2:]) if S > 1 else \
        token[:, 1][:0]
    return jnp.concatenate([first, rest], axis=0)


def _agg_pair(cfg, fp, gp, tokens, rope, B, S, P, C):
    """One frame-attention + global-attention pair. tokens [B,S,P,C]."""
    t = tokens.reshape(B * S, P, C)
    t = _block(fp, t, cfg.num_heads, rope=rope, qk_norm=True,
               eps=cfg.eps)
    frame_out = t.reshape(B, S, P, C)
    cos, sin = rope
    rope_g = (jnp.tile(cos, (S, 1)), jnp.tile(sin, (S, 1)))
    t = frame_out.reshape(B, S * P, C)
    t = _block(gp, t, cfg.num_heads, rope=rope_g, qk_norm=True,
               eps=cfg.eps)
    global_out = t.reshape(B, S, P, C)
    return frame_out, global_out


def aggregator_forward(cfg: VGGTConfig, p: Params,
                       images: jnp.ndarray) -> jnp.ndarray:
    """images: [B, S, H, W, 3] in [0, 1]. Returns the camera head's
    input: cat([frame_out, global_out], -1)[..., token 0, :] of the
    LAST pair — [B, S, 2C] (``aggregator.py:188-290``)."""
    B, S, H, W, _ = images.shape
    x = (images - RESNET_MEAN) / RESNET_STD
    patch_tokens = dino_vit_forward(cfg, p["patch_embed"],
                                    x.reshape(B * S, H, W, 3))
    Pp = patch_tokens.shape[1]
    cam = _slice_expand(p["camera_token"], S)
    reg = _slice_expand(p["register_token"], S)
    special = jnp.concatenate([cam, reg], axis=1)       # [S, 1+R, C]
    special = jnp.broadcast_to(special[None], (B,) + special.shape) \
        .reshape(B * S, -1, cfg.embed_dim)
    tokens = jnp.concatenate([special, patch_tokens], axis=1)
    P = tokens.shape[1]
    C = cfg.embed_dim
    n_special = 1 + cfg.num_register_tokens

    gh, gw = H // cfg.patch_size, W // cfg.patch_size
    cos_np, sin_np = rope2d_tables(C // cfg.num_heads, gh, gw,
                                   n_special, cfg.rope_freq)
    rope = (jnp.asarray(cos_np), jnp.asarray(sin_np))

    tokens = tokens.reshape(B, S, P, C)
    if cfg.depth > 1 and "frame_stack" in p:
        def body(carry, lp):
            f, g = _agg_pair(cfg, lp["frame"], lp["global"], carry,
                             rope, B, S, P, C)
            return g, None
        tokens, _ = jax.lax.scan(
            body, tokens, {"frame": p["frame_stack"],
                           "global": p["global_stack"]})
    else:
        for i in range(cfg.depth - 1):
            _, tokens = _agg_pair(cfg, p[f"frame{i}"], p[f"global{i}"],
                                  tokens, rope, B, S, P, C)
    last = cfg.depth - 1
    frame_out, global_out = _agg_pair(cfg, p[f"frame{last}"],
                                      p[f"global{last}"], tokens, rope,
                                      B, S, P, C)
    cat = jnp.concatenate([frame_out, global_out], axis=-1)
    return cat[:, :, 0]                                 # camera tokens


# ---------------------------------------------------------------------------
# Camera head
# ---------------------------------------------------------------------------

def camera_head_forward(cfg: VGGTConfig, p: Params,
                        pose_tokens: jnp.ndarray) -> jnp.ndarray:
    """pose_tokens: [B, S, 2C]. Returns the final activated pose
    encoding [B, S, 9] (``heads/camera_head.py:85-160``)."""
    t = _ln(p["token_norm"], pose_tokens, 1e-5)
    pred = None
    for _ in range(cfg.cam_iterations):
        inp = (jnp.broadcast_to(p["empty_pose_tokens"],
                                t.shape[:2] + (9,))
               if pred is None else pred)
        mod = _lin(p["poseLN_modulation"], jax.nn.silu(
            _lin(p["embed_pose"], inp)))
        shift, scale, gate = jnp.split(mod, 3, axis=-1)
        h = gate * (_ln(None, t, 1e-6) * (1 + scale) + shift) + t
        for i in range(cfg.cam_trunk_depth):
            h = _block(p[f"trunk{i}"], h, cfg.num_heads, eps=1e-6)
        delta = _lin(p["pose_branch"]["fc2"], jax.nn.gelu(
            _lin(p["pose_branch"]["fc1"],
                 _ln(p["trunk_norm"], h, 1e-5)), approximate=False))
        pred = delta if pred is None else pred + delta
    # activate_pose: trans/quat linear, fov relu (``head_act.py``)
    return jnp.concatenate([pred[..., :7],
                            jax.nn.relu(pred[..., 7:])], axis=-1)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """XYZW (scalar-last) quaternion -> rotation matrix
    (``utils/rotation.py:14-44``)."""
    i, j, k, r = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / (q * q).sum(-1)
    o = jnp.stack([
        1 - two_s * (j * j + k * k), two_s * (i * j - k * r),
        two_s * (i * k + j * r),
        two_s * (i * j + k * r), 1 - two_s * (i * i + k * k),
        two_s * (j * k - i * r),
        two_s * (i * k - j * r), two_s * (j * k + i * r),
        1 - two_s * (i * i + j * j)], axis=-1)
    return o.reshape(q.shape[:-1] + (3, 3))


def pose_encoding_to_extri_intri(pose_enc: jnp.ndarray, hw):
    """[..., 9] absT_quaR_FoV -> (extrinsics [...,3,4] camera-from-
    world, intrinsics [...,3,3]) (``utils/pose_enc.py:65-130``)."""
    T = pose_enc[..., :3]
    quat = pose_enc[..., 3:7]
    fov_h, fov_w = pose_enc[..., 7], pose_enc[..., 8]
    R = quat_to_mat(quat)
    extr = jnp.concatenate([R, T[..., None]], axis=-1)
    H, W = hw
    fy = (H / 2.0) / jnp.tan(fov_h / 2.0)
    fx = (W / 2.0) / jnp.tan(fov_w / 2.0)
    z = jnp.zeros_like(fx)
    o = jnp.ones_like(fx)
    intr = jnp.stack([
        jnp.stack([fx, z, jnp.full_like(fx, W / 2.0)], -1),
        jnp.stack([z, fy, jnp.full_like(fy, H / 2.0)], -1),
        jnp.stack([z, z, o], -1)], axis=-2)
    return extr, intr


def vggt_camera_forward(cfg: VGGTConfig, params: Params,
                        images: jnp.ndarray):
    """images: [B, S, H, W, 3] in [0, 1] (preprocessed to /14 dims).
    Returns (poses_c2w [B,S,4,4], intrinsics [B,S,3,3]) — the
    reference's ``poses_pred``/``intrs`` (``vggt_moe.py:90-96``)."""
    pose_tokens = aggregator_forward(cfg, params["aggregator"], images)
    pose_enc = camera_head_forward(cfg, params["camera_head"],
                                   pose_tokens)
    H, W = images.shape[2], images.shape[3]
    extr, intr = pose_encoding_to_extri_intri(pose_enc, (H, W))
    B, S = extr.shape[:2]
    bottom = jnp.tile(jnp.asarray([0.0, 0, 0, 1]), (B, S, 1, 1))
    w2c = jnp.concatenate([extr, bottom], axis=-2)
    return jnp.linalg.inv(w2c), intr


# ---------------------------------------------------------------------------
# Init + torch-name weight mapping
# ---------------------------------------------------------------------------

def _init_block(keys, C, heads, mlp_ratio, ls_init, qk_norm):
    d = C // heads

    def lin(i, o):
        return {"w": 0.05 * jax.random.normal(next(keys), (i, o)),
                "b": jnp.zeros((o,))}

    def ln(c):
        return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}

    p = {"norm1": ln(C), "norm2": ln(C),
         "attn": {"qkv": lin(C, 3 * C), "proj": lin(C, C)},
         "mlp": {"fc1": lin(C, int(C * mlp_ratio)),
                 "fc2": lin(int(C * mlp_ratio), C)},
         "ls1": ls_init * jnp.ones((C,)),
         "ls2": ls_init * jnp.ones((C,))}
    if qk_norm:
        p["attn"]["q_norm"] = ln(d)
        p["attn"]["k_norm"] = ln(d)
    return p


def init_vggt(key, cfg: VGGTConfig = VGGT_1B) -> Params:
    keys = iter(jax.random.split(key, 2000))
    C = cfg.embed_dim

    def lin(i, o):
        return {"w": 0.05 * jax.random.normal(next(keys), (i, o)),
                "b": jnp.zeros((o,))}

    def ln(c=C):
        return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}

    n_patches = (cfg.img_size // cfg.patch_size) ** 2
    vit = {"proj": {"w": 0.05 * jax.random.normal(
                        next(keys), (cfg.patch_size, cfg.patch_size, 3,
                                     C)),
                    "b": jnp.zeros((C,))},
           "cls_token": 1e-3 * jax.random.normal(next(keys), (1, 1, C)),
           "pos_embed": 0.02 * jax.random.normal(
               next(keys), (1, n_patches + 1, C)),
           "register_tokens": 1e-3 * jax.random.normal(
               next(keys), (1, cfg.num_register_tokens, C)),
           "norm": ln()}
    for i in range(cfg.vit_depth):
        vit[f"block{i}"] = _init_block(keys, C, cfg.vit_heads,
                                       cfg.mlp_ratio, 1.0, False)

    agg = {"patch_embed": vit,
           "camera_token": 1e-3 * jax.random.normal(next(keys),
                                                    (1, 2, 1, C)),
           "register_token": 1e-3 * jax.random.normal(
               next(keys), (1, 2, cfg.num_register_tokens, C))}
    for i in range(cfg.depth):
        agg[f"frame{i}"] = _init_block(keys, C, cfg.num_heads,
                                       cfg.mlp_ratio, 0.01, True)
        agg[f"global{i}"] = _init_block(keys, C, cfg.num_heads,
                                        cfg.mlp_ratio, 0.01, True)

    C2 = 2 * C
    cam = {"token_norm": ln(C2), "trunk_norm": ln(C2),
           "empty_pose_tokens": jnp.zeros((1, 1, 9)),
           "embed_pose": lin(9, C2),
           "poseLN_modulation": lin(C2, 3 * C2),
           "pose_branch": {"fc1": lin(C2, C2 // 2),
                           "fc2": lin(C2 // 2, 9)}}
    for i in range(cfg.cam_trunk_depth):
        cam[f"trunk{i}"] = _init_block(keys, C2, cfg.num_heads,
                                       cfg.mlp_ratio, 0.01, False)
    return {"aggregator": agg, "camera_head": cam}


def _t_lin(g, name):
    return {"w": g(f"{name}.weight").T, "b": g(f"{name}.bias")}


def _t_ln(g, name):
    return {"scale": g(f"{name}.weight"), "bias": g(f"{name}.bias")}


def _t_block(g, name, qk_norm):
    p = {"norm1": _t_ln(g, f"{name}.norm1"),
         "norm2": _t_ln(g, f"{name}.norm2"),
         "attn": {"qkv": _t_lin(g, f"{name}.attn.qkv"),
                  "proj": _t_lin(g, f"{name}.attn.proj")},
         "mlp": {"fc1": _t_lin(g, f"{name}.mlp.fc1"),
                 "fc2": _t_lin(g, f"{name}.mlp.fc2")},
         "ls1": g(f"{name}.ls1.gamma"),
         "ls2": g(f"{name}.ls2.gamma")}
    if qk_norm:
        p["attn"]["q_norm"] = _t_ln(g, f"{name}.attn.q_norm")
        p["attn"]["k_norm"] = _t_ln(g, f"{name}.attn.k_norm")
    return p


def vggt_from_state_dict(sd: Dict[str, np.ndarray],
                         cfg: VGGTConfig = VGGT_1B) -> Params:
    """Released VGGT4Track checkpoint names -> param pytree. The depth
    head (DPT) and any track-head weights are ignored — only the camera
    path is needed for curation. The aggregator's 23 leading pairs are
    stacked for lax.scan."""
    g = lambda n: jnp.asarray(np.asarray(sd[n]))  # noqa: E731

    A = "aggregator"
    vit = {"proj": {"w": g(f"{A}.patch_embed.patch_embed.proj.weight")
                    .transpose(2, 3, 1, 0),
                    "b": g(f"{A}.patch_embed.patch_embed.proj.bias")},
           "cls_token": g(f"{A}.patch_embed.cls_token"),
           "pos_embed": g(f"{A}.patch_embed.pos_embed"),
           "register_tokens": g(f"{A}.patch_embed.register_tokens"),
           "norm": _t_ln(g, f"{A}.patch_embed.norm")}
    for i in range(cfg.vit_depth):
        vit[f"block{i}"] = _t_block(g, f"{A}.patch_embed.blocks.{i}",
                                    False)

    agg = {"patch_embed": vit,
           "camera_token": g(f"{A}.camera_token"),
           "register_token": g(f"{A}.register_token")}
    for i in range(cfg.depth):
        agg[f"frame{i}"] = _t_block(g, f"{A}.frame_blocks.{i}", True)
        agg[f"global{i}"] = _t_block(g, f"{A}.global_blocks.{i}", True)
    if cfg.depth > 1:
        agg["frame_stack"] = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[agg.pop(f"frame{i}") for i in range(cfg.depth - 1)])
        agg["global_stack"] = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[agg.pop(f"global{i}") for i in range(cfg.depth - 1)])

    CH = "camera_head"
    cam = {"token_norm": _t_ln(g, f"{CH}.token_norm"),
           "trunk_norm": _t_ln(g, f"{CH}.trunk_norm"),
           "empty_pose_tokens": g(f"{CH}.empty_pose_tokens"),
           "embed_pose": _t_lin(g, f"{CH}.embed_pose"),
           "poseLN_modulation": _t_lin(g, f"{CH}.poseLN_modulation.1"),
           "pose_branch": {"fc1": _t_lin(g, f"{CH}.pose_branch.fc1"),
                           "fc2": _t_lin(g, f"{CH}.pose_branch.fc2")}}
    for i in range(cfg.cam_trunk_depth):
        cam[f"trunk{i}"] = _t_block(g, f"{CH}.trunk.{i}", False)
    return {"aggregator": agg, "camera_head": cam}


# ---------------------------------------------------------------------------
# Curation adapter
# ---------------------------------------------------------------------------

def preprocess_frames(frames: np.ndarray, target: int = 518
                      ) -> np.ndarray:
    """uint8 [T, H, W, 3] -> float [T, H', W', 3] in [0,1], crop mode:
    width -> target (x14), height scaled (x14) then center-cropped to
    <= target (``utils/load_fn.py:148-220``)."""
    import cv2
    T, H, W = frames.shape[:3]
    new_w = target
    new_h = round(H * (new_w / W) / 14) * 14
    out = np.stack([cv2.resize(f, (new_w, new_h),
                               interpolation=cv2.INTER_CUBIC)
                    for f in frames])
    if new_h > target:
        start = (new_h - target) // 2
        out = out[:, start:start + target]
    return out.astype(np.float32) / 255.0


def load_vggt_camera(checkpoint_path: str,
                     cfg: VGGTConfig = VGGT_1B):
    """Released VGGT4Track weights (.pt/.safetensors) -> a
    ``camera_estimator(frames_uint8) -> camera_info`` callable emitting
    the SpaTrackV2 dict (rotation/translation/focal_x/focal_y) that
    ``preprocess.camera_pose.calculate_camera_motion`` scores
    (``track_camera_pose_spatracker2.py:46-70``)."""
    if checkpoint_path.endswith(".safetensors"):
        from frameino_tpu.models.weights import load_safetensors_dir
        sd = load_safetensors_dir(checkpoint_path)
    else:
        import torch
        ckpt = torch.load(checkpoint_path, map_location="cpu",
                          weights_only=False)
        for key in ("model", "state_dict"):
            if isinstance(ckpt, dict) and key in ckpt:
                ckpt = ckpt[key]
                break
        sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
              for k, v in ckpt.items()}
    params = vggt_from_state_dict(sd, cfg)
    # params as an argument — closure capture would embed the 1B-param
    # tree as HLO constants (GBs of program text; breaks the tunneled
    # remote compile and bloats compile memory everywhere)
    jfwd = jax.jit(lambda p, im: vggt_camera_forward(cfg, p, im))
    fwd = lambda im: jfwd(params, im)  # noqa: E731

    def estimate(frames: np.ndarray) -> Dict:
        imgs = preprocess_frames(frames)[None]          # [1,S,H,W,3]
        poses, intrs = fwd(jnp.asarray(imgs))
        poses = np.asarray(poses[0])
        intrs = np.asarray(intrs[0])
        return {"rotation": poses[:, :3, :3].tolist(),
                "translation": poses[:, :3, 3].tolist(),
                "focal_x": intrs[:, 0, 0].tolist(),
                "focal_y": intrs[:, 1, 1].tolist()}

    return estimate
