"""DINOv2 ViT-B/14 image embedder — JAX reimplementation.

The reference scores identity preservation with DINOv2 loaded from
torch.hub (``evaluation/evaluate_INO_DINO.py:74-80``: cosine similarity
of the CLS embedding of each cropped frame vs the ID reference). This
module rebuilds the DinoVisionTransformer inference graph TPU-native so
the released ``dinov2_vitb14`` checkpoint drops in and the Relative-DINO
metric runs without torch.hub / network access:

  Conv patchify (14x14, stride 14) -> prepend CLS token -> add
  bicubic-interpolated positional embeddings -> 12 pre-norm blocks
  (MHSA + LayerScale, GELU MLP + LayerScale, LN eps 1e-6) -> final LN
  -> CLS token.

Checkpoint facts reproduced exactly:
- the hub checkpoint is trained at 518x518 (37x37 patch grid = 1369
  pos-embed rows + CLS); inference at 224 interpolates the patch
  pos-embeds with torch's ``F.interpolate(mode="bicubic",
  align_corners=False, antialias=False, scale_factor=(
  (h0+0.1)/37, (w0+0.1)/37))`` — the 0.1 ``interpolate_offset`` and the
  given-scale (not out/in ratio) coordinate mapping are weight-level
  facts; ``_torch_bicubic_resize`` reproduces that kernel bit-for-bit
  in numpy (parity-tested against torch) and runs host-side once per
  static input shape,
- LayerScale (``ls1.gamma``/``ls2.gamma``) multiplies each residual
  branch,
- attention is plain softmax MHSA (12 heads, fused qkv, q scaled by
  head_dim**-0.5), MLP is exact-erf GELU.

The torch-side weights are mapped 1:1 by ``dinov2_from_state_dict``
(every checkpoint key consumed; blocks stacked on a leading depth axis
and scanned).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict


@dataclasses.dataclass(frozen=True)
class Dinov2Config:
    img_size: int = 518             # pretrain grid: 518/14 = 37
    patch_size: int = 14
    dim: int = 768
    depth: int = 12
    heads: int = 12
    mlp_ratio: int = 4
    interpolate_offset: float = 0.1
    ln_eps: float = 1e-6

    @property
    def pretrain_grid(self) -> int:
        return self.img_size // self.patch_size


DINOV2_VITB14 = Dinov2Config()
DINOV2_VITS14 = Dinov2Config(dim=384, heads=6)
DINOV2_VITL14 = Dinov2Config(dim=1024, depth=24, heads=16)


def tiny_dinov2_config() -> Dinov2Config:
    return Dinov2Config(img_size=28, patch_size=7, dim=32, depth=2,
                        heads=2, mlp_ratio=2)


# ---------------------------------------------------------------------------
# torch-exact bicubic pos-embed interpolation (host-side numpy)
# ---------------------------------------------------------------------------

def _cubic_weights(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution weights for the 4 taps at offsets
    (-1-t, -t, 1-t, 2-t); torch's upsample uses Keys a=-0.75."""
    def w(x):
        x = np.abs(x)
        return np.where(
            x <= 1.0, ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
            np.where(x < 2.0, (((x - 5.0) * x + 8.0) * x - 4.0) * a, 0.0))
    return np.stack([w(t + 1.0), w(t), w(1.0 - t), w(2.0 - t)], axis=-1)


def _torch_bicubic_resize(arr: np.ndarray, out_hw: Tuple[int, int],
                          scales: Tuple[float, float]) -> np.ndarray:
    """torch ``F.interpolate(mode="bicubic", align_corners=False,
    antialias=False, scale_factor=scales)`` on [H,W,C] float arrays.

    When a scale_factor is given, torch maps ``src = (dst+0.5)/scale
    - 0.5`` with the *provided* scale (not out/in), clamping the 4-tap
    window indices to the border (replicate)."""
    h_in, w_in = arr.shape[:2]
    out = arr.astype(np.float64)

    def resize_axis(a, n_out, n_in, scale):
        dst = np.arange(n_out, dtype=np.float64)
        src = (dst + 0.5) / scale - 0.5
        i0 = np.floor(src).astype(np.int64)
        t = src - i0
        wts = _cubic_weights(t)                              # [n_out, 4]
        idx = np.clip(i0[:, None] + np.arange(-1, 3)[None, :], 0,
                      n_in - 1)                              # [n_out, 4]
        return np.einsum("ot,ot...->o...", wts, a[idx])

    out = resize_axis(out, out_hw[0], h_in, scales[0])       # rows
    out = np.moveaxis(
        resize_axis(np.moveaxis(out, 1, 0), out_hw[1], w_in, scales[1]),
        0, 1)
    return out.astype(arr.dtype)


def interpolate_pos_embed(pos_embed: np.ndarray, grid_hw: Tuple[int, int],
                          cfg: Dinov2Config) -> np.ndarray:
    """[1, 1+M*M, D] raw checkpoint table -> [1, 1+h0*w0, D] for the
    target patch grid (DinoVisionTransformer.interpolate_pos_encoding)."""
    pos_embed = np.asarray(pos_embed, np.float32)
    n_patch = pos_embed.shape[1] - 1
    m = int(round(float(np.sqrt(n_patch))))
    assert m * m == n_patch, n_patch
    h0, w0 = grid_hw
    if (h0, w0) == (m, m):
        return pos_embed
    cls_pe, patch_pe = pos_embed[:, :1], pos_embed[0, 1:]
    sy = (h0 + cfg.interpolate_offset) / m
    sx = (w0 + cfg.interpolate_offset) / m
    grid = _torch_bicubic_resize(
        patch_pe.reshape(m, m, -1), (h0, w0), (sy, sx))
    return np.concatenate(
        [cls_pe, grid.reshape(1, h0 * w0, -1)], axis=1)


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

def init_dinov2(key, cfg: Dinov2Config) -> Params:
    d, hid, p = cfg.dim, cfg.dim * cfg.mlp_ratio, cfg.patch_size
    n = cfg.pretrain_grid ** 2
    ks = jax.random.split(key, 8)

    def nrm(k, shape, scale=0.02):
        return scale * jax.random.normal(k, shape, jnp.float32)

    blocks = {
        "n1w": jnp.ones((cfg.depth, d)), "n1b": jnp.zeros((cfg.depth, d)),
        "qkv_w": nrm(ks[0], (cfg.depth, d, 3 * d)),
        "qkv_b": jnp.zeros((cfg.depth, 3 * d)),
        "proj_w": nrm(ks[1], (cfg.depth, d, d)),
        "proj_b": jnp.zeros((cfg.depth, d)),
        "ls1": jnp.full((cfg.depth, d), 1e-5),
        "n2w": jnp.ones((cfg.depth, d)), "n2b": jnp.zeros((cfg.depth, d)),
        "fc1_w": nrm(ks[2], (cfg.depth, d, hid)),
        "fc1_b": jnp.zeros((cfg.depth, hid)),
        "fc2_w": nrm(ks[3], (cfg.depth, hid, d)),
        "fc2_b": jnp.zeros((cfg.depth, d)),
        "ls2": jnp.full((cfg.depth, d), 1e-5),
    }
    return {
        "patch_w": nrm(ks[4], (p * p * 3, d)),
        "patch_b": jnp.zeros((d,)),
        "cls_token": nrm(ks[5], (1, 1, d)),
        "pos_embed": nrm(ks[6], (1, 1 + n, d)),
        "blocks": blocks,
        "norm_w": jnp.ones((d,)), "norm_b": jnp.zeros((d,)),
    }


def dinov2_from_state_dict(sd: Dict[str, np.ndarray],
                           cfg: Dinov2Config) -> Params:
    """Map the released ``dinov2_vitb14`` state dict (hub
    ``dinov2_vitb14_pretrain.pth``) 1:1; every key is consumed."""
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def take(name):
        return sd.pop(name).astype(np.float32)

    d = cfg.dim
    pw = take("patch_embed.proj.weight")          # [D, 3, p, p]
    params = {
        # patch vector ordering is (c, kh, kw) to match the conv weight
        "patch_w": jnp.asarray(pw.reshape(d, -1).T),
        "patch_b": jnp.asarray(take("patch_embed.proj.bias")),
        "cls_token": jnp.asarray(take("cls_token")),
        "pos_embed": jnp.asarray(take("pos_embed")),
        "norm_w": jnp.asarray(take("norm.weight")),
        "norm_b": jnp.asarray(take("norm.bias")),
    }
    sd.pop("mask_token", None)        # train-time masking only
    sd.pop("register_tokens", None)   # *_reg variants; unused in vitb14

    def stack(fmt, transpose=False):
        leaves = [take(fmt.format(i)) for i in range(cfg.depth)]
        if transpose:
            leaves = [w.T for w in leaves]
        return jnp.asarray(np.stack(leaves))

    params["blocks"] = {
        "n1w": stack("blocks.{}.norm1.weight"),
        "n1b": stack("blocks.{}.norm1.bias"),
        "qkv_w": stack("blocks.{}.attn.qkv.weight", transpose=True),
        "qkv_b": stack("blocks.{}.attn.qkv.bias"),
        "proj_w": stack("blocks.{}.attn.proj.weight", transpose=True),
        "proj_b": stack("blocks.{}.attn.proj.bias"),
        "ls1": stack("blocks.{}.ls1.gamma"),
        "n2w": stack("blocks.{}.norm2.weight"),
        "n2b": stack("blocks.{}.norm2.bias"),
        "fc1_w": stack("blocks.{}.mlp.fc1.weight", transpose=True),
        "fc1_b": stack("blocks.{}.mlp.fc1.bias"),
        "fc2_w": stack("blocks.{}.mlp.fc2.weight", transpose=True),
        "fc2_b": stack("blocks.{}.mlp.fc2.bias"),
        "ls2": stack("blocks.{}.ls2.gamma"),
    }
    assert not sd, f"unconsumed checkpoint keys: {sorted(sd)[:8]}"
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _ln(x, w, b, eps):
    m = x.mean(-1, keepdims=True)
    v = ((x - m) ** 2).mean(-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * w + b


def dinov2_forward(params: Params, x: jnp.ndarray, cfg: Dinov2Config,
                   pos_embed: jnp.ndarray | None = None) -> jnp.ndarray:
    """x [B, H, W, 3] (already ImageNet-normalized) -> CLS embedding
    [B, D]. ``pos_embed`` [1, 1+h0*w0, D] must be pre-interpolated for
    the (static) input grid via ``interpolate_pos_embed``; defaults to
    the raw table when the grid matches the pretrain grid."""
    B, H, W, _ = x.shape
    p = cfg.patch_size
    h0, w0 = H // p, W // p
    # patchify-as-dense: stride==kernel conv is one matmul on the MXU
    patches = x.reshape(B, h0, p, w0, p, 3).transpose(0, 1, 3, 5, 2, 4)
    patches = patches.reshape(B, h0 * w0, 3 * p * p)
    tok = patches @ params["patch_w"] + params["patch_b"]
    tok = jnp.concatenate(
        [jnp.broadcast_to(params["cls_token"], (B, 1, cfg.dim)), tok], 1)
    if pos_embed is None:
        assert h0 * w0 + 1 == params["pos_embed"].shape[1], \
            "grid != pretrain grid: pass interpolate_pos_embed(...) output"
        pos_embed = params["pos_embed"]
    tok = tok + pos_embed

    nh, hd = cfg.heads, cfg.dim // cfg.heads
    scale = hd ** -0.5

    def block(tok, bp):
        h = _ln(tok, bp["n1w"], bp["n1b"], cfg.ln_eps)
        qkv = h @ bp["qkv_w"] + bp["qkv_b"]
        S = tok.shape[1]
        q, k, v = [a.reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
                   for a in jnp.split(qkv, 3, axis=-1)]
        att = jax.nn.softmax((q * scale) @ k.transpose(0, 1, 3, 2), -1)
        o = (att @ v).transpose(0, 2, 1, 3).reshape(B, S, cfg.dim)
        tok = tok + (o @ bp["proj_w"] + bp["proj_b"]) * bp["ls1"]
        h = _ln(tok, bp["n2w"], bp["n2b"], cfg.ln_eps)
        h = jax.nn.gelu(h @ bp["fc1_w"] + bp["fc1_b"], approximate=False)
        tok = tok + (h @ bp["fc2_w"] + bp["fc2_b"]) * bp["ls2"]
        return tok, None

    tok, _ = jax.lax.scan(block, tok, params["blocks"])
    tok = _ln(tok, params["norm_w"], params["norm_b"], cfg.ln_eps)
    return tok[:, 0]


# ---------------------------------------------------------------------------
# Eval-backend adapter (perception.py contract)
# ---------------------------------------------------------------------------

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def load_dinov2_jax(checkpoint_path: str,
                    cfg: Dinov2Config = DINOV2_VITB14,
                    input_size: int = 224):
    """Released-checkpoint embedder: uint8 RGB [H,W,3] -> [D] float.

    Same preprocessing as the reference metric (224 resize, ImageNet
    normalization — ``evaluate_INO_DINO.py:63-71``)."""
    import cv2
    import torch
    sd = torch.load(checkpoint_path, map_location="cpu",
                    weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    params = dinov2_from_state_dict(sd, cfg)
    return make_embedder_adapter(params, cfg, input_size)


def make_embedder_adapter(params, cfg: Dinov2Config = DINOV2_VITB14,
                          input_size: int = 224):
    """Wrap a params tree as the ``embed(image)`` perception adapter
    (shared by the released-checkpoint loader and the random-init
    timing benches)."""
    import cv2
    grid = input_size // cfg.patch_size
    pe = jnp.asarray(interpolate_pos_embed(
        np.asarray(params["pos_embed"]), (grid, grid), cfg))
    fwd = jax.jit(lambda p, x: dinov2_forward(p, x, cfg, pos_embed=pe))

    def embed(image: np.ndarray) -> np.ndarray:
        img = cv2.resize(image, (input_size, input_size))
        img = (img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        return np.asarray(fwd(params, jnp.asarray(img[None])))[0]

    return embed
