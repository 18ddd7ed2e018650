"""Swin Transformer backbone — JAX reimplementation of the reference's
detectron2 variant (``preprocess/oneformer_code/oneformer/modeling/
backbone/swin.py``), the OneFormer Swin-L feature extractor.

Differences from a torch port, for TPU: NHWC end to end, window
partition/reverse as pure reshapes + ``jnp.roll`` (no data-dependent
control flow — one XLA program per image size), relative-position-bias
index precomputed in numpy at trace time, inference-only (no drop path).

Semantics matched exactly (parity-tested in ``tests/test_swin.py``):
- per-block padding of H,W to window multiples before partition
  (``swin.py:252-255``), cyclic shift for odd blocks with the 9-region
  attention mask (``:414-438``);
- PatchMerging: norm BEFORE the bias-free 4C->2C reduction, with odd-
  size padding (``:313-338``);
- stage outputs normed by per-stage ``norm{i}`` layers and returned as
  a {res2..res5} pyramid (``:613-615,669-680``).

``swin_from_state_dict`` maps the torch checkpoint names (the
``backbone.*`` keys of released OneFormer weights) so they drop in.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    patch_size: int = 4
    in_chans: int = 3
    embed_dim: int = 192
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (6, 12, 24, 48)
    window_size: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    layer_norm_eps: float = 1e-5


# OneFormer COCO Swin-L (configs/coco/oneformer_swin_large_*.yaml)
SWIN_L = SwinConfig()


def tiny_swin_config() -> SwinConfig:
    return SwinConfig(embed_dim=16, depths=(2, 2), num_heads=(2, 4),
                      window_size=4)


def _layer_norm(p, x, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _linear(p, x):
    out = x @ p["w"]
    if "b" in p:
        out = out + p["b"]
    return out


def _rel_position_index(window: int) -> np.ndarray:
    """[W*W, W*W] index into the (2W-1)^2 bias table (``swin.py:112-124``)."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))          # [2, W, W]
    cf = coords.reshape(2, -1)
    rel = cf[:, :, None] - cf[:, None, :]                  # [2, WW, WW]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)                                     # [WW, WW]


def _window_attention(p, x, cfg: SwinConfig, num_heads: int,
                      attn_mask=None):
    """x: [nW*B, WW, C]. Scaled qkv attention + relative position bias
    (+ shift mask) (``swin.py:132-173``)."""
    nwb, ww, c = x.shape
    d = c // num_heads
    qkv = _linear(p["qkv"], x).reshape(nwb, ww, 3, num_heads, d)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    attn = (q * (d ** -0.5)) @ k.transpose(0, 1, 3, 2)     # [nwb,h,ww,ww]
    idx = _rel_position_index(cfg.window_size)
    bias = p["rel_bias_table"][idx.reshape(-1)].reshape(ww, ww, num_heads)
    attn = attn + bias.transpose(2, 0, 1)[None]
    if attn_mask is not None:                              # [nW, ww, ww]
        nw = attn_mask.shape[0]
        attn = attn.reshape(nwb // nw, nw, num_heads, ww, ww)
        attn = attn + attn_mask[None, :, None]
        attn = attn.reshape(nwb, num_heads, ww, ww)
    attn = jax.nn.softmax(attn, axis=-1)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(nwb, ww, c)
    return _linear(p["proj"], out)


def _shift_attn_mask(Hp: int, Wp: int, window: int,
                     shift: int) -> np.ndarray:
    """The 9-region SW-MSA mask, additive 0/-100 (``swin.py:414-438``)."""
    img = np.zeros((Hp, Wp))
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift),
               slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift),
                   slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(Hp // window, window, Wp // window, window)
    win = win.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _swin_block(p, x, H: int, W: int, cfg: SwinConfig, num_heads: int,
                shift: int):
    """x: [B, H*W, C] (``swin.py:236-296``)."""
    B, L, C = x.shape
    win = cfg.window_size
    shortcut = x
    x = _layer_norm(p["norm1"], x, cfg.layer_norm_eps).reshape(B, H, W, C)
    pad_b = (win - H % win) % win
    pad_r = (win - W % win) % win
    x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    Hp, Wp = H + pad_b, W + pad_r
    mask = None
    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        mask = jnp.asarray(_shift_attn_mask(Hp, Wp, win, shift))
    # partition -> attention -> reverse
    xw = x.reshape(B, Hp // win, win, Wp // win, win, C)
    xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win * win, C)
    xw = _window_attention(p["attn"], xw, cfg, num_heads, mask)
    x = xw.reshape(B, Hp // win, Wp // win, win, win, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    x = x[:, :H, :W].reshape(B, L, C)
    x = shortcut + x
    h = _layer_norm(p["norm2"], x, cfg.layer_norm_eps)
    h = _linear(p["mlp_fc2"], jax.nn.gelu(_linear(p["mlp_fc1"], h),
                                          approximate=False))
    return x + h


def _patch_merging(p, x, H: int, W: int, eps: float):
    """[B, H*W, C] -> [B, ceil(H/2)*ceil(W/2), 2C] (``swin.py:313-338``)."""
    B, L, C = x.shape
    x = x.reshape(B, H, W, C)
    x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
    x0 = x[:, 0::2, 0::2]
    x1 = x[:, 1::2, 0::2]
    x2 = x[:, 0::2, 1::2]
    x3 = x[:, 1::2, 1::2]
    x = jnp.concatenate([x0, x1, x2, x3], -1).reshape(B, -1, 4 * C)
    x = _layer_norm(p["norm"], x, eps)
    return x @ p["reduction_w"]                            # bias-free


def swin_forward(cfg: SwinConfig, params: Params,
                 image: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """image: [B, H, W, 3] (normalized). Returns {"res2": [B,h,w,C],
    ... "res5"} NHWC feature pyramid (strides 4/8/16/32)."""
    B, H, W, _ = image.shape
    ps = cfg.patch_size
    pad_b = (ps - H % ps) % ps
    pad_r = (ps - W % ps) % ps
    x = jnp.pad(image, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    # patch embed: 4x4 stride-4 conv + layer norm
    x = jax.lax.conv_general_dilated(
        x, params["patch_embed"]["w"], (ps, ps), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x + params["patch_embed"]["b"]
    Wh, Ww = x.shape[1], x.shape[2]
    x = x.reshape(B, Wh * Ww, cfg.embed_dim)
    x = _layer_norm(params["patch_embed"]["norm"], x, cfg.layer_norm_eps)

    outs = {}
    Hc, Wc = Wh, Ww
    for i, depth in enumerate(cfg.depths):
        lp = params[f"layer{i}"]
        for b in range(depth):
            # shift_size = window//2 on odd blocks unconditionally
            # (window > resolution is handled by the padding)
            shift = 0 if b % 2 == 0 else cfg.window_size // 2
            x = _swin_block(lp[f"block{b}"], x, Hc, Wc, cfg,
                            cfg.num_heads[i], shift)
        if i in cfg.out_indices:
            o = _layer_norm(params[f"out_norm{i}"], x, cfg.layer_norm_eps)
            outs[f"res{i + 2}"] = o.reshape(
                B, Hc, Wc, cfg.embed_dim * (2 ** i))
        if i < len(cfg.depths) - 1:
            x = _patch_merging(lp["downsample"], x, Hc, Wc,
                               cfg.layer_norm_eps)
            Hc, Wc = (Hc + 1) // 2, (Wc + 1) // 2
    return outs


# ---------------------------------------------------------------------------
# Init + torch-name weight mapping
# ---------------------------------------------------------------------------

def init_swin(key, cfg: SwinConfig = SWIN_L) -> Params:
    keys = iter(jax.random.split(key, 500))

    def lin(i, o, bias=True):
        p = {"w": 0.05 * jax.random.normal(next(keys), (i, o))}
        if bias:
            p["b"] = jnp.zeros((o,))
        return p

    def ln(c):
        return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}

    params = {"patch_embed": {
        "w": 0.05 * jax.random.normal(
            next(keys), (cfg.patch_size, cfg.patch_size, cfg.in_chans,
                         cfg.embed_dim)),
        "b": jnp.zeros((cfg.embed_dim,)),
        "norm": ln(cfg.embed_dim)}}
    for i, depth in enumerate(cfg.depths):
        c = cfg.embed_dim * (2 ** i)
        lp = {}
        for b in range(depth):
            nb = (2 * cfg.window_size - 1) ** 2
            lp[f"block{b}"] = {
                "norm1": ln(c), "norm2": ln(c),
                "attn": {
                    "qkv": lin(c, 3 * c, cfg.qkv_bias),
                    "proj": lin(c, c),
                    "rel_bias_table": 0.02 * jax.random.normal(
                        next(keys), (nb, cfg.num_heads[i]))},
                "mlp_fc1": lin(c, int(c * cfg.mlp_ratio)),
                "mlp_fc2": lin(int(c * cfg.mlp_ratio), c)}
        if i < len(cfg.depths) - 1:
            lp["downsample"] = {
                "norm": ln(4 * c),
                "reduction_w": 0.05 * jax.random.normal(next(keys),
                                                        (4 * c, 2 * c))}
        params[f"layer{i}"] = lp
        if i in cfg.out_indices:
            params[f"out_norm{i}"] = ln(c)
    return params


def swin_from_state_dict(sd: Dict[str, np.ndarray],
                         cfg: SwinConfig = SWIN_L,
                         prefix: str = "") -> Params:
    """Torch checkpoint names (``patch_embed.proj.*``,
    ``layers.N.blocks.M.*``, ``norm{i}.*``) -> param pytree."""
    g = lambda n: jnp.asarray(np.asarray(sd[prefix + n]))  # noqa: E731

    def lin(name, bias=True):
        p = {"w": g(f"{name}.weight").T}
        if bias and prefix + name + ".bias" in sd:
            p["b"] = g(f"{name}.bias")
        return p

    def ln(name):
        return {"scale": g(f"{name}.weight"), "bias": g(f"{name}.bias")}

    params = {"patch_embed": {
        "w": g("patch_embed.proj.weight").transpose(2, 3, 1, 0),
        "b": g("patch_embed.proj.bias"),
        "norm": ln("patch_embed.norm")}}
    for i, depth in enumerate(cfg.depths):
        lp = {}
        for b in range(depth):
            base = f"layers.{i}.blocks.{b}"
            lp[f"block{b}"] = {
                "norm1": ln(f"{base}.norm1"),
                "norm2": ln(f"{base}.norm2"),
                "attn": {
                    "qkv": lin(f"{base}.attn.qkv"),
                    "proj": lin(f"{base}.attn.proj"),
                    "rel_bias_table":
                        g(f"{base}.attn.relative_position_bias_table")},
                "mlp_fc1": lin(f"{base}.mlp.fc1"),
                "mlp_fc2": lin(f"{base}.mlp.fc2")}
        if i < len(cfg.depths) - 1:
            lp["downsample"] = {
                "norm": ln(f"layers.{i}.downsample.norm"),
                "reduction_w":
                    g(f"layers.{i}.downsample.reduction.weight").T}
        params[f"layer{i}"] = lp
        if i in cfg.out_indices:
            params[f"out_norm{i}"] = ln(f"norm{i}")
    return params
