"""DINOv2 ViT: numeric parity against a hand-built torch mirror with
released-checkpoint parameter names (reference metric drives the hub
``dinov2_vitb14`` model — ``evaluation/evaluate_INO_DINO.py:74-80``)."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from frameino_tpu.models.dinov2 import (DINOV2_VITB14, Dinov2Config,
                                        _torch_bicubic_resize,
                                        dinov2_forward,
                                        dinov2_from_state_dict,
                                        interpolate_pos_embed,
                                        tiny_dinov2_config)


class TAttn(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads, self.scale = heads, (dim // heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, S, D = x.shape
        qkv = self.qkv(x).reshape(B, S, 3, self.heads, D // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
        att = ((q * self.scale) @ k.transpose(-2, -1)).softmax(-1)
        return self.proj((att @ v).transpose(1, 2).reshape(B, S, D))


class TLayerScale(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.gamma = nn.Parameter(torch.randn(dim) * 0.1 + 1.0)

    def forward(self, x):
        return x * self.gamma


class TBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TAttn(dim, heads)
        self.ls1 = TLayerScale(dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(dim, dim * mlp_ratio)
        self.mlp.fc2 = nn.Linear(dim * mlp_ratio, dim)
        self.ls2 = TLayerScale(dim)

    def forward(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
        h = self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
        return x + self.ls2(h)


class TDino(nn.Module):
    """Mirror of DinoVisionTransformer inference (dinov2 repo,
    ``vision_transformer.py``) with checkpoint-native parameter names."""

    def __init__(self, cfg: Dinov2Config):
        super().__init__()
        self.cfg = cfg
        n = cfg.pretrain_grid ** 2
        self.cls_token = nn.Parameter(torch.randn(1, 1, cfg.dim) * 0.1)
        self.pos_embed = nn.Parameter(
            torch.randn(1, 1 + n, cfg.dim) * 0.1)
        self.mask_token = nn.Parameter(torch.zeros(1, cfg.dim))
        self.patch_embed = nn.Sequential()
        self.patch_embed.proj = nn.Conv2d(
            3, cfg.dim, cfg.patch_size, stride=cfg.patch_size)
        self.blocks = nn.ModuleList(
            [TBlock(cfg.dim, cfg.heads, cfg.mlp_ratio)
             for _ in range(cfg.depth)])
        self.norm = nn.LayerNorm(cfg.dim, eps=1e-6)

    def interp_pos(self, h0, w0):
        m = self.cfg.pretrain_grid
        if (h0, w0) == (m, m):
            return self.pos_embed
        pe = self.pos_embed[:, 1:].reshape(1, m, m, -1).permute(0, 3, 1, 2)
        off = self.cfg.interpolate_offset
        pe = F.interpolate(pe, mode="bicubic", antialias=False,
                           scale_factor=((h0 + off) / m, (w0 + off) / m))
        pe = pe.permute(0, 2, 3, 1).reshape(1, h0 * w0, -1)
        return torch.cat([self.pos_embed[:, :1], pe], dim=1)

    def forward(self, x):
        B, _, H, W = x.shape
        p = self.cfg.patch_size
        tok = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        tok = torch.cat([self.cls_token.expand(B, -1, -1), tok], dim=1)
        tok = tok + self.interp_pos(H // p, W // p)
        for blk in self.blocks:
            tok = blk(tok)
        return self.norm(tok)[:, 0]


@pytest.fixture(scope="module")
def tiny_pair():
    torch.manual_seed(0)
    cfg = tiny_dinov2_config()
    tm = TDino(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = dinov2_from_state_dict(dict(sd), cfg)
    return cfg, tm, params, sd


def test_forward_parity_pretrain_grid(tiny_pair):
    cfg, tm, params, _ = tiny_pair
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, cfg.img_size, cfg.img_size, 3),
                            dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(dinov2_forward(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_forward_parity_interpolated_grid(tiny_pair):
    cfg, tm, params, _ = tiny_pair
    rng = np.random.default_rng(2)
    h, w = 3 * cfg.patch_size, 5 * cfg.patch_size
    x = rng.standard_normal((1, h, w, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
    pe = jnp.asarray(interpolate_pos_embed(
        np.asarray(params["pos_embed"]), (3, 5), cfg))
    got = np.asarray(dinov2_forward(params, jnp.asarray(x), cfg,
                                    pos_embed=pe))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_bicubic_matches_torch_interpolate():
    rng = np.random.default_rng(3)
    arr = rng.standard_normal((37, 37, 8), dtype=np.float32)
    for (h0, w0) in [(16, 16), (9, 13), (40, 40)]:
        sy, sx = (h0 + 0.1) / 37, (w0 + 0.1) / 37
        ref = F.interpolate(
            torch.tensor(arr).permute(2, 0, 1)[None], mode="bicubic",
            antialias=False, scale_factor=(sy, sx))[0]
        got = _torch_bicubic_resize(arr, (h0, w0), (sy, sx))
        np.testing.assert_allclose(
            got, ref.permute(1, 2, 0).numpy(), atol=1e-5, rtol=1e-5)


def test_state_dict_fully_consumed(tiny_pair):
    cfg, _, _, sd = tiny_pair
    sd = dict(sd)
    sd["extra.key"] = np.zeros(3)
    with pytest.raises(AssertionError, match="unconsumed"):
        dinov2_from_state_dict(sd, cfg)


def test_full_config_structure():
    cfg = DINOV2_VITB14
    assert cfg.pretrain_grid == 37
    assert cfg.dim // cfg.heads == 64


def test_load_dinov2_jax_adapter(tiny_pair, tmp_path):
    cfg, tm, _, _ = tiny_pair
    path = tmp_path / "dinov2_tiny.pth"
    torch.save(tm.state_dict(), path)
    from frameino_tpu.models.dinov2 import load_dinov2_jax
    embed = load_dinov2_jax(str(path), cfg, input_size=cfg.img_size)
    img = (np.random.default_rng(4)
           .integers(0, 255, (40, 60, 3)).astype(np.uint8))
    v = embed(img)
    assert v.shape == (cfg.dim,)
    assert np.isfinite(v).all()
