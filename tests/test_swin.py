"""Swin backbone JAX model: numeric parity against a hand-built torch
mirror with the checkpoint's parameter names (reference
``oneformer_code/oneformer/modeling/backbone/swin.py``)."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from frameino_tpu.models.swin import (SwinConfig, init_swin, swin_forward,
                                      swin_from_state_dict,
                                      tiny_swin_config)


# --- torch mirror (checkpoint-shaped) -------------------------------------

class WindowAttention(nn.Module):
    def __init__(self, dim, window, heads):
        super().__init__()
        self.dim, self.window, self.heads = dim, window, heads
        self.scale = (dim // heads) ** -0.5
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * window - 1) ** 2, heads))
        coords = torch.stack(torch.meshgrid(
            torch.arange(window), torch.arange(window), indexing="ij"))
        cf = coords.flatten(1)
        rel = (cf[:, :, None] - cf[:, None, :]).permute(1, 2, 0)
        rel[:, :, 0] += window - 1
        rel[:, :, 1] += window - 1
        rel[:, :, 0] *= 2 * window - 1
        self.register_buffer("relative_position_index", rel.sum(-1))
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, mask=None):
        B_, N, C = x.shape
        qkv = self.qkv(x).reshape(B_, N, 3, self.heads,
                                  C // self.heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * self.scale, qkv[1], qkv[2]
        attn = q @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(N, N, -1)
        attn = attn + bias.permute(2, 0, 1).unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(B_ // nW, nW, self.heads, N, N) \
                + mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.heads, N, N)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B_, N, C)
        return self.proj(x)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


def window_partition(x, ws):
    B, H, W, C = x.shape
    x = x.view(B, H // ws, ws, W // ws, ws, C)
    return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(-1, ws, ws, C)


def window_reverse(win, ws, H, W):
    B = int(win.shape[0] / (H * W / ws / ws))
    x = win.view(B, H // ws, W // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(B, H, W, -1)


class SwinBlock(nn.Module):
    def __init__(self, dim, heads, window, shift, mlp_ratio=4.0):
        super().__init__()
        self.window, self.shift = window, shift
        self.norm1 = nn.LayerNorm(dim)
        self.attn = WindowAttention(dim, window, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def forward(self, x, H, W, attn_mask):
        B, L, C = x.shape
        shortcut = x
        x = self.norm1(x).view(B, H, W, C)
        pad_r = (self.window - W % self.window) % self.window
        pad_b = (self.window - H % self.window) % self.window
        x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
        _, Hp, Wp, _ = x.shape
        if self.shift > 0:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
            mask = attn_mask
        else:
            mask = None
        xw = window_partition(x, self.window).view(
            -1, self.window * self.window, C)
        xw = self.attn(xw, mask)
        x = window_reverse(xw.view(-1, self.window, self.window, C),
                           self.window, Hp, Wp)
        if self.shift > 0:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        x = x[:, :H, :W].contiguous().view(B, L, C)
        x = shortcut + x
        return x + self.mlp(self.norm2(x))


class PatchMerging(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(4 * dim)

    def forward(self, x, H, W):
        B, L, C = x.shape
        x = x.view(B, H, W, C)
        x = F.pad(x, (0, 0, 0, W % 2, 0, H % 2))
        x = torch.cat([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                       x[:, 0::2, 1::2], x[:, 1::2, 1::2]], -1)
        x = x.view(B, -1, 4 * C)
        return self.reduction(self.norm(x))


class PatchEmbed(nn.Module):
    def __init__(self, ps, cin, dim):
        super().__init__()
        self.proj = nn.Conv2d(cin, dim, ps, ps)
        self.norm = nn.LayerNorm(dim)


def _attn_mask(Hp, Wp, window, shift):
    img = torch.zeros(1, Hp, Wp, 1)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift),
               slice(-shift, None)):
        for ws_ in (slice(0, -window), slice(-window, -shift),
                    slice(-shift, None)):
            img[:, hs, ws_, :] = cnt
            cnt += 1
    mw = window_partition(img, window).view(-1, window * window)
    m = mw.unsqueeze(1) - mw.unsqueeze(2)
    return m.masked_fill(m != 0, -100.0).masked_fill(m == 0, 0.0)


class TorchSwin(nn.Module):
    """Checkpoint-named mirror: layers.N.blocks.M.*, norm{i}.*."""

    def __init__(self, cfg: SwinConfig):
        super().__init__()
        self.cfg = cfg
        self.patch_embed = PatchEmbed(cfg.patch_size, cfg.in_chans,
                                      cfg.embed_dim)
        self.layers = nn.ModuleList()
        for i, depth in enumerate(cfg.depths):
            dim = cfg.embed_dim * 2 ** i
            stage = nn.Module()
            stage.blocks = nn.ModuleList([
                SwinBlock(dim, cfg.num_heads[i], cfg.window_size,
                          0 if b % 2 == 0 else cfg.window_size // 2,
                          cfg.mlp_ratio)
                for b in range(depth)])
            if i < len(cfg.depths) - 1:
                stage.downsample = PatchMerging(dim)
            self.layers.append(stage)
        for i in cfg.out_indices:
            self.add_module(f"norm{i}",
                            nn.LayerNorm(cfg.embed_dim * 2 ** i))

    def forward(self, img):                 # [B, 3, H, W]
        # reference PatchEmbed pads H,W to patch multiples (swin.py:470+)
        ps = self.cfg.patch_size
        H, W = img.shape[-2:]
        img = F.pad(img, (0, (ps - W % ps) % ps, 0, (ps - H % ps) % ps))
        x = self.patch_embed.proj(img)
        B, C, Wh, Ww = x.shape
        x = x.flatten(2).transpose(1, 2)
        x = self.patch_embed.norm(x)
        outs = {}
        H, W = Wh, Ww
        for i, stage in enumerate(self.layers):
            win = self.cfg.window_size
            Hp = (H + win - 1) // win * win
            Wp = (W + win - 1) // win * win
            mask = _attn_mask(Hp, Wp, win, win // 2)
            for blk in stage.blocks:
                x = blk(x, H, W, mask)
            if i in self.cfg.out_indices:
                o = getattr(self, f"norm{i}")(x)
                outs[f"res{i + 2}"] = o.view(
                    B, H, W, -1).permute(0, 3, 1, 2)
            if hasattr(stage, "downsample"):
                x = stage.downsample(x, H, W)
                H, W = (H + 1) // 2, (W + 1) // 2
        return outs


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(0.05 * torch.randn(p.shape, generator=g))


def test_swin_parity_with_torch_mirror():
    cfg = tiny_swin_config()
    model = TorchSwin(cfg).eval()
    _randomize(model)
    sd = {k: v.numpy() for k, v in model.state_dict().items()
          if "relative_position_index" not in k}
    params = swin_from_state_dict(sd, cfg)

    rs = np.random.RandomState(0)
    # odd spatial size: exercises window padding + merge padding
    x = rs.randn(2, 21, 18, 3).astype(np.float32)
    with torch.no_grad():
        t_out = model(torch.tensor(x).permute(0, 3, 1, 2))
    j_out = jax.jit(lambda a: swin_forward(cfg, params, a))(jnp.asarray(x))
    assert set(j_out) == set(t_out) == {"res2", "res3"}
    for k in t_out:
        np.testing.assert_allclose(
            np.asarray(j_out[k]).transpose(0, 3, 1, 2), t_out[k].numpy(),
            rtol=2e-4, atol=2e-5)


def test_swin_l_shapes():
    """Full Swin-L config produces the stride-4/8/16/32 pyramid."""
    cfg = SwinConfig()
    params = init_swin(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 96, 128, 3))
    out = swin_forward(cfg, params, x)
    assert out["res2"].shape == (1, 24, 32, 192)
    assert out["res3"].shape == (1, 12, 16, 384)
    assert out["res4"].shape == (1, 6, 8, 768)
    assert out["res5"].shape == (1, 3, 4, 1536)
