"""SAM2.1: numeric parity against a hand-built torch mirror with
released-checkpoint parameter names (the reference drives the external
``sam2`` package — ``evaluation/evaluate_INO_VSeg_MAE.py:33-48`` and
``preprocess/track_FrameINO.py:215-398``)."""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from frameino_tpu.models.sam2 import (Sam2Config, image_encoder_forward,
                                      hiera_forward, mask_decoder_forward,
                                      neck_forward, prompt_dense_pe,
                                      prompt_encoder_points,
                                      sam2_from_state_dict,
                                      sine_pos_embed, tiny_sam2_config)
from frameino_tpu.models.sam2_video import (axial_rope_tables,
                                            bilinear_resize_torch,
                                            encode_new_memory,
                                            forward_sam_heads,
                                            get_1d_sine_pe,
                                            memory_attention_forward,
                                            memory_encoder_forward)


# --- torch mirror primitives ----------------------------------------------

class TLayerNorm2d(nn.Module):
    def __init__(self, c, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(c) * 0.1 + 1.0)
        self.bias = nn.Parameter(torch.randn(c) * 0.1)
        self.eps = eps

    def forward(self, x):
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


class TMLP(nn.Module):
    def __init__(self, din, dh, dout, n, act=nn.ReLU,
                 sigmoid_output=False):
        super().__init__()
        dims = [din] + [dh] * (n - 1) + [dout]
        self.layers = nn.ModuleList(
            [nn.Linear(dims[i], dims[i + 1]) for i in range(n)])
        self.act = act()
        self.sigmoid_output = sigmoid_output

    def forward(self, x):
        for i, l in enumerate(self.layers):
            x = l(x)
            if i < len(self.layers) - 1:
                x = self.act(x)
        return torch.sigmoid(x) if self.sigmoid_output else x


class TAttention(nn.Module):
    def __init__(self, dim, heads, downsample_rate=1, kv_in_dim=None):
        super().__init__()
        self.internal = dim // downsample_rate
        kv = kv_in_dim if kv_in_dim is not None else dim
        self.q_proj = nn.Linear(dim, self.internal)
        self.k_proj = nn.Linear(kv, self.internal)
        self.v_proj = nn.Linear(kv, self.internal)
        self.out_proj = nn.Linear(self.internal, dim)
        self.heads = heads

    def _sep(self, x):
        B, L, _ = x.shape
        return x.reshape(B, L, self.heads, -1).transpose(1, 2)

    def forward(self, q, k, v):
        q, k, v = self.q_proj(q), self.k_proj(k), self.v_proj(v)
        o = F.scaled_dot_product_attention(
            self._sep(q), self._sep(k), self._sep(v))
        B, _, L, _ = o.shape
        return self.out_proj(o.transpose(1, 2).reshape(B, L, -1))


def t_compute_axial_cis(dim, end_x, end_y, theta=10000.0):
    fx = 1.0 / (theta ** (torch.arange(0, dim, 4)[: dim // 4].float()
                          / dim))
    t = torch.arange(end_x * end_y, dtype=torch.float32)
    fx_ = torch.outer(t % end_x, fx)
    fy_ = torch.outer(torch.div(t, end_x, rounding_mode="floor"), fx)
    return torch.cat([torch.polar(torch.ones_like(fx_), fx_),
                      torch.polar(torch.ones_like(fy_), fy_)], dim=-1)


def t_apply_rotary_enc(xq, xk, freqs_cis, repeat_freqs_k=False):
    xq_ = torch.view_as_complex(
        xq.float().reshape(*xq.shape[:-1], -1, 2))
    xk_ = torch.view_as_complex(
        xk.float().reshape(*xk.shape[:-1], -1, 2))
    fc = freqs_cis[None, None]
    xq_out = torch.view_as_real(xq_ * fc).flatten(3)
    if repeat_freqs_k:
        r = xk_.shape[-2] // xq_.shape[-2]
        fc = fc.repeat(1, 1, r, 1)
    xk_out = torch.view_as_real(xk_ * fc).flatten(3)
    return xq_out.type_as(xq), xk_out.type_as(xk)


class TRoPEAttention(TAttention):
    def __init__(self, *a, rope_k_repeat=False, feat_size=4,
                 theta=10000.0, **kw):
        super().__init__(*a, **kw)
        self.rope_k_repeat = rope_k_repeat
        self.freqs_cis = t_compute_axial_cis(
            self.internal // self.heads, feat_size, feat_size, theta)

    def forward(self, q, k, v, num_k_exclude_rope=0):
        q, k, v = self.q_proj(q), self.k_proj(k), self.v_proj(v)
        q, k, v = self._sep(q), self._sep(k), self._sep(v)
        num_k_rope = k.size(-2) - num_k_exclude_rope
        q, k_roped = t_apply_rotary_enc(
            q, k[:, :, :num_k_rope], self.freqs_cis,
            repeat_freqs_k=self.rope_k_repeat)
        k = torch.cat([k_roped, k[:, :, num_k_rope:]], dim=2)
        o = F.scaled_dot_product_attention(q, k, v)
        B, _, L, _ = o.shape
        return self.out_proj(o.transpose(1, 2).reshape(B, L, -1))


# --- Hiera trunk mirror -----------------------------------------------------

def t_window_partition(x, ws):
    B, H, W, C = x.shape
    x = x.view(B, H // ws, ws, W // ws, ws, C)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)


def t_window_unpartition(x, ws, hw):
    H, W = hw
    C = x.shape[-1]
    B = x.shape[0] // ((H // ws) * (W // ws))
    x = x.view(B, H // ws, W // ws, ws, ws, C)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


class TMSAttn(nn.Module):
    def __init__(self, dim, dim_out, heads, q_pool):
        super().__init__()
        self.qkv = nn.Linear(dim, dim_out * 3)
        self.proj = nn.Linear(dim_out, dim_out)
        self.pool = nn.MaxPool2d(2, 2) if q_pool else None
        self.heads = heads

    def forward(self, x):
        B, H, W, _ = x.shape
        qkv = self.qkv(x).reshape(B, H * W, 3, self.heads, -1)
        q, k, v = torch.unbind(qkv, 2)
        if self.pool is not None:
            q = q.reshape(B, H, W, -1).permute(0, 3, 1, 2)
            q = self.pool(q).permute(0, 2, 3, 1)
            H, W = q.shape[1:3]
            q = q.reshape(B, H * W, self.heads, -1)
        o = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
        o = o.transpose(1, 2).reshape(B, H, W, -1)
        return self.proj(o)


class TMSBlock(nn.Module):
    def __init__(self, spec, mlp_ratio=4.0):
        super().__init__()
        dim, dim_out = spec["dim"], spec["dim_out"]
        self.spec = spec
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TMSAttn(dim, dim_out, spec["heads"], spec["q_pool"])
        self.norm2 = nn.LayerNorm(dim_out, eps=1e-6)
        self.mlp = TMLP(dim_out, int(dim_out * mlp_ratio), dim_out, 2,
                        act=nn.GELU)
        if dim != dim_out:
            self.proj = nn.Linear(dim, dim_out)
        self.pool = nn.MaxPool2d(2, 2) if spec["q_pool"] else None

    def forward(self, x):
        spec = self.spec
        shortcut = x
        x = self.norm1(x)
        if spec["dim"] != spec["dim_out"]:
            s = self.proj(x).permute(0, 3, 1, 2)
            shortcut = self.pool(s).permute(0, 2, 3, 1)
        ws = spec["window"]
        H, W = x.shape[1:3]
        if ws > 0:
            x = t_window_partition(x, ws)
        x = self.attn(x)
        if spec["q_pool"]:
            ws = ws // 2
            H, W = shortcut.shape[1:3]
        if spec["window"] > 0:
            x = t_window_unpartition(x, ws, (H, W))
        x = shortcut + x
        return x + self.mlp(self.norm2(x))


class TPatchEmbed(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.proj = nn.Conv2d(3, dim, 7, stride=4, padding=3)


class THiera(nn.Module):
    def __init__(self, cfg: Sam2Config):
        super().__init__()
        self.cfg = cfg
        self.patch_embed = TPatchEmbed(cfg.embed_dim)
        self.pos_embed = nn.Parameter(
            torch.randn(1, cfg.embed_dim,
                        *cfg.window_pos_embed_bkg_spatial_size) * 0.1)
        self.pos_embed_window = nn.Parameter(
            torch.randn(1, cfg.embed_dim, cfg.window_spec[0],
                        cfg.window_spec[0]) * 0.1)
        self.blocks = nn.ModuleList(
            [TMSBlock(s, cfg.mlp_ratio) for s in cfg.block_spec()])

    def _pos(self, h, w):
        pe = F.interpolate(self.pos_embed, size=(h, w), mode="bicubic")
        win = self.pos_embed_window
        pe = pe + win.tile([x // y for x, y in zip(pe.shape, win.shape)])
        return pe.permute(0, 2, 3, 1)

    def forward(self, x):
        x = self.patch_embed.proj(x).permute(0, 2, 3, 1)
        x = x + self._pos(x.shape[1], x.shape[2])
        outs = []
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i in self.cfg.stage_ends:
                outs.append(x)
        return outs


def t_sine_pe(h, w, num_pos_feats, temperature=10000.0):
    half = num_pos_feats // 2
    y = torch.arange(1, h + 1, dtype=torch.float32).view(-1, 1)
    y = y.repeat(1, w)
    x = torch.arange(1, w + 1, dtype=torch.float32).view(1, -1)
    x = x.repeat(h, 1)
    eps, scale = 1e-6, 2 * math.pi
    y = y / (y[-1:, :] + eps) * scale
    x = x / (x[:, -1:] + eps) * scale
    dim_t = torch.arange(half, dtype=torch.float32)
    dim_t = temperature ** (2 * torch.div(dim_t, 2, rounding_mode="floor")
                            / half)
    px = x[:, :, None] / dim_t
    py = y[:, :, None] / dim_t
    px = torch.stack([px[:, :, 0::2].sin(), px[:, :, 1::2].cos()],
                     dim=3).flatten(2)
    py = torch.stack([py[:, :, 0::2].sin(), py[:, :, 1::2].cos()],
                     dim=3).flatten(2)
    return torch.cat([py, px], dim=2)


class TNeckConv(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, 1)


class TFpnNeck(nn.Module):
    def __init__(self, cfg: Sam2Config):
        super().__init__()
        self.cfg = cfg
        dims = list(reversed(cfg.backbone_dims))
        self.convs = nn.ModuleList(
            [TNeckConv(d, cfg.d_model) for d in dims])

    def forward(self, xs):
        """xs low->high stride, channels-last [B,h,w,C]."""
        n = len(self.convs) - 1
        out = [None] * len(xs)
        prev = None
        for i in range(n, -1, -1):
            x = xs[i].permute(0, 3, 1, 2)
            lateral = self.convs[n - i].conv(x)
            if i in self.cfg.fpn_top_down_levels and prev is not None:
                prev = lateral + F.interpolate(
                    prev, scale_factor=2.0, mode="nearest")
            else:
                prev = lateral
            out[i] = prev
        return out


# --- prompt encoder / decoder mirrors --------------------------------------

class TPELayer(nn.Module):
    def __init__(self, half):
        super().__init__()
        self.register_buffer("positional_encoding_gaussian_matrix",
                             torch.randn(2, half))

    def _pe(self, coords):
        coords = 2 * coords - 1
        coords = coords @ self.positional_encoding_gaussian_matrix
        coords = 2 * math.pi * coords
        return torch.cat([coords.sin(), coords.cos()], dim=-1)

    def forward_with_coords(self, pts, size):
        c = pts.clone()
        c[..., 0] = c[..., 0] / size[1]
        c[..., 1] = c[..., 1] / size[0]
        return self._pe(c)

    def forward_grid(self, g):
        ys = (torch.arange(g, dtype=torch.float32) + 0.5) / g
        xs = (torch.arange(g, dtype=torch.float32) + 0.5) / g
        grid = torch.stack(torch.meshgrid(xs, ys, indexing="xy"), -1)
        return self._pe(grid)


class TPromptEncoder(nn.Module):
    def __init__(self, cfg: Sam2Config):
        super().__init__()
        C = cfg.d_model
        self.cfg = cfg
        self.pe_layer = TPELayer(C // 2)
        self.point_embeddings = nn.ModuleList(
            [nn.Embedding(1, C) for _ in range(4)])
        self.not_a_point_embed = nn.Embedding(1, C)
        self.no_mask_embed = nn.Embedding(1, C)
        self.mask_downscaling = nn.Sequential(
            nn.Conv2d(1, 4, 2, 2), TLayerNorm2d(4), nn.GELU(),
            nn.Conv2d(4, 16, 2, 2), TLayerNorm2d(16), nn.GELU(),
            nn.Conv2d(16, C, 1))

    def embed_points(self, points, labels):
        points = points + 0.5
        points = torch.cat(
            [points, torch.zeros(points.shape[0], 1, 2)], dim=1)
        labels = torch.cat(
            [labels, -torch.ones(labels.shape[0], 1)], dim=1)
        pe = self.pe_layer.forward_with_coords(
            points, (self.cfg.image_size, self.cfg.image_size))
        pe = torch.where((labels == -1)[..., None],
                         torch.zeros_like(pe)
                         + self.not_a_point_embed.weight, pe)
        for i in range(4):
            pe = torch.where((labels == i)[..., None],
                             pe + self.point_embeddings[i].weight, pe)
        return pe


class TTwoWayBlock(nn.Module):
    def __init__(self, C, heads, mlp_dim, skip_first_pe):
        super().__init__()
        self.self_attn = TAttention(C, heads)
        self.norm1 = nn.LayerNorm(C)
        self.cross_attn_token_to_image = TAttention(C, heads, 2)
        self.norm2 = nn.LayerNorm(C)
        self.mlp = TMLP(C, mlp_dim, C, 2)
        self.norm3 = nn.LayerNorm(C)
        self.norm4 = nn.LayerNorm(C)
        self.cross_attn_image_to_token = TAttention(C, heads, 2)
        self.skip_first_pe = skip_first_pe

    def forward(self, queries, keys, qpe, kpe):
        if self.skip_first_pe:
            queries = self.self_attn(queries, queries, queries)
        else:
            q = queries + qpe
            queries = queries + self.self_attn(q, q, queries)
        queries = self.norm1(queries)
        q, k = queries + qpe, keys + kpe
        queries = self.norm2(
            queries + self.cross_attn_token_to_image(q, k, keys))
        queries = self.norm3(queries + self.mlp(queries))
        q, k = queries + qpe, keys + kpe
        keys = self.norm4(
            keys + self.cross_attn_image_to_token(k, q, queries))
        return queries, keys


class TTwoWayTransformer(nn.Module):
    def __init__(self, cfg: Sam2Config):
        super().__init__()
        C = cfg.d_model
        self.layers = nn.ModuleList(
            [TTwoWayBlock(C, cfg.dec_heads, cfg.dec_mlp_dim, i == 0)
             for i in range(2)])
        self.final_attn_token_to_image = TAttention(C, cfg.dec_heads, 2)
        self.norm_final_attn = nn.LayerNorm(C)

    def forward(self, image_embedding, image_pe, tokens):
        B = image_embedding.shape[0]
        keys = image_embedding.flatten(2).permute(0, 2, 1)
        kpe = image_pe.flatten(2).permute(0, 2, 1).expand(B, -1, -1)
        queries = tokens
        for layer in self.layers:
            queries, keys = layer(queries, keys, tokens, kpe)
        q, k = queries + tokens, keys + kpe
        queries = queries + self.final_attn_token_to_image(q, k, keys)
        return self.norm_final_attn(queries), keys


class TMaskDecoder(nn.Module):
    def __init__(self, cfg: Sam2Config):
        super().__init__()
        C = cfg.d_model
        self.cfg = cfg
        self.transformer = TTwoWayTransformer(cfg)
        self.iou_token = nn.Embedding(1, C)
        self.mask_tokens = nn.Embedding(1 + cfg.num_multimask, C)
        self.obj_score_token = nn.Embedding(1, C)
        self.output_upscaling = nn.Sequential(
            nn.ConvTranspose2d(C, C // 4, 2, 2), TLayerNorm2d(C // 4),
            nn.GELU(), nn.ConvTranspose2d(C // 4, C // 8, 2, 2),
            nn.GELU())
        self.conv_s0 = nn.Conv2d(C, C // 8, 1)
        self.conv_s1 = nn.Conv2d(C, C // 4, 1)
        n = 1 + cfg.num_multimask
        self.output_hypernetworks_mlps = nn.ModuleList(
            [TMLP(C, C, C // 8, 3) for _ in range(n)])
        self.iou_prediction_head = TMLP(C, C, n, 3, sigmoid_output=True)
        self.pred_obj_score_head = TMLP(C, C, 1, 3)

    def forward(self, src, image_pe, sparse, hi_feats,
                multimask_output):
        cfg = self.cfg
        B = src.shape[0]
        out_toks = torch.cat([self.obj_score_token.weight,
                              self.iou_token.weight,
                              self.mask_tokens.weight], dim=0)
        tokens = torch.cat(
            [out_toks[None].expand(B, -1, -1), sparse], dim=1)
        hs, keys = self.transformer(src, image_pe, tokens)
        n = 1 + cfg.num_multimask
        iou_tok, mask_toks = hs[:, 1], hs[:, 2:2 + n]
        h = w = int(math.sqrt(keys.shape[1]))
        src_out = keys.transpose(1, 2).reshape(B, -1, h, w)
        dc1, ln1, act1, dc2, act2 = self.output_upscaling
        s0, s1 = hi_feats
        up = act1(ln1(dc1(src_out) + s1))
        up = act2(dc2(up) + s0)
        hyper = torch.stack(
            [self.output_hypernetworks_mlps[i](mask_toks[:, i])
             for i in range(n)], dim=1)
        hb, wb = up.shape[2:]
        masks = (hyper @ up.flatten(2)).view(B, n, hb, wb)
        iou = self.iou_prediction_head(iou_tok)
        score = self.pred_obj_score_head(hs[:, 0])
        if multimask_output:
            return masks[:, 1:], iou[:, 1:], mask_toks[:, 1:], score
        # dynamic stability path
        def stab(m):
            m = m.flatten(-2)
            ai = (m > cfg.stability_delta).sum(-1).float()
            au = (m > -cfg.stability_delta).sum(-1).float()
            return torch.where(au > 0, ai / au, torch.ones_like(ai))
        best = iou[:, 1:].argmax(-1)
        bi = torch.arange(B)
        mb, ib = masks[:, 1:][bi, best][:, None], iou[:, 1:][bi,
                                                            best][:, None]
        st = stab(masks[:, 0:1])[:, 0]
        use0 = (st >= cfg.stability_thresh)[:, None]
        m0 = torch.where(use0[..., None, None], masks[:, 0:1], mb)
        i0 = torch.where(use0, iou[:, 0:1], ib)
        return m0, i0, mask_toks[:, 0:1], score


# --- memory mirrors ---------------------------------------------------------

class TMemLayer(nn.Module):
    def __init__(self, cfg: Sam2Config, grid):
        super().__init__()
        C = cfg.d_model
        self.self_attn = TRoPEAttention(C, 1, feat_size=grid,
                                        theta=cfg.rope_theta)
        self.cross_attn_image = TRoPEAttention(
            C, 1, kv_in_dim=cfg.mem_dim, rope_k_repeat=True,
            feat_size=grid, theta=cfg.rope_theta)
        self.linear1 = nn.Linear(C, cfg.mem_ffn_dim)
        self.linear2 = nn.Linear(cfg.mem_ffn_dim, C)
        self.norm1 = nn.LayerNorm(C)
        self.norm2 = nn.LayerNorm(C)
        self.norm3 = nn.LayerNorm(C)

    def forward(self, tgt, memory, pos, n_exclude):
        t2 = self.norm1(tgt)
        tgt = tgt + self.self_attn(t2, t2, t2)
        t2 = self.norm2(tgt)
        tgt = tgt + self.cross_attn_image(
            t2, memory + pos, memory, num_k_exclude_rope=n_exclude)
        t2 = self.norm3(tgt)
        return tgt + self.linear2(F.relu(self.linear1(t2)))


class TMemoryAttention(nn.Module):
    def __init__(self, cfg: Sam2Config, grid):
        super().__init__()
        self.layers = nn.ModuleList(
            [TMemLayer(cfg, grid) for _ in range(cfg.mem_attn_layers)])
        self.norm = nn.LayerNorm(cfg.d_model)

    def forward(self, curr, curr_pos, memory, pos, n_exclude):
        out = curr + 0.1 * curr_pos
        for layer in self.layers:
            out = layer(out, memory, pos, n_exclude)
        return self.norm(out)


class TCXBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dwconv = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = TLayerNorm2d(dim)
        self.pwconv1 = nn.Linear(dim, 4 * dim)
        self.pwconv2 = nn.Linear(4 * dim, dim)
        self.gamma = nn.Parameter(torch.randn(dim) * 0.1 + 1.0)

    def forward(self, x):
        inp = x
        x = self.norm(self.dwconv(x)).permute(0, 2, 3, 1)
        x = self.gamma * self.pwconv2(F.gelu(self.pwconv1(x)))
        return inp + x.permute(0, 3, 1, 2)


class TFuser(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.layers = nn.ModuleList([TCXBlock(dim) for _ in range(2)])


class TMaskDownSampler(nn.Module):
    def __init__(self, embed_dim):
        super().__init__()
        mods, cin = [], 1
        for _ in range(4):
            cout = cin * 4
            mods += [nn.Conv2d(cin, cout, 3, 2, 1), TLayerNorm2d(cout),
                     nn.GELU()]
            cin = cout
        mods.append(nn.Conv2d(cin, embed_dim, 1))
        self.encoder = nn.Sequential(*mods)


class TMemoryEncoder(nn.Module):
    def __init__(self, cfg: Sam2Config):
        super().__init__()
        C = cfg.d_model
        self.mask_downsampler = TMaskDownSampler(C)
        self.pix_feat_proj = nn.Conv2d(C, C, 1)
        self.fuser = TFuser(C)
        self.out_proj = nn.Conv2d(C, cfg.mem_dim, 1)

    def forward(self, pix_feat, mask_for_mem):
        x = self.mask_downsampler.encoder(mask_for_mem)
        x = self.pix_feat_proj(pix_feat) + x
        for blk in self.fuser.layers:
            x = blk(x)
        return self.out_proj(x)


class TImageEncoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.trunk = THiera(cfg)
        self.neck = TFpnNeck(cfg)


class TSam2(nn.Module):
    def __init__(self, cfg: Sam2Config):
        super().__init__()
        C, grid = cfg.d_model, cfg.image_size // 16
        self.cfg = cfg
        self.image_encoder = TImageEncoder(cfg)
        self.sam_prompt_encoder = TPromptEncoder(cfg)
        self.sam_mask_decoder = TMaskDecoder(cfg)
        self.memory_attention = TMemoryAttention(cfg, grid)
        self.memory_encoder = TMemoryEncoder(cfg)
        self.obj_ptr_proj = TMLP(C, C, C, 3)
        self.obj_ptr_tpos_proj = nn.Linear(C, cfg.mem_dim)
        self.maskmem_tpos_enc = nn.Parameter(
            torch.randn(cfg.num_maskmem, 1, 1, cfg.mem_dim) * 0.1)
        self.no_mem_embed = nn.Parameter(torch.randn(1, 1, C) * 0.1)
        self.no_mem_pos_enc = nn.Parameter(torch.randn(1, 1, C) * 0.1)
        self.no_obj_ptr = nn.Parameter(torch.randn(1, C) * 0.1)
        self.no_obj_embed_spatial = nn.Parameter(
            torch.randn(1, cfg.mem_dim) * 0.1)
        self.mask_downsample = nn.Conv2d(1, 1, 4, 4)


@pytest.fixture(scope="module")
def tiny_pair():
    torch.manual_seed(0)
    cfg = tiny_sam2_config()
    tm = TSam2(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = sam2_from_state_dict(dict(sd), cfg)
    return cfg, tm, params, sd


# --- tests ------------------------------------------------------------------

def test_state_dict_fully_consumed(tiny_pair):
    cfg, _, _, sd = tiny_pair
    sd = dict(sd)
    sd["stray.weight"] = np.zeros(2)
    with pytest.raises(AssertionError, match="unconsumed"):
        sam2_from_state_dict(sd, cfg)


def test_sine_pos_embed_matches_torch():
    ref = t_sine_pe(5, 7, 16).numpy()
    got = sine_pos_embed(5, 7, 16)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_axial_rope_matches_torch():
    cis = t_compute_axial_cis(16, 4, 4)
    cos, sin = axial_rope_tables(16, 4, 4, 10000.0)
    np.testing.assert_allclose(cos, cis.real.numpy(), atol=1e-6)
    np.testing.assert_allclose(sin, cis.imag.numpy(), atol=1e-6)


def test_get_1d_sine_pe_matches_torch():
    pos = np.array([0.0, 0.5, 2.0], np.float32)
    dim = 16
    half = dim // 2
    dim_t = torch.arange(half).float()
    dim_t = 10000.0 ** (2 * torch.div(dim_t, 2, rounding_mode="floor")
                        / half)
    pe = torch.tensor(pos)[:, None] / dim_t
    ref = torch.cat([pe.sin(), pe.cos()], dim=-1).numpy()
    np.testing.assert_allclose(get_1d_sine_pe(pos, dim), ref, atol=1e-6)


def test_trunk_parity(tiny_pair):
    cfg, tm, params, _ = tiny_pair
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, cfg.image_size, cfg.image_size, 3),
                            dtype=np.float32)
    with torch.no_grad():
        refs = tm.image_encoder.trunk(
            torch.tensor(x).permute(0, 3, 1, 2))
    outs = hiera_forward(params, jnp.asarray(x), cfg)
    assert len(outs) == len(refs) == len(cfg.stages)
    for got, ref in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                                   atol=3e-5, rtol=3e-5)


def test_image_encoder_parity(tiny_pair):
    cfg, tm, params, _ = tiny_pair
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, cfg.image_size, cfg.image_size, 3),
                            dtype=np.float32)
    with torch.no_grad():
        trunk_outs = tm.image_encoder.trunk(
            torch.tensor(x).permute(0, 3, 1, 2))
        neck_outs = tm.image_encoder.neck(trunk_outs)
        neck_outs = neck_outs[:-cfg.scalp]
        ref0 = tm.sam_mask_decoder.conv_s0(neck_outs[0])
        ref1 = tm.sam_mask_decoder.conv_s1(neck_outs[1])
        ref2 = neck_outs[2]
    feats, pos = image_encoder_forward(params, jnp.asarray(x), cfg)
    for got, ref in zip(feats, (ref0, ref1, ref2)):
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), ref.numpy(),
            atol=3e-5, rtol=3e-5)
    # neck position encodings are the sine embedding at each level
    g = cfg.image_size // 16
    np.testing.assert_allclose(
        np.asarray(pos[-1])[0], sine_pos_embed(g, g, cfg.d_model),
        atol=1e-6)


def test_prompt_encoder_parity(tiny_pair):
    cfg, tm, params, _ = tiny_pair
    pts = np.array([[[5.0, 9.0], [40.0, 30.0]]], np.float32)
    lbl = np.array([[1, 0]], np.float32)
    with torch.no_grad():
        ref = tm.sam_prompt_encoder.embed_points(
            torch.tensor(pts), torch.tensor(lbl))
    got = prompt_encoder_points(params, jnp.asarray(pts),
                                jnp.asarray(lbl.astype(np.int32)), cfg)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-5)


def test_dense_pe_parity(tiny_pair):
    cfg, tm, params, _ = tiny_pair
    g = cfg.image_size // 16
    with torch.no_grad():
        ref = tm.sam_prompt_encoder.pe_layer.forward_grid(g)
    got = prompt_dense_pe(params, cfg)
    np.testing.assert_allclose(np.asarray(got)[0], ref.numpy(),
                               atol=1e-5)


def _decoder_inputs(cfg, rng):
    g = cfg.image_size // 16
    C = cfg.d_model
    src = rng.standard_normal((1, g, g, C), dtype=np.float32)
    s0 = rng.standard_normal((1, 4 * g, 4 * g, C // 8),
                             dtype=np.float32)
    s1 = rng.standard_normal((1, 2 * g, 2 * g, C // 4),
                             dtype=np.float32)
    sparse = rng.standard_normal((1, 3, C), dtype=np.float32)
    return src, s0, s1, sparse


@pytest.mark.parametrize("multimask", [True, False])
def test_mask_decoder_parity(tiny_pair, multimask):
    cfg, tm, params, _ = tiny_pair
    rng = np.random.default_rng(3)
    src, s0, s1, sparse = _decoder_inputs(cfg, rng)
    g = cfg.image_size // 16
    with torch.no_grad():
        image_pe = tm.sam_prompt_encoder.pe_layer.forward_grid(g)
        image_pe = image_pe.permute(2, 0, 1)[None]
        ref = tm.sam_mask_decoder(
            torch.tensor(src).permute(0, 3, 1, 2)
            .flatten(2).permute(0, 2, 1).reshape(1, g, g, -1)
            .permute(0, 3, 1, 2),
            image_pe, torch.tensor(sparse),
            (torch.tensor(s0).permute(0, 3, 1, 2),
             torch.tensor(s1).permute(0, 3, 1, 2)), multimask)
    got = mask_decoder_forward(
        params, jnp.asarray(src), prompt_dense_pe(params, cfg),
        jnp.asarray(sparse),
        (jnp.asarray(s0), jnp.asarray(s1)), cfg, multimask)
    names = ("masks", "iou", "tokens", "obj_score")
    for name, g_, r_ in zip(names, got, ref):
        np.testing.assert_allclose(np.asarray(g_), r_.numpy(),
                                   atol=5e-5, rtol=5e-5,
                                   err_msg=name)


def test_memory_encoder_parity(tiny_pair):
    cfg, tm, params, _ = tiny_pair
    rng = np.random.default_rng(4)
    g = cfg.image_size // 16
    pix = rng.standard_normal((1, g, g, cfg.d_model), dtype=np.float32)
    mask = rng.standard_normal((1, cfg.image_size, cfg.image_size, 1),
                               dtype=np.float32)
    with torch.no_grad():
        ref = tm.memory_encoder(
            torch.tensor(pix).permute(0, 3, 1, 2),
            torch.tensor(mask).permute(0, 3, 1, 2))
    got = memory_encoder_forward(params, jnp.asarray(pix),
                                 jnp.asarray(mask), cfg)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=3e-5, rtol=3e-5)


def test_memory_attention_parity_with_slot_padding(tiny_pair):
    """JAX fixed-capacity (padded, masked) memory == torch
    variable-size memory: 2 valid spatial slots of 3, 2 pointers of 4
    slots, RoPE excluded on pointer tokens."""
    cfg, tm, params, _ = tiny_pair
    rng = np.random.default_rng(5)
    g = cfg.image_size // 16
    hw = g * g
    C, M = cfg.d_model, cfg.mem_dim
    curr = rng.standard_normal((1, hw, C), dtype=np.float32)
    curr_pos = rng.standard_normal((1, hw, C), dtype=np.float32)
    n_valid = 2
    spatial = rng.standard_normal((1, n_valid * hw, M),
                                  dtype=np.float32)
    spatial_pos = rng.standard_normal((1, n_valid * hw, M),
                                      dtype=np.float32)
    n_ptr_valid = 2 * (C // M)
    ptrs = rng.standard_normal((1, n_ptr_valid, M), dtype=np.float32)
    ptr_pos = rng.standard_normal((1, n_ptr_valid, M), dtype=np.float32)
    with torch.no_grad():
        ref = tm.memory_attention(
            torch.tensor(curr), torch.tensor(curr_pos),
            torch.cat([torch.tensor(spatial), torch.tensor(ptrs)], 1),
            torch.cat([torch.tensor(spatial_pos),
                       torch.tensor(ptr_pos)], 1),
            n_exclude=n_ptr_valid)
    # pad to fixed capacity
    n_slots = cfg.num_maskmem
    n_ptr_cap = cfg.max_obj_ptrs_in_encoder * (C // M)
    S = n_slots * hw + n_ptr_cap
    mem = np.zeros((1, S, M), np.float32)
    pos = np.zeros((1, S, M), np.float32)
    bias = np.full((1, S), -1e30, np.float32)
    mem[:, :n_valid * hw] = spatial
    pos[:, :n_valid * hw] = spatial_pos
    bias[:, :n_valid * hw] = 0.0
    lo = n_slots * hw
    mem[:, lo:lo + n_ptr_valid] = ptrs
    pos[:, lo:lo + n_ptr_valid] = ptr_pos
    bias[:, lo:lo + n_ptr_valid] = 0.0
    cos, sin = axial_rope_tables(C, g, g, cfg.rope_theta)
    rope_q = (jnp.asarray(cos), jnp.asarray(sin))
    rope_k = (jnp.asarray(np.tile(cos, (n_slots, 1))),
              jnp.asarray(np.tile(sin, (n_slots, 1))))
    got = memory_attention_forward(
        params, jnp.asarray(curr), jnp.asarray(curr_pos),
        jnp.asarray(mem), jnp.asarray(pos), jnp.asarray(bias),
        rope_q, rope_k, cfg)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                               atol=5e-5, rtol=5e-5)


def test_forward_sam_heads_and_memory_integration(tiny_pair):
    """Conditioning-frame path: features + no_mem_embed -> SAM heads
    (multimask best-IoU, NO_OBJ mask, obj-ptr blend) -> memory encoder
    (binarized), all vs the torch mirror."""
    cfg, tm, params, _ = tiny_pair
    rng = np.random.default_rng(6)
    g = cfg.image_size // 16
    C = cfg.d_model
    s2 = rng.standard_normal((1, g, g, C), dtype=np.float32)
    s0 = rng.standard_normal((1, 4 * g, 4 * g, C // 8),
                             dtype=np.float32)
    s1 = rng.standard_normal((1, 2 * g, 2 * g, C // 4),
                             dtype=np.float32)
    pts = np.array([[[20.0, 12.0]]], np.float32)
    lbl = np.array([[1]], np.int32)
    with torch.no_grad():
        pix = torch.tensor(s2).reshape(1, g * g, C) \
            + tm.no_mem_embed
        pix = pix.reshape(1, g, g, C).permute(0, 3, 1, 2)
        sparse = tm.sam_prompt_encoder.embed_points(
            torch.tensor(pts), torch.tensor(lbl.astype(np.float32)))
        dense = tm.sam_prompt_encoder.no_mask_embed.weight
        dense = dense.reshape(1, -1, 1, 1).expand(1, C, g, g)
        image_pe = tm.sam_prompt_encoder.pe_layer.forward_grid(g)
        image_pe = image_pe.permute(2, 0, 1)[None]
        masks, ious, toks, score = tm.sam_mask_decoder(
            pix + dense, image_pe, sparse,
            (torch.tensor(s0).permute(0, 3, 1, 2),
             torch.tensor(s1).permute(0, 3, 1, 2)), True)
        is_obj = score > 0
        masks = torch.where(is_obj[..., None, None], masks,
                            torch.tensor(-1024.0))
        best = ious.argmax(-1)
        sel = masks[torch.arange(1), best][:, None]
        high = F.interpolate(sel, size=(cfg.image_size,) * 2,
                             mode="bilinear", align_corners=False)
        tok = toks[torch.arange(1), best]
        ptr = tm.obj_ptr_proj(tok)
        lam = is_obj.float()
        ptr = lam * ptr + (1 - lam) * tm.no_obj_ptr
        mfm = (high > 0).float() * cfg.sigmoid_scale_for_mem_enc \
            + cfg.sigmoid_bias_for_mem_enc
        mem_ref = tm.memory_encoder(
            torch.tensor(s2).permute(0, 3, 1, 2), mfm)
        mem_ref = mem_ref + (1 - lam)[..., None, None] \
            * tm.no_obj_embed_spatial[..., None, None]
    low_j, high_j, ptr_j, score_j = forward_sam_heads(
        params, jnp.asarray(s2) + params["no_mem_embed"].reshape(
            1, 1, 1, C),
        (jnp.asarray(s0), jnp.asarray(s1)), jnp.asarray(pts),
        jnp.asarray(lbl), cfg, multimask_output=True)
    np.testing.assert_allclose(np.asarray(score_j), score.numpy(),
                               atol=5e-5, rtol=5e-5)
    np.testing.assert_allclose(np.asarray(low_j), sel.numpy(),
                               atol=5e-5, rtol=5e-5)
    np.testing.assert_allclose(np.asarray(high_j), high.numpy(),
                               atol=5e-5, rtol=5e-5)
    np.testing.assert_allclose(np.asarray(ptr_j), ptr.numpy(),
                               atol=5e-5, rtol=5e-5)
    mem_j = encode_new_memory(params, jnp.asarray(s2), high_j,
                              score_j, cfg, binarize=True)
    np.testing.assert_allclose(
        np.asarray(mem_j).transpose(0, 3, 1, 2), mem_ref.numpy(),
        atol=5e-5, rtol=5e-5)


def test_bilinear_resize_matches_torch():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 1, 16, 16), dtype=np.float32)
    for out_hw in [(64, 64), (7, 5), (16, 16)]:
        ref = F.interpolate(torch.tensor(x), size=out_hw,
                            mode="bilinear", align_corners=False)
        got = bilinear_resize_torch(jnp.asarray(x), out_hw)
        np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                                   atol=1e-5, rtol=1e-5)
