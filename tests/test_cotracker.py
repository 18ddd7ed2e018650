"""CoTracker3-offline: numeric parity against a hand-built torch mirror
with released-checkpoint parameter names (reference architecture at
``preprocess/SpaTrackV2_code/models/tracker3D/co_tracker/cotracker_base.py``,
driven via torch.hub by ``evaluation/evaluate_INO_Traj.py:79`` and
``preprocess/track_regular_motion_cycle.py:199``)."""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from frameino_tpu.models.cotracker import (COTRACKER3_OFFLINE,
                                           CoTrackerConfig,
                                           cotracker_forward,
                                           cotracker_from_state_dict,
                                           cotracker_predict,
                                           init_cotracker,
                                           tiny_cotracker_config)


# --- torch mirror ---------------------------------------------------------

def t_bilinear_sampler(inp, coords, padding_mode="border"):
    sizes = inp.shape[2:]
    if len(sizes) == 3:
        coords = coords[..., [1, 2, 0]]
    scale = torch.tensor([2.0 / max(s - 1, 1) for s in reversed(sizes)])
    grid = coords * scale - 1
    return F.grid_sample(inp, grid, align_corners=True,
                         padding_mode=padding_mode, mode="bilinear")


def t_sample_features5d(inp, coords):
    B = inp.shape[0]
    inp = inp.permute(0, 2, 1, 3, 4)
    feats = t_bilinear_sampler(inp, coords.unsqueeze(3))
    return feats.permute(0, 2, 3, 1, 4).view(
        B, feats.shape[2], feats.shape[3], feats.shape[1])


class TRes(nn.Module):
    def __init__(self, ci, co, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(ci, co, 3, stride=stride, padding=1)
        self.conv2 = nn.Conv2d(co, co, 3, padding=1)
        self.norm1 = nn.InstanceNorm2d(co)
        self.norm2 = nn.InstanceNorm2d(co)
        if stride != 1:
            self.norm3 = nn.InstanceNorm2d(co)
            self.downsample = nn.Sequential(
                nn.Conv2d(ci, co, 1, stride=stride), self.norm3)
        else:
            self.downsample = None

    def forward(self, x):
        y = F.relu(self.norm1(self.conv1(x)))
        y = F.relu(self.norm2(self.conv2(y)))
        if self.downsample is not None:
            x = self.downsample(x)
        return F.relu(x + y)


class TEncoder(nn.Module):
    def __init__(self, out=16):
        super().__init__()
        self.stride = 4
        self.conv1 = nn.Conv2d(3, out // 2, 7, stride=2, padding=3)
        self.norm1 = nn.InstanceNorm2d(out // 2)
        self.layer1 = nn.Sequential(TRes(out // 2, out // 2, 1),
                                    TRes(out // 2, out // 2, 1))
        self.layer2 = nn.Sequential(TRes(out // 2, out * 3 // 4, 2),
                                    TRes(out * 3 // 4, out * 3 // 4, 1))
        self.layer3 = nn.Sequential(TRes(out * 3 // 4, out, 2),
                                    TRes(out, out, 1))
        self.layer4 = nn.Sequential(TRes(out, out, 2),
                                    TRes(out, out, 1))
        self.conv2 = nn.Conv2d(out * 3 + out // 4, out * 2, 3, padding=1)
        self.norm2 = nn.InstanceNorm2d(out * 2)
        self.conv3 = nn.Conv2d(out * 2, out, 1)

    def forward(self, x):
        H, W = x.shape[2:]
        x = F.relu(self.norm1(self.conv1(x)))
        a = self.layer1(x)
        b = self.layer2(a)
        c = self.layer3(b)
        d = self.layer4(c)
        rs = lambda t: F.interpolate(
            t, (H // self.stride, W // self.stride), mode="bilinear",
            align_corners=True)
        x = self.conv2(torch.cat([rs(a), rs(b), rs(c), rs(d)], 1))
        return self.conv3(F.relu(self.norm2(x)))


class TMlp(nn.Module):
    def __init__(self, i, h, o, act):
        super().__init__()
        self.fc1 = nn.Linear(i, h)
        self.fc2 = nn.Linear(h, o)
        self.act = act

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class TAttn(nn.Module):
    def __init__(self, dim, heads, dim_head):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.scale = heads, dim_head ** -0.5
        self.to_q = nn.Linear(dim, inner, bias=True)
        self.to_kv = nn.Linear(dim, inner * 2, bias=True)
        self.to_out = nn.Linear(inner, dim)

    def forward(self, x, context=None):
        context = x if context is None else context
        B, N1, _ = x.shape
        N2 = context.shape[1]
        h = self.heads
        q = self.to_q(x).view(B, N1, h, -1).transpose(1, 2)
        k, v = self.to_kv(context).chunk(2, dim=-1)
        k = k.view(B, N2, h, -1).transpose(1, 2)
        v = v.view(B, N2, h, -1).transpose(1, 2)
        attn = ((q @ k.transpose(-2, -1)) * self.scale).softmax(-1)
        o = (attn @ v).transpose(1, 2).reshape(B, N1, -1)
        return self.to_out(o)


class TAttnBlock(nn.Module):
    def __init__(self, dim, heads, dim_head, ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.norm2 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.attn = TAttn(dim, heads, dim_head)
        self.mlp = TMlp(dim, int(dim * ratio), dim,
                        nn.GELU(approximate="tanh"))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class TCrossBlock(nn.Module):
    def __init__(self, dim, heads, dim_head, ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.norm2 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.norm_context = nn.LayerNorm(dim)
        self.cross_attn = TAttn(dim, heads, dim_head)
        self.mlp = TMlp(dim, int(dim * ratio), dim,
                        nn.GELU(approximate="tanh"))

    def forward(self, x, ctx):
        x = x + self.cross_attn(self.norm1(x), self.norm_context(ctx))
        return x + self.mlp(self.norm2(x))


class TUpdateFormer(nn.Module):
    def __init__(self, cfg: CoTrackerConfig):
        super().__init__()
        hs, nh = cfg.hidden_size, cfg.num_heads
        dh = hs // nh
        self.cfg = cfg
        self.input_transform = nn.Linear(cfg.input_dim, hs)
        self.flow_head = nn.Linear(hs, 2)
        self.vis_conf_head = nn.Linear(hs, 2)
        self.virual_tracks = nn.Parameter(
            torch.randn(1, cfg.num_virtual_tracks, 1, hs))
        self.time_blocks = nn.ModuleList(
            [TAttnBlock(hs, nh, dh) for _ in range(cfg.time_depth)])
        self.space_virtual_blocks = nn.ModuleList(
            [TAttnBlock(hs, nh, dh) for _ in range(cfg.space_depth)])
        self.space_point2virtual_blocks = nn.ModuleList(
            [TCrossBlock(hs, nh, dh) for _ in range(cfg.space_depth)])
        self.space_virtual2point_blocks = nn.ModuleList(
            [TCrossBlock(hs, nh, dh) for _ in range(cfg.space_depth)])

    def forward(self, x):
        cfg = self.cfg
        B, N, T, _ = x.shape
        tokens = self.input_transform(x)
        virt = self.virual_tracks.repeat(B, 1, T, 1)
        tokens = torch.cat([tokens, virt], dim=1)
        Nv = N + cfg.num_virtual_tracks
        j = 0
        for i in range(len(self.time_blocks)):
            tt = self.time_blocks[i](tokens.reshape(B * Nv, T, -1))
            tokens = tt.view(B, Nv, T, -1)
            if i % (len(self.time_blocks)
                    // len(self.space_virtual_blocks)) == 0:
                st = tokens.permute(0, 2, 1, 3).reshape(B * T, Nv, -1)
                pts, virt = st[:, :N], st[:, N:]
                virt = self.space_virtual2point_blocks[j](virt, pts)
                virt = self.space_virtual_blocks[j](virt)
                pts = self.space_point2virtual_blocks[j](pts, virt)
                tokens = torch.cat([pts, virt], 1).view(
                    B, T, Nv, -1).permute(0, 2, 1, 3)
                j += 1
        tokens = tokens[:, :N]
        return torch.cat([self.flow_head(tokens),
                          self.vis_conf_head(tokens)], dim=-1)


class TCoTracker(nn.Module):
    """Mirror of CoTrackerThreeOffline.forward (cotracker_base.py:191)."""

    def __init__(self, cfg: CoTrackerConfig):
        super().__init__()
        self.cfg = cfg
        self.fnet = TEncoder(cfg.latent_dim)
        r = 2 * cfg.corr_radius + 1
        self.corr_mlp = TMlp(r ** 4, cfg.corr_mlp_hidden,
                             cfg.corr_mlp_out, nn.GELU())
        self.updateformer = TUpdateFormer(cfg)
        om = 1.0 / 10000 ** (torch.arange(cfg.input_dim // 2,
                                          dtype=torch.double)
                             / (cfg.input_dim / 2.0))
        pos = torch.linspace(0, cfg.window_len - 1, cfg.window_len)
        tab = torch.einsum("m,d->md", pos.double(), om)
        self.register_buffer("time_emb", torch.cat(
            [tab.sin(), tab.cos()], dim=1)[None].float())

    def support(self, coords, r):
        # coords [B,*,N,3] (t,x,y); returns [B,*,N,rr,rr,3] offsets in x/y
        d = torch.linspace(-r, r, 2 * r + 1)
        gx, gy = torch.meshgrid(d, d, indexing="ij")
        delta = torch.stack([torch.zeros_like(gx), gx, gy], -1)
        return coords[..., None, None, :] + delta

    def forward(self, video, queries, iters=2):
        cfg = self.cfg
        B, T, _, H, W = video.shape
        N = queries.shape[1]
        r = 2 * cfg.corr_radius + 1
        video = 2 * (video / 255.0) - 1.0
        qframe = queries[:, :, 0].long()
        qcoord = queries[..., 1:3] / cfg.stride

        fmaps = self.fnet(video.reshape(B * T, 3, H, W))
        fmaps = fmaps.permute(0, 2, 3, 1)
        fmaps = fmaps / torch.sqrt(torch.clamp_min(
            (fmaps ** 2).sum(-1, keepdim=True), 1e-12))
        fmaps = fmaps.permute(0, 3, 1, 2).reshape(
            B, T, cfg.latent_dim, H // cfg.stride, W // cfg.stride)

        pyramid = [fmaps]
        for _ in range(cfg.corr_levels - 1):
            f = pyramid[-1]
            f_ = F.avg_pool2d(f.reshape(B * T, cfg.latent_dim,
                                        f.shape[-2], f.shape[-1]), 2, 2)
            pyramid.append(f_.reshape(B, T, cfg.latent_dim,
                                      f_.shape[-2], f_.shape[-1]))

        support_feats = []
        for i, fm in enumerate(pyramid):
            sc = torch.cat([qframe[:, None, :, None].float(),
                            qcoord[:, None] / 2 ** i], dim=-1)
            sp = self.support(sc, cfg.corr_radius)       # [B,1,N,rr,rr,3]
            sp = sp.reshape(B, N, r * r, 3).permute(0, 2, 1, 3)
            feats = t_sample_features5d(fm, sp)          # [B,rr*rr,N,C]
            support_feats.append(
                feats.view(B, r, r, N, cfg.latent_dim).permute(
                    0, 3, 1, 2, 4))                      # [B,N,r,r,C]

        coords = qcoord.view(B, 1, N, 2).expand(B, T, N, 2).float()
        vis = torch.zeros(B, T, N)
        conf = torch.zeros(B, T, N)
        scale = torch.tensor([cfg.model_resolution[1],
                              cfg.model_resolution[0]]) / cfg.stride

        for _ in range(iters):
            corr_embs = []
            for i, fm in enumerate(pyramid):
                sc = torch.cat(
                    [torch.zeros_like(coords[..., :1]),
                     coords / 2 ** i], dim=-1)           # [B,T,N,3]
                sp = self.support(sc, cfg.corr_radius)   # [B,T,N,rr,rr,3]
                Hf, Wf = fm.shape[-2:]
                cf = t_bilinear_sampler(
                    fm.reshape(B * T, cfg.latent_dim, 1, Hf, Wf),
                    sp.reshape(B * T, N, r, r, 3)[..., [0, 1, 2]])
                cf = cf.view(B, T, cfg.latent_dim, N, r, r).permute(
                    0, 1, 3, 4, 5, 2)                    # [B,T,N,r,r,C]
                corr = torch.einsum("btnhwc,bnijc->btnhwij", cf,
                                    support_feats[i])
                corr_embs.append(self.corr_mlp(
                    corr.reshape(B, T, N, r ** 4)))
            corr_embs = torch.cat(corr_embs, -1)

            fwd = F.pad(coords[:, :-1] - coords[:, 1:],
                        (0, 0, 0, 0, 0, 1)) / scale
            bwd = F.pad(coords[:, 1:] - coords[:, :-1],
                        (0, 0, 0, 0, 1, 0)) / scale
            rel = torch.cat([fwd, bwd], dim=-1)
            scales = torch.tensor([2.0 ** i for i in range(10)])
            xb = (rel[..., None, :] * scales[:, None]).reshape(
                *rel.shape[:-1], -1)
            four = torch.sin(torch.cat([xb, xb + 0.5 * math.pi], -1))
            rel = torch.cat([rel, four], -1)

            x = torch.cat([vis[..., None], conf[..., None],
                           corr_embs, rel], dim=-1)
            x = x.permute(0, 2, 1, 3)                    # [B,N,T,D]
            te = self.time_emb
            if T != te.shape[1]:
                te = F.interpolate(te.permute(0, 2, 1), size=T,
                                   mode="linear").permute(0, 2, 1)
            x = x + te[None]
            delta = self.updateformer(x)
            coords = coords + delta[..., :2].permute(0, 2, 1, 3)
            vis = vis + delta[..., 2].permute(0, 2, 1)
            conf = conf + delta[..., 3].permute(0, 2, 1)

        return (coords * cfg.stride, torch.sigmoid(vis),
                torch.sigmoid(conf))


# --- tests ----------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_pair():
    cfg = tiny_cotracker_config()
    torch.manual_seed(0)
    mirror = TCoTracker(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    params = cotracker_from_state_dict(sd, cfg)
    return cfg, mirror, params, sd


def test_forward_parity(tiny_pair):
    cfg, mirror, params, _ = tiny_pair
    T, H, W, N = 5, 16, 24, 3
    rs = np.random.RandomState(0)
    video = rs.randint(0, 255, (1, T, 3, H, W)).astype(np.float32)
    queries = np.array([[[0.0, 3.0, 4.0], [2.0, 10.0, 7.0],
                         [1.0, 20.0, 12.0]]], np.float32)

    with torch.no_grad():
        tc, tv, tf = mirror(torch.tensor(video), torch.tensor(queries),
                            iters=cfg.iters)
    jc, jv, jf = cotracker_forward(cfg, params, jnp.asarray(video),
                                   jnp.asarray(queries))
    np.testing.assert_allclose(np.asarray(jc), tc.numpy(), atol=2e-3,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jv), tv.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(jf), tf.numpy(), atol=1e-4)


def test_state_dict_fully_consumed(tiny_pair):
    """Every mirror parameter lands in the JAX tree (no silently dropped
    weights)."""
    cfg, _, params, sd = tiny_pair
    n_mapped = len(jax.tree.leaves(params))
    # time_emb is a buffer on both sides; norm layers are affine-free
    assert n_mapped == len(sd)


def test_time_embed_interpolation_matches_torch(tiny_pair):
    cfg, mirror, params, _ = tiny_pair
    from frameino_tpu.models.cotracker import interpolate_time_embed
    te = mirror.time_emb
    for t in (3, 5, 11):
        want = F.interpolate(te.permute(0, 2, 1), size=t,
                             mode="linear").permute(0, 2, 1).numpy()
        got = np.asarray(interpolate_time_embed(
            jnp.asarray(te.numpy()), t))
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_backward_tracking_splices_before_query_frame(tiny_pair):
    cfg, _, params, _ = tiny_pair
    T, H, W = 5, 16, 24
    rs = np.random.RandomState(1)
    video = jnp.asarray(rs.randint(0, 255, (1, T, 3, H, W)), jnp.float32)
    q = jnp.asarray([[[3.0, 8.0, 6.0]]], jnp.float32)   # query at t=3
    fwd_only, _ = cotracker_predict(cfg, params, video, q,
                                    backward_tracking=False)
    both, _ = cotracker_predict(cfg, params, video, q,
                                backward_tracking=True)
    # after the query frame the forward pass wins -> identical
    np.testing.assert_allclose(np.asarray(both[0, 3:]),
                               np.asarray(fwd_only[0, 3:]), atol=1e-5)
    # before it, the backward pass is spliced in -> differs
    assert not np.allclose(np.asarray(both[0, :3]),
                           np.asarray(fwd_only[0, :3]), atol=1e-3)


def test_full_config_structure():
    cfg = COTRACKER3_OFFLINE
    assert cfg.input_dim == 1110          # cotracker_base.py:97
    shapes = jax.eval_shape(lambda k: init_cotracker(k, cfg),
                            jax.random.key(0))
    flat = {"/".join(str(p) for p in path): l.shape
            for path, l in jax.tree_util.tree_flatten_with_path(shapes)[0]}
    # spot-check released-checkpoint shapes
    assert any("corr_mlp" in k and (384, 2401) == s
               for k, s in flat.items())
    assert any("virual_tracks" in k and s == (1, 64, 1, 384)
               for k, s in flat.items())


def test_load_cotracker_jax_adapter(tiny_pair, tmp_path):
    """.pth checkpoint -> track(frames, queries) callable with the
    perception-backend contract (frames [T,H,W,3] uint8, queries
    [N,2] pixels -> int tracks [T,N,2])."""
    cfg, mirror, _, _ = tiny_pair
    from frameino_tpu.models.cotracker import load_cotracker_jax
    ckpt = tmp_path / "scaled_offline.pth"
    torch.save({"model": mirror.state_dict()}, ckpt)
    track = load_cotracker_jax(str(ckpt), cfg, backward_tracking=True)
    rs = np.random.RandomState(2)
    frames = rs.randint(0, 255, (5, 12, 20, 3)).astype(np.uint8)
    out = track(frames, np.array([[4.0, 6.0], [10.0, 3.0]]))
    assert out.shape == (5, 2, 2) and out.dtype == np.int64
