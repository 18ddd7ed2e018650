"""AutoShot supernet JAX model: numeric parity against a hand-built
torch mirror with the released checkpoint's parameter names (reference
``preprocess/auxiliary/AutoShot.py`` deployed configuration)."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from frameino_tpu.preprocess.autoshot import (AUTOSHOT, _branch_filters,
                                              autoshot_forward,
                                              autoshot_from_state_dict,
                                              init_autoshot,
                                              make_autoshot_scorer)


class Linear_(nn.Module):
    def __init__(self, i, o, act):
        super().__init__()
        self.linear = nn.Linear(i, o)
        self.act = act

    def forward(self, x):
        x = self.linear(x)
        return F.relu(x) if self.act == "relu" else x


class Conv3DConfigurable(nn.Module):
    def __init__(self, cin, filters, dilation, mid, sharable):
        super().__init__()
        self.layers = nn.ModuleList()
        if not sharable:
            self.layers.append(nn.Conv3d(cin, mid, (1, 3, 3),
                                         padding=(0, 1, 1), bias=False))
        self.layers.append(nn.Conv3d(mid, filters, (3, 1, 1),
                                     padding=(dilation, 0, 0),
                                     dilation=(dilation, 1, 1),
                                     bias=False))

    def forward(self, x):
        for l in self.layers:
            x = l(x)
        return x


class DilatedLayer(nn.Module):
    """DilatedDCNNV2 (shared=False) / DilatedDCNNV2ABC type A
    (shared=True), checkpoint-named."""

    def __init__(self, cin, filters, mult, n_dil, shared):
        super().__init__()
        mid = mult * filters
        self.shared = shared
        if shared:
            self.share = nn.Conv3d(cin, mid, (1, 3, 3),
                                   padding=(0, 1, 1), bias=False)
        self.conv_blocks = nn.ModuleList([
            Conv3DConfigurable(cin, bf, 2 ** i, mid, shared)
            for i, bf in enumerate(_branch_filters(filters, n_dil))])
        self.batch_norm = nn.BatchNorm3d(filters * 4, eps=1e-3)

    def forward(self, x):
        src = self.share(x) if self.shared else x
        y = torch.cat([b(src) for b in self.conv_blocks], dim=1)
        return F.relu(self.batch_norm(y))


class FrameSimilarity(nn.Module):
    def __init__(self, cin=448, lookup=101):
        super().__init__()
        self.projection = Linear_(cin, 128, "id")
        self.fc = Linear_(lookup, 128, "relu")
        self.lookup = lookup

    def forward(self, feats):
        x = torch.cat([f.mean(dim=[3, 4]) for f in feats], dim=1)
        x = x.permute(0, 2, 1)
        x = F.normalize(self.projection(x), p=2, dim=-1)
        sim = torch.matmul(x, x.permute(0, 2, 1))
        return self.fc(_band(sim, self.lookup))


def _band(sim, lookup):
    B, T, _ = sim.shape
    half = (lookup - 1) // 2
    padded = F.pad(sim, (half, half))
    idx = torch.arange(T)[:, None] + torch.arange(lookup)[None, :]
    return padded[:, torch.arange(T)[:, None], idx]


class ColorHistograms(nn.Module):
    def __init__(self, lookup=101):
        super().__init__()
        self.fc = Linear_(lookup, 128, "relu")
        self.lookup = lookup

    def forward(self, frames):           # [B, C, T, H, W] uint8-valued
        f = frames.permute(0, 2, 3, 4, 1).to(torch.int64)
        bins = ((f[..., 0] >> 5) << 6) + ((f[..., 1] >> 5) << 3) \
            + (f[..., 2] >> 5)
        B, T = bins.shape[:2]
        flat = bins.reshape(B * T, -1)
        hist = torch.zeros(B * T, 512).scatter_add(
            1, flat, torch.ones_like(flat, dtype=torch.float32))
        hist = hist.reshape(B, T, 512)
        hist = hist / hist.norm(dim=-1, keepdim=True).clamp(1e-12)
        sim = torch.matmul(hist, hist.permute(0, 2, 1))
        return self.fc(_band(sim, self.lookup))


class TorchAutoShot(nn.Module):
    def __init__(self):
        super().__init__()
        specs = AUTOSHOT.layers
        self.Layer_0_3 = DilatedLayer(*specs[0])
        self.Layer_1_8 = DilatedLayer(*specs[1])
        self.Layer_2_8 = DilatedLayer(*specs[2])
        self.Layer_3_8 = DilatedLayer(*specs[3])
        self.Layer_4_13 = DilatedLayer(*specs[4])
        self.Layer_5_12 = DilatedLayer(*specs[5])
        self.pool = nn.AvgPool3d((1, 2, 2))
        self.frame_sim_layer = FrameSimilarity()
        self.color_hist_layer = ColorHistograms()
        self.fc1_0 = Linear_(4864, 1024, "relu")
        self.cls_layer1 = Linear_(1024, 1, "id")
        self.cls_layer2 = Linear_(1024, 1, "id")

    def forward(self, frames):           # [B, T, H, W, 3] uint8-valued
        inputs = frames.permute(0, 4, 1, 2, 3).float()
        x = inputs / 255.0
        layers = [self.Layer_0_3, self.Layer_1_8, self.Layer_2_8,
                  self.Layer_3_8, self.Layer_4_13, self.Layer_5_12]
        feats = []
        shortcut = None
        for i, op in enumerate(layers):
            x = op(x)
            if i % 2 == 0:
                shortcut = x
            else:
                x = self.pool(shortcut + x)
                feats.append(x)
        # flatten in (H, W, C) order like the reference permute+reshape
        xp = x.permute(0, 2, 3, 4, 1)
        flat = xp.reshape(xp.shape[0], xp.shape[1], -1)
        flat = torch.cat([self.frame_sim_layer(feats), flat], dim=2)
        flat = torch.cat([self.color_hist_layer(inputs), flat], dim=2)
        h = self.fc1_0(flat)
        return self.cls_layer1(h), self.cls_layer2(h)


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(0.05 * torch.randn(p.shape, generator=g))
        for m in model.modules():
            if isinstance(m, nn.BatchNorm3d):
                m.running_mean.copy_(
                    0.05 * torch.randn(m.running_mean.shape, generator=g))
                m.running_var.copy_(
                    1.0 + 0.1 * torch.rand(m.running_var.shape,
                                           generator=g))


def test_autoshot_parity_with_torch_mirror():
    model = TorchAutoShot().eval()
    _randomize(model)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = autoshot_from_state_dict(sd)

    rs = np.random.RandomState(0)
    frames = rs.randint(0, 255, (1, 12, 27, 48, 3)).astype(np.uint8)
    with torch.no_grad():
        t_one, t_many = model(torch.tensor(frames))
    j_one, j_many = jax.jit(
        lambda f: autoshot_forward(AUTOSHOT, params, f))(
        jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(j_one), t_one.numpy(),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_many), t_many.numpy(),
                               rtol=2e-3, atol=2e-4)


def test_autoshot_scorer_contract():
    params = init_autoshot(jax.random.PRNGKey(0))
    score = make_autoshot_scorer(params, window=12, pad=2)
    frames = np.zeros((20, 27, 48, 3), np.uint8)
    probs = score(frames)
    assert probs.shape == (20,)
    assert (probs >= 0).all() and (probs <= 1).all()
