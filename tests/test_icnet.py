"""ICNet (IC9600 image complexity) JAX model: numeric parity against a
hand-built torch mirror with the released checkpoint's parameter names
(reference ``preprocess/auxiliary/ICNet.py``; torchvision is not
installed here, so the mirror constructs resnet18 BasicBlocks directly
with matching state-dict keys)."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from frameino_tpu.preprocess.icnet import (ICNetConfig, icnet_forward,
                                           icnet_from_state_dict,
                                           init_icnet)


# --- torch mirror (checkpoint-shaped, no torchvision) ---------------------

class BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + idn)


def resnet_prefix():
    """= torchvision resnet18 children()[:5]: conv1,bn1,relu,maxpool,
    layer1 — Sequential indices 0,1,2,3,4 as in the checkpoint."""
    return nn.Sequential(
        nn.Conv2d(3, 64, 7, 2, 3, bias=False), nn.BatchNorm2d(64),
        nn.ReLU(), nn.MaxPool2d(3, 2, 1),
        nn.Sequential(BasicBlock(64, 64), BasicBlock(64, 64)))


def layer(cin, cout):
    return nn.Sequential(BasicBlock(cin, cout, 2), BasicBlock(cout, cout))


class Slam(nn.Module):
    def __init__(self, sd):
        super().__init__()
        self.spatial_dim = sd
        self.linear = nn.Sequential(nn.Linear(sd * sd, 512), nn.ReLU(),
                                    nn.Linear(512, 1), nn.Sigmoid())

    def forward(self, x):
        n, c, h, w = x.shape
        f = x if h == self.spatial_dim else F.interpolate(
            x, (self.spatial_dim, self.spatial_dim), mode="bilinear",
            align_corners=True)
        g = self.linear(f.view(n, c, -1)).unsqueeze(3)
        return g.expand_as(x) * x


class ToMap(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.to_map = nn.Sequential(nn.Conv2d(c, 1, 1), nn.Sigmoid())

    def forward(self, x):
        return self.to_map(x)


class ConvBnRelu(nn.Module):
    def __init__(self, cin, cout, k=3, p=1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, 1, p)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class UpConvBnRelu(nn.Module):
    def __init__(self, up, cin, cout):
        super().__init__()
        self.up_size = up
        self.conv = nn.Conv2d(cin, cout, 1)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        x = F.interpolate(x, (self.up_size, self.up_size),
                          mode="bilinear", align_corners=True)
        return F.relu(self.bn(self.conv(x)))


class TorchICNet(nn.Module):
    def __init__(self, size1=64, size2=32):
        super().__init__()
        self.size1, self.size2 = size1, size2
        self.b1_1, self.b1_1_slam = resnet_prefix(), Slam(32)
        self.b1_2, self.b1_2_slam = layer(64, 128), Slam(32)
        self.b2_1, self.b2_1_slam = resnet_prefix(), Slam(32)
        self.b2_2, self.b2_2_slam = layer(64, 128), Slam(32)
        self.b2_3, self.b2_3_slam = layer(128, 256), Slam(16)
        self.b2_4, self.b2_4_slam = layer(256, 512), Slam(8)
        up = size1 // 8
        self.up1 = UpConvBnRelu(up, 128, 256)
        self.up2 = UpConvBnRelu(up, 512, 256)
        self.to_map_f, self.to_map_f_slam = ConvBnRelu(512, 512), Slam(32)
        self.to_map = ToMap(512)
        self.to_score_f, self.to_score_f_slam = (ConvBnRelu(512, 512),
                                                 Slam(32))
        self.head = nn.Sequential(nn.Linear(512, 512), nn.ReLU(),
                                  nn.Linear(512, 1), nn.Sigmoid())

    def forward(self, x1):
        x2 = F.interpolate(x1, (self.size2, self.size2), mode="bilinear",
                           align_corners=True)
        x1 = self.b1_2_slam(self.b1_2(self.b1_1_slam(self.b1_1(x1))))
        x2 = self.b2_2_slam(self.b2_2(self.b2_1_slam(self.b2_1(x2))))
        x2 = self.b2_4_slam(self.b2_4(self.b2_3_slam(self.b2_3(x2))))
        x_cat = torch.cat((self.up1(x1), self.up2(x2)), dim=1)
        cly_map = self.to_map(self.to_map_f_slam(self.to_map_f(x_cat)))
        s = self.to_score_f_slam(self.to_score_f(x_cat))
        s = F.adaptive_avg_pool2d(s, 1).squeeze(-1).squeeze(-1)
        return self.head(s).squeeze(-1), cly_map


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(0.05 * torch.randn(p.shape, generator=g))
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.copy_(
                    0.05 * torch.randn(m.running_mean.shape, generator=g))
                m.running_var.copy_(1.0 + 0.1 * torch.rand(
                    m.running_var.shape, generator=g))


def test_icnet_parity_with_torch_mirror():
    """Random-init torch mirror -> state_dict -> JAX: score + map match
    (the tiny-random-init parity pattern of tests/test_wan_dit.py)."""
    cfg = ICNetConfig(size1=64, size2=32)
    model = TorchICNet(64, 32).eval()
    _randomize(model)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = icnet_from_state_dict(sd, cfg)

    rs = np.random.RandomState(0)
    x = rs.randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        t_score, t_map = model(torch.tensor(x).permute(0, 3, 1, 2))
    j_score, j_map = jax.jit(
        lambda a: icnet_forward(cfg, params, a))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_score), t_score.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(j_map)[..., 0], t_map.numpy()[:, 0], rtol=1e-4,
        atol=1e-5)


def test_icnet_random_init_contract():
    cfg = ICNetConfig(size1=64, size2=32)
    params = init_icnet(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 64, 64, 3))
    score, cmap = icnet_forward(cfg, params, x)
    assert score.shape == (1,) and cmap.shape == (1, 8, 8, 1)
    assert 0.0 <= float(score[0]) <= 1.0
