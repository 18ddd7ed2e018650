"""VGGT4Track camera model: numeric parity against a hand-built torch
mirror with released-checkpoint parameter names (reference
``preprocess/SpaTrackV2_code/models/vggt4track/`` camera path)."""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from frameino_tpu.models.vggt import (RESNET_MEAN, RESNET_STD, VGGTConfig,
                                      init_vggt, pose_encoding_to_extri_intri,
                                      preprocess_frames, quat_to_mat,
                                      tiny_vggt_config, vggt_camera_forward,
                                      vggt_from_state_dict)


# --- torch mirror ---------------------------------------------------------

class LayerScale(nn.Module):
    def __init__(self, dim, init):
        super().__init__()
        self.gamma = nn.Parameter(init * torch.ones(dim))

    def forward(self, x):
        return x * self.gamma


class Rope2D:
    """Reference RotaryPositionEmbedding2D (rope.py:63-188)."""

    def __init__(self, freq=100.0):
        self.freq = freq

    def _tab(self, dim, max_pos):
        exp = torch.arange(0, dim, 2).float() / dim
        inv = 1.0 / (self.freq ** exp)
        pos = torch.arange(max_pos, dtype=inv.dtype)
        ang = torch.einsum("i,j->ij", pos, inv)
        ang = torch.cat((ang, ang), dim=-1)
        return ang.cos(), ang.sin()

    @staticmethod
    def _rot(x):
        d = x.shape[-1]
        return torch.cat((-x[..., d // 2:], x[..., :d // 2]), dim=-1)

    def __call__(self, tokens, positions):
        fd = tokens.size(-1) // 2
        cos, sin = self._tab(fd, int(positions.max()) + 1)
        v, h = tokens.chunk(2, dim=-1)

        def ap(t, pos):
            c = F.embedding(pos, cos)[:, None]
            s = F.embedding(pos, sin)[:, None]
            return t * c + self._rot(t) * s

        return torch.cat((ap(v, positions[..., 0]),
                          ap(h, positions[..., 1])), dim=-1)


class Attention(nn.Module):
    def __init__(self, dim, heads, qk_norm, rope=None):
        super().__init__()
        self.h = heads
        self.d = dim // heads
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.q_norm = nn.LayerNorm(self.d) if qk_norm else nn.Identity()
        self.k_norm = nn.LayerNorm(self.d) if qk_norm else nn.Identity()
        self.rope = rope

    def forward(self, x, pos=None):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.h, self.d).permute(
            2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        q, k = self.q_norm(q), self.k_norm(k)
        if self.rope is not None and pos is not None:
            q = self.rope(q, pos)
            k = self.rope(k, pos)
        o = F.scaled_dot_product_attention(q, k, v)
        return self.proj(o.transpose(1, 2).reshape(B, N, C))


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class Block(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4.0, init_values=None,
                 qk_norm=False, rope=None):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = Attention(dim, heads, qk_norm, rope)
        self.ls1 = LayerScale(dim, init_values)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))
        self.ls2 = LayerScale(dim, init_values)

    def forward(self, x, pos=None):
        x = x + self.ls1(self.attn(self.norm1(x), pos))
        return x + self.ls2(self.mlp(self.norm2(x)))


class InnerPatchEmbed(nn.Module):
    def __init__(self, ps, dim):
        super().__init__()
        self.proj = nn.Conv2d(3, dim, ps, ps)


class DinoViT(nn.Module):
    def __init__(self, cfg: VGGTConfig):
        super().__init__()
        C = cfg.embed_dim
        self.cfg = cfg
        self.patch_embed = InnerPatchEmbed(cfg.patch_size, C)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, C))
        n = (cfg.img_size // cfg.patch_size) ** 2
        self.pos_embed = nn.Parameter(torch.zeros(1, n + 1, C))
        self.register_tokens = nn.Parameter(
            torch.zeros(1, cfg.num_register_tokens, C))
        self.blocks = nn.ModuleList(
            Block(C, cfg.vit_heads, cfg.mlp_ratio, 1.0)
            for _ in range(cfg.vit_depth))
        self.norm = nn.LayerNorm(C)

    def forward(self, x):                      # [N, 3, H, W]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(x.shape[0], -1, -1), x],
                      dim=1)
        x = x + self.pos_embed                 # square input: no interp
        x = torch.cat([x[:, :1],
                       self.register_tokens.expand(x.shape[0], -1, -1),
                       x[:, 1:]], dim=1)
        for b in self.blocks:
            x = b(x)
        x = self.norm(x)
        return x[:, self.cfg.num_register_tokens + 1:]


class Aggregator(nn.Module):
    def __init__(self, cfg: VGGTConfig):
        super().__init__()
        C = cfg.embed_dim
        self.cfg = cfg
        self.patch_embed = DinoViT(cfg)
        rope = Rope2D(cfg.rope_freq)
        self.frame_blocks = nn.ModuleList(
            Block(C, cfg.num_heads, cfg.mlp_ratio, 0.01, qk_norm=True,
                  rope=rope) for _ in range(cfg.depth))
        self.global_blocks = nn.ModuleList(
            Block(C, cfg.num_heads, cfg.mlp_ratio, 0.01, qk_norm=True,
                  rope=rope) for _ in range(cfg.depth))
        self.camera_token = nn.Parameter(torch.zeros(1, 2, 1, C))
        self.register_token = nn.Parameter(
            torch.zeros(1, 2, cfg.num_register_tokens, C))

    def forward(self, images):                 # [B, S, 3, H, W] in [0,1]
        cfg = self.cfg
        B, S, _, H, W = images.shape
        mean = torch.tensor(RESNET_MEAN).view(1, 1, 3, 1, 1)
        std = torch.tensor(RESNET_STD).view(1, 1, 3, 1, 1)
        x = (images - mean) / std
        patch = self.patch_embed(x.view(B * S, 3, H, W))

        def expand(tok):
            first = tok[:, 0:1].expand(B, 1, *tok.shape[2:])
            rest = tok[:, 1:].expand(B, S - 1, *tok.shape[2:])
            return torch.cat([first, rest], 1).reshape(
                B * S, *tok.shape[2:])

        tokens = torch.cat([expand(self.camera_token),
                            expand(self.register_token), patch], dim=1)
        P, C = tokens.shape[1], tokens.shape[2]
        gh, gw = H // cfg.patch_size, W // cfg.patch_size
        ys, xs = torch.meshgrid(torch.arange(gh), torch.arange(gw),
                                indexing="ij")
        pos = torch.stack([ys.flatten(), xs.flatten()], -1)[None] \
            .expand(B * S, -1, -1) + 1
        n_special = 1 + cfg.num_register_tokens
        pos = torch.cat([torch.zeros(B * S, n_special, 2,
                                     dtype=pos.dtype), pos], dim=1)
        fo = go = None
        for i in range(cfg.depth):
            tokens = tokens.view(B * S, P, C)
            tokens = self.frame_blocks[i](tokens, pos)
            fo = tokens.view(B, S, P, C)
            tokens = tokens.view(B, S * P, C)
            tokens = self.global_blocks[i](
                tokens, pos.reshape(B, S * P, 2))
            go = tokens.view(B, S, P, C)
        return torch.cat([fo, go], dim=-1)[:, :, 0]


class CameraHead(nn.Module):
    def __init__(self, cfg: VGGTConfig):
        super().__init__()
        C2 = 2 * cfg.embed_dim
        self.cfg = cfg
        self.trunk = nn.Sequential(*[
            Block(C2, cfg.num_heads, cfg.mlp_ratio, 0.01)
            for _ in range(cfg.cam_trunk_depth)])
        self.token_norm = nn.LayerNorm(C2)
        self.trunk_norm = nn.LayerNorm(C2)
        self.empty_pose_tokens = nn.Parameter(torch.zeros(1, 1, 9))
        self.embed_pose = nn.Linear(9, C2)
        self.poseLN_modulation = nn.Sequential(
            nn.SiLU(), nn.Linear(C2, 3 * C2))
        self.adaln_norm = nn.LayerNorm(C2, elementwise_affine=False,
                                       eps=1e-6)
        self.pose_branch = Mlp(C2, C2 // 2)
        self.pose_branch.fc2 = nn.Linear(C2 // 2, 9)

    def forward(self, tokens):
        t = self.token_norm(tokens)
        pred = None
        for _ in range(self.cfg.cam_iterations):
            inp = (self.empty_pose_tokens.expand(t.shape[0],
                                                 t.shape[1], -1)
                   if pred is None else pred)
            mod = self.poseLN_modulation(self.embed_pose(inp))
            shift, scale, gate = mod.chunk(3, dim=-1)
            h = gate * (self.adaln_norm(t) * (1 + scale) + shift) + t
            h = self.trunk(h)
            delta = self.pose_branch(self.trunk_norm(h))
            pred = delta if pred is None else pred + delta
        return torch.cat([pred[..., :7], F.relu(pred[..., 7:])], -1)


class TorchVGGT(nn.Module):
    def __init__(self, cfg: VGGTConfig):
        super().__init__()
        self.aggregator = Aggregator(cfg)
        self.camera_head = CameraHead(cfg)

    def forward(self, images):
        return self.camera_head(self.aggregator(images))


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(0.05 * torch.randn(p.shape, generator=g))


def test_vggt_parity_with_torch_mirror():
    cfg = tiny_vggt_config()
    model = TorchVGGT(cfg).eval()
    _randomize(model)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = vggt_from_state_dict(sd, cfg)

    rs = np.random.RandomState(0)
    imgs = rs.rand(1, 3, cfg.img_size, cfg.img_size, 3).astype(
        np.float32)
    with torch.no_grad():
        t_enc = model(torch.tensor(imgs).permute(0, 1, 4, 2, 3))

    from frameino_tpu.models.vggt import (aggregator_forward,
                                          camera_head_forward)
    j_tok = aggregator_forward(cfg, params["aggregator"],
                               jnp.asarray(imgs))
    j_enc = camera_head_forward(cfg, params["camera_head"], j_tok)
    np.testing.assert_allclose(np.asarray(j_enc), t_enc.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_pose_decoding_matches_reference_math():
    """quat_to_mat + FoV intrinsics against independent numpy math."""
    rs = np.random.RandomState(1)
    q = rs.randn(2, 3, 4).astype(np.float32)
    R = np.asarray(quat_to_mat(jnp.asarray(q)))
    # rotation matrices: orthogonal with det 1
    eye = np.einsum("bsij,bskj->bsik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    enc = np.concatenate([rs.randn(1, 2, 3), q[:1, :2],
                          np.abs(rs.randn(1, 2, 2)) + 0.5], -1)
    extr, intr = pose_encoding_to_extri_intri(
        jnp.asarray(enc, jnp.float32), (100, 200))
    intr = np.asarray(intr)
    fov_h, fov_w = enc[..., 7], enc[..., 8]
    np.testing.assert_allclose(intr[..., 1, 1],
                               (100 / 2) / np.tan(fov_h / 2), rtol=1e-5)
    np.testing.assert_allclose(intr[..., 0, 0],
                               (200 / 2) / np.tan(fov_w / 2), rtol=1e-5)
    assert intr[0, 0, 0, 2] == 100.0 and intr[0, 0, 1, 2] == 50.0


def test_camera_forward_contract_and_adapter():
    """Full camera forward + SpaTrackV2 camera_info adapter feeds
    calculate_camera_motion (camera_pose.py)."""
    cfg = tiny_vggt_config()
    params = init_vggt(jax.random.PRNGKey(0), cfg)
    # bias the FoV outputs positive (random init can relu to 0 -> inf
    # focal; real checkpoints predict positive FoVs)
    params["camera_head"]["pose_branch"]["fc2"]["b"] = \
        params["camera_head"]["pose_branch"]["fc2"]["b"].at[7:].set(1.0)
    imgs = jnp.asarray(np.random.RandomState(0).rand(
        1, 4, cfg.img_size, cfg.img_size, 3).astype(np.float32))
    poses, intrs = vggt_camera_forward(cfg, params, imgs)
    assert poses.shape == (1, 4, 4, 4) and intrs.shape == (1, 4, 3, 3)
    poses = np.asarray(poses)
    # bottom row of a c2w homogeneous pose
    np.testing.assert_allclose(
        poses[..., 3, :],
        np.broadcast_to([0.0, 0, 0, 1], poses[..., 3, :].shape),
        atol=1e-4)

    info = {"rotation": poses[0, :, :3, :3].tolist(),
            "translation": poses[0, :, :3, 3].tolist(),
            "focal_x": np.asarray(intrs)[0, :, 0, 0].tolist(),
            "focal_y": np.asarray(intrs)[0, :, 1, 1].tolist()}
    from frameino_tpu.preprocess.camera_pose import calculate_camera_motion
    r, t, f = calculate_camera_motion(info)
    assert np.isfinite([r, t, f]).all()


def test_preprocess_frames_crop_mode():
    frames = np.zeros((2, 100, 200, 3), np.uint8)
    out = preprocess_frames(frames, target=56)
    # width -> 56, height round(100 * 56/200 / 14)*14 = 28
    assert out.shape == (2, 28, 56, 3)
    assert out.dtype == np.float32 and out.max() <= 1.0
