"""OneFormer JAX model: numeric parity against a hand-built torch
mirror with released-checkpoint parameter names (reference
``oneformer_code/oneformer/`` — pixel decoder, task-conditioned
transformer decoder, panoptic fusion)."""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from frameino_tpu.models.oneformer import (OneFormerConfig,
                                           init_oneformer,
                                           oneformer_forward,
                                           oneformer_from_state_dict,
                                           panoptic_inference,
                                           task_tokens)
from frameino_tpu.models.swin import tiny_swin_config
from tests.test_ms_deform_attn import _torch_reference
from tests.test_swin import TorchSwin


def tiny_of_config():
    from frameino_tpu.models.swin import SwinConfig
    tiny_swin4 = SwinConfig(embed_dim=16, depths=(1, 1, 1, 1),
                            num_heads=(2, 2, 4, 4), window_size=4)
    return OneFormerConfig(
        swin=tiny_swin4, num_classes=7, hidden_dim=32,
        num_queries=6, nheads=4, dim_feedforward=64, enc_ffn_dim=48,
        enc_layers=2, dec_layers=3, class_dec_layers=2, enc_points=2,
        mask_dim=32, task_seq_len=77)


# --- torch mirror ---------------------------------------------------------

class D2Conv(nn.Conv2d):
    """detectron2 Conv2d: optional .norm/.activation submodules."""

    def __init__(self, *a, norm=None, activation=None, **k):
        super().__init__(*a, **k)
        self.norm = norm
        self.activation = activation

    def forward(self, x):
        x = super().forward(x)
        if self.norm is not None:
            x = self.norm(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


class PositionEmbeddingSine(nn.Module):
    def __init__(self, num_pos_feats):
        super().__init__()
        self.n = num_pos_feats

    def forward(self, x):
        B, C, H, W = x.shape
        mask = torch.zeros(B, H, W, dtype=torch.bool)
        not_mask = ~mask
        y = not_mask.cumsum(1, dtype=torch.float32)
        xx = not_mask.cumsum(2, dtype=torch.float32)
        eps, scale = 1e-6, 2 * math.pi
        y = y / (y[:, -1:, :] + eps) * scale
        xx = xx / (xx[:, :, -1:] + eps) * scale
        dim_t = torch.arange(self.n, dtype=torch.float32)
        dim_t = 10000.0 ** (2 * (dim_t // 2) / self.n)
        px = xx[:, :, :, None] / dim_t
        py = y[:, :, :, None] / dim_t
        px = torch.stack((px[..., 0::2].sin(), px[..., 1::2].cos()),
                         dim=4).flatten(3)
        py = torch.stack((py[..., 0::2].sin(), py[..., 1::2].cos()),
                         dim=4).flatten(3)
        return torch.cat((py, px), dim=3).permute(0, 3, 1, 2)


class TorchMSDeformAttn(nn.Module):
    def __init__(self, d, levels, heads, points):
        super().__init__()
        self.h, self.l, self.p = heads, levels, points
        self.sampling_offsets = nn.Linear(d, heads * levels * points * 2)
        self.attention_weights = nn.Linear(d, heads * levels * points)
        self.value_proj = nn.Linear(d, d)
        self.output_proj = nn.Linear(d, d)

    def forward(self, query, reference_points, src, shapes):
        B, S, C = src.shape
        value = self.value_proj(src).view(B, S, self.h, C // self.h)
        off = self.sampling_offsets(query).view(B, S, self.h, self.l,
                                                self.p, 2)
        w = self.attention_weights(query).view(B, S, self.h,
                                               self.l * self.p)
        w = w.softmax(-1).view(B, S, self.h, self.l, self.p)
        normalizer = torch.tensor([[wd, ht] for ht, wd in shapes],
                                  dtype=torch.float32)
        loc = reference_points[:, :, None, :, None, :] \
            + off / normalizer[None, None, None, :, None, :]
        out = torch.from_numpy(_torch_reference(
            value.detach().numpy(), shapes, loc.detach().numpy(),
            w.detach().numpy()))
        return self.output_proj(out)


class TorchEncLayer(nn.Module):
    def __init__(self, d, ffn, levels, heads, points):
        super().__init__()
        self.self_attn = TorchMSDeformAttn(d, levels, heads, points)
        self.norm1 = nn.LayerNorm(d)
        self.linear1 = nn.Linear(d, ffn)
        self.linear2 = nn.Linear(ffn, d)
        self.norm2 = nn.LayerNorm(d)

    def forward(self, src, pos, ref, shapes):
        src2 = self.self_attn(src + pos, ref, src, shapes)
        src = self.norm1(src + src2)
        src2 = self.linear2(F.relu(self.linear1(src)))
        return self.norm2(src + src2)


class TorchPixelDecoder(nn.Module):
    def __init__(self, cfg: OneFormerConfig, in_dims):
        super().__init__()
        C = cfg.hidden_dim
        self.cfg = cfg
        self.input_proj = nn.ModuleList([
            nn.Sequential(nn.Conv2d(d, C, 1), nn.GroupNorm(32 if C >= 32
                                                           else 4, C))
            for d in in_dims[::-1][:3]])       # res5, res4, res3
        self.transformer = nn.Module()
        self.transformer.level_embed = nn.Parameter(torch.zeros(3, C))
        self.transformer.encoder = nn.Module()
        self.transformer.encoder.layers = nn.ModuleList([
            TorchEncLayer(C, cfg.enc_ffn_dim, 3, cfg.nheads,
                          cfg.enc_points)
            for _ in range(cfg.enc_layers)])
        gn = 32 if C >= 32 else 4
        self.adapter_1 = D2Conv(in_dims[0], C, 1, bias=False,
                                norm=nn.GroupNorm(gn, C))
        self.layer_1 = D2Conv(C, C, 3, padding=1, bias=False,
                              norm=nn.GroupNorm(gn, C),
                              activation=F.relu)
        self.mask_features = nn.Conv2d(C, cfg.mask_dim, 1)
        self.pe = PositionEmbeddingSine(C // 2)

    def forward(self, feats):
        cfg = self.cfg
        srcs, poss, shapes = [], [], []
        for i, name in enumerate(["res5", "res4", "res3"]):
            x = feats[name]
            srcs.append(self.input_proj[i](x))
            poss.append(self.pe(x))
            shapes.append(tuple(x.shape[-2:]))
        src_f, pos_f = [], []
        for lvl, (s, p) in enumerate(zip(srcs, poss)):
            src_f.append(s.flatten(2).transpose(1, 2))
            pos_f.append(p.flatten(2).transpose(1, 2)
                         + self.transformer.level_embed[lvl].view(1, 1, -1))
        src = torch.cat(src_f, 1)
        pos = torch.cat(pos_f, 1)
        refs = []
        for (H, W) in shapes:
            ry, rx = torch.meshgrid(
                torch.linspace(0.5, H - 0.5, H) / H,
                torch.linspace(0.5, W - 0.5, W) / W, indexing="ij")
            refs.append(torch.stack((rx.reshape(-1), ry.reshape(-1)),
                                    -1))
        ref = torch.cat(refs, 0)[None, :, None, :].repeat(
            src.shape[0], 1, 3, 1)
        for layer in self.transformer.encoder.layers:
            src = layer(src, pos, ref, shapes)
        sizes = [h * w for h, w in shapes]
        out = []
        start = 0
        for i, n in enumerate(sizes):
            out.append(src[:, start:start + n].transpose(1, 2).view(
                -1, self.cfg.hidden_dim, *shapes[i]))
            start += n
        lat = self.adapter_1(feats["res2"])
        y = lat + F.interpolate(out[-1], size=lat.shape[-2:],
                                mode="bilinear", align_corners=False)
        y = self.layer_1(y)
        return self.mask_features(y), out


class SelfAttentionLayer(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(d, h, dropout=0.0)
        self.norm = nn.LayerNorm(d)

    def forward(self, tgt, query_pos):
        q = k = tgt + query_pos
        tgt2 = self.self_attn(q, k, value=tgt)[0]
        return self.norm(tgt + tgt2)


class CrossAttentionLayer(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.multihead_attn = nn.MultiheadAttention(d, h, dropout=0.0)
        self.norm = nn.LayerNorm(d)

    def forward(self, tgt, memory, memory_mask, pos, query_pos):
        tgt2 = self.multihead_attn(query=tgt + query_pos,
                                   key=memory + pos, value=memory,
                                   attn_mask=memory_mask)[0]
        return self.norm(tgt + tgt2)


class FFNLayer(nn.Module):
    def __init__(self, d, ffn):
        super().__init__()
        self.linear1 = nn.Linear(d, ffn)
        self.linear2 = nn.Linear(ffn, d)
        self.norm = nn.LayerNorm(d)

    def forward(self, tgt):
        tgt2 = self.linear2(F.relu(self.linear1(tgt)))
        return self.norm(tgt + tgt2)


class DetrDecoderLayer(nn.Module):
    def __init__(self, d, h, ffn):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(d, h, dropout=0.0)
        self.multihead_attn = nn.MultiheadAttention(d, h, dropout=0.0)
        self.linear1 = nn.Linear(d, ffn)
        self.linear2 = nn.Linear(ffn, d)
        self.norm1 = nn.LayerNorm(d)
        self.norm2 = nn.LayerNorm(d)
        self.norm3 = nn.LayerNorm(d)

    def forward(self, tgt, memory, pos, query_pos):
        q = k = tgt + query_pos
        tgt = self.norm1(tgt + self.self_attn(q, k, value=tgt)[0])
        tgt = self.norm2(tgt + self.multihead_attn(
            query=tgt + query_pos, key=memory + pos, value=memory)[0])
        tgt2 = self.linear2(F.relu(self.linear1(tgt)))
        return self.norm3(tgt + tgt2)


class MLP(nn.Module):
    def __init__(self, i, h, o, n):
        super().__init__()
        dims = [i] + [h] * (n - 1)
        self.layers = nn.ModuleList(
            nn.Linear(a, b) for a, b in zip(dims, dims[1:] + [o]))

    def forward(self, x):
        for j, l in enumerate(self.layers):
            x = F.relu(l(x)) if j < len(self.layers) - 1 else l(x)
        return x


class TorchPredictor(nn.Module):
    def __init__(self, cfg: OneFormerConfig):
        super().__init__()
        C, h = cfg.hidden_dim, cfg.nheads
        self.cfg = cfg
        self.pe = PositionEmbeddingSine(C // 2)
        self.class_transformer = nn.Module()
        self.class_transformer.decoder = nn.Module()
        self.class_transformer.decoder.layers = nn.ModuleList(
            DetrDecoderLayer(C, h, cfg.dim_feedforward)
            for _ in range(cfg.class_dec_layers))
        self.class_transformer.decoder.norm = nn.LayerNorm(C)
        self.transformer_self_attention_layers = nn.ModuleList(
            SelfAttentionLayer(C, h) for _ in range(cfg.dec_layers))
        self.transformer_cross_attention_layers = nn.ModuleList(
            CrossAttentionLayer(C, h) for _ in range(cfg.dec_layers))
        self.transformer_ffn_layers = nn.ModuleList(
            FFNLayer(C, cfg.dim_feedforward)
            for _ in range(cfg.dec_layers))
        self.decoder_norm = nn.LayerNorm(C)
        self.query_embed = nn.Embedding(cfg.num_queries, C)
        self.level_embed = nn.Embedding(3, C)
        self.class_input_proj = nn.Conv2d(C, C, 1)
        self.class_embed = nn.Linear(C, cfg.num_classes + 1)
        self.mask_embed = MLP(C, C, cfg.mask_dim, 3)

    def prediction_heads(self, output, mask_features, size):
        dec = self.decoder_norm(output).transpose(0, 1)
        oc = self.class_embed(dec)
        me = self.mask_embed(dec)
        om = torch.einsum("bqc,bchw->bqhw", me, mask_features)
        am = F.interpolate(om, size=size, mode="bilinear",
                           align_corners=False)
        am = (am.sigmoid().flatten(2).unsqueeze(1).repeat(
            1, self.cfg.nheads, 1, 1).flatten(0, 1) < 0.5).bool()
        return oc, om, am

    def forward(self, x, mask_features, tasks):
        src, pos, size_list = [], [], []
        for i in range(3):
            size_list.append(x[i].shape[-2:])
            pos.append(self.pe(x[i]).flatten(2).permute(2, 0, 1))
            src.append(x[i].flatten(2).permute(2, 0, 1)
                       + self.level_embed.weight[i][None, None, :])
        bs = src[0].shape[1]
        query_embed = self.query_embed.weight.unsqueeze(1).repeat(
            1, bs, 1)
        tasks = tasks.unsqueeze(0)                  # [1, B, C]
        tasks = self.decoder_norm(tasks)
        feats = self.pe(mask_features)
        # class transformer (0 enc layers): memory = flattened feats PE,
        # decoder pos = projected mask features (the reference arg swap)
        memory = feats.flatten(2).permute(2, 0, 1)
        cls_pos = self.class_input_proj(mask_features).flatten(
            2).permute(2, 0, 1)
        qe = self.query_embed.weight[:-1].unsqueeze(1).repeat(1, bs, 1)
        tgt = tasks.repeat(qe.shape[0], 1, 1)
        for layer in self.class_transformer.decoder.layers:
            tgt = layer(tgt, memory, cls_pos, qe)
        out_t = self.class_transformer.decoder.norm(tgt)
        out = torch.cat([out_t, tasks], dim=0)      # [Q, B, C]
        output = out.clone()
        _, _, attn_mask = self.prediction_heads(output, mask_features,
                                                size_list[0])
        for i in range(self.cfg.dec_layers):
            lvl = i % 3
            attn_mask[torch.where(
                attn_mask.sum(-1) == attn_mask.shape[-1])] = False
            output = self.transformer_cross_attention_layers[i](
                output, src[lvl], attn_mask, pos[lvl], query_embed)
            output = self.transformer_self_attention_layers[i](
                output, query_embed)
            output = self.transformer_ffn_layers[i](output)
            _, _, attn_mask = self.prediction_heads(
                output, mask_features, size_list[(i + 1) % 3])
        oc, om, _ = self.prediction_heads(output, mask_features,
                                          size_list[0])
        return oc, om


class TorchOneFormer(nn.Module):
    def __init__(self, cfg: OneFormerConfig):
        super().__init__()
        self.cfg = cfg
        self.backbone = TorchSwin(cfg.swin)
        dims = [cfg.swin.embed_dim * 2 ** i
                for i in range(len(cfg.swin.depths))]
        self.sem_seg_head = nn.Module()
        self.sem_seg_head.pixel_decoder = TorchPixelDecoder(cfg, dims)
        self.sem_seg_head.predictor = TorchPredictor(cfg)
        self.task_mlp = MLP(cfg.task_seq_len, cfg.hidden_dim,
                            cfg.hidden_dim, 2)

    def forward(self, img, task):
        feats = self.backbone(img)
        mask_features, ms = self.sem_seg_head.pixel_decoder(feats)
        t = self.task_mlp(task)
        return self.sem_seg_head.predictor(ms, mask_features, t)


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(0.05 * torch.randn(p.shape, generator=g))


def test_oneformer_parity_with_torch_mirror():
    """Tiny-random-init full-graph parity (the tests/test_wan_dit.py:60
    pattern): torch mirror state_dict -> oneformer_from_state_dict ->
    logits + mask logits match."""
    cfg = tiny_of_config()
    model = TorchOneFormer(cfg).eval()
    _randomize(model)
    sd = {k: v.numpy() for k, v in model.state_dict().items()
          if "relative_position_index" not in k}
    params = oneformer_from_state_dict(sd, cfg)

    rs = np.random.RandomState(1)
    x = rs.randn(1, 64, 96, 3).astype(np.float32)
    task = task_tokens("panoptic")[None]
    with torch.no_grad():
        t_cls, t_mask = model(torch.tensor(x).permute(0, 3, 1, 2),
                              torch.tensor(task))
    j_cls, j_mask = jax.jit(
        lambda a, t: oneformer_forward(cfg, params, a, t))(
        jnp.asarray(x), jnp.asarray(task))
    np.testing.assert_allclose(np.asarray(j_cls), t_cls.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_mask), t_mask.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_panoptic_inference_fusion():
    """Reference fusion semantics (oneformer_model.py:378-434): stuff
    merge, overlap suppression, confidence gate."""
    Q, H, W = 4, 8, 8
    K = 5
    mask_cls = np.full((Q, K + 1), -10.0, np.float32)
    mask_pred = np.full((Q, H, W), -10.0, np.float32)
    # q0: thing class 1, left half
    mask_cls[0, 1] = 10.0
    mask_pred[0, :, :4] = 10.0
    # q1 + q2: same stuff class 3, disjoint regions -> one merged id
    mask_cls[1, 3] = 10.0
    mask_pred[1, :, 4:6] = 10.0
    mask_cls[2, 3] = 9.0
    mask_pred[2, :, 6:8] = 10.0
    # q3: no-object (class K) -> dropped
    mask_cls[3, K] = 10.0
    mask_pred[3] = 10.0
    seg, info = panoptic_inference(mask_cls, mask_pred, thing_ids=[1],
                                   object_mask_threshold=0.8,
                                   overlap_threshold=0.8)
    assert len(info) == 2                 # merged stuff = one segment
    by_cat = {s["category_id"]: s for s in info}
    assert by_cat[1]["isthing"] and not by_cat[3]["isthing"]
    assert (seg[:, :4] == by_cat[1]["id"]).all()
    # both stuff regions carry the SAME merged segment id
    assert (seg[:, 4:] == by_cat[3]["id"]).all()


def test_task_tokens_shape():
    t = task_tokens("panoptic")
    assert t.shape == (77,) and t[0] == 49406 and t.dtype == np.float32
    with pytest.raises(KeyError):
        task_tokens("detection")


def test_coco_class_lists_consistent():
    """133 contiguous names; the reference's MOTIONABLE/OBJECT/
    NON-OBJECT class names all resolve in it."""
    from frameino_tpu.preprocess.panoptic_oneformer import (
        COCO_PANOPTIC_CLASSES, COCO_THING_IDS, MOTIONABLE_OBJECT)
    assert len(COCO_PANOPTIC_CLASSES) == 133
    assert len(set(COCO_PANOPTIC_CLASSES)) == 133
    assert len(COCO_THING_IDS) == 80
    for name in MOTIONABLE_OBJECT:
        assert name in COCO_PANOPTIC_CLASSES, name
    # reference NON_OBJECT_CLASS spot checks (filter_panoptic_multi.py)
    for name in ("sky-other-merged", "wall-brick", "playingfield",
                 "food-other-merged", "door-stuff", "rug-merged"):
        assert name in COCO_PANOPTIC_CLASSES, name


def test_oneformer_segmenter_contract():
    """Tiny random model through the curation adapter: semantic labels
    '{class}_{id}' + boolean masks at the original resolution, and the
    MOTIONABLE filter drops non-movable classes."""
    from frameino_tpu.preprocess.panoptic_oneformer import (
        COCO_PANOPTIC_CLASSES, OneFormerSegmenter)
    cfg = tiny_of_config()
    params = init_oneformer(jax.random.PRNGKey(0), cfg)
    seg = OneFormerSegmenter(params, cfg=cfg, min_size=32, max_size=64,
                             object_mask_threshold=0.0)
    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (40, 56, 3)).astype(np.uint8)
    out = seg(img)
    names = [n for n in COCO_PANOPTIC_CLASSES[:cfg.num_classes]]
    for label, mask in out:
        cls, sid = label.rsplit("_", 1)
        assert cls in names and sid.isdigit()
        assert mask.shape == (40, 56) and mask.dtype == bool
    # motionable filter with a synthetic panoptic result
    seg.motionable_only = True
    pan = np.zeros((40, 56), np.int32)
    pan[:10] = 1
    pan[20:] = 2
    seg.panoptic = lambda im: (pan, [
        {"id": 1, "isthing": True, "category_id": 0},    # person
        {"id": 2, "isthing": True, "category_id": 9}])   # traffic light
    out = seg(img)
    assert [l for l, _ in out] == ["person_1"]
