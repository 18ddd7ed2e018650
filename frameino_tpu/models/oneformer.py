"""OneFormer (COCO-133 panoptic, Swin-L) — JAX reimplementation of the
reference's curation segmenter (``preprocess/oneformer_code/oneformer/``;
run by ``preprocess/filter_panoptic_multi.py:133-218`` as the step-4
panoptic model).

Inference graph (``oneformer_model.py:247-320``):
  Swin backbone (``models/swin.py``) -> MSDeformAttn pixel decoder
  (6-layer deformable encoder over res3/4/5 + FPN lateral to res2 ->
  mask_features, ``pixel_decoder/msdeformattn.py:165-358``) ->
  task-conditioned transformer decoder (2-layer DETR "class" transformer
  seeding 149 queries from the task token + 9 masked-attention layers,
  ``transformer_decoder/oneformer_transformer_decoder.py:255-520``) ->
  class logits [Q,134] + mask logits [Q,H/4,W/4] -> panoptic fusion
  (``oneformer_model.py:378-434``).

The task token is ``task_mlp(token_ids_as_floats)`` over the CLIP-BPE
ids of "The task is {panoptic|instance|semantic}" — fixed strings, so
the id vectors are shipped as constants (computed with the reference
tokenizer's vocab; ``data/tokenizer.py:86-118``). The text encoder /
projector / prompt_ctx exist only for the training-time contrastive
loss and are not part of this inference graph.

``oneformer_from_state_dict`` maps released detectron2 checkpoint names
(``backbone.*``, ``sem_seg_head.pixel_decoder.*``,
``sem_seg_head.predictor.*``, ``task_mlp.*``) so public OneFormer
weights drop in. Numerics are parity-tested against hand-built torch
mirrors (``tests/test_oneformer.py``).

TPU notes: NHWC features, static shapes per (H, W) — one XLA program
per padded image size; the deformable sampling uses the shared
``ops/ms_deform_attn`` XLA gather kernel; panoptic fusion is host-side
numpy (per-query loop over at most 150 queries, not a hot path).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from frameino_tpu.models.swin import (SWIN_L, SwinConfig, init_swin,
                                      swin_forward, swin_from_state_dict)
from frameino_tpu.ops.ms_deform_attn import ms_deform_attn

Params = Dict


@dataclasses.dataclass(frozen=True)
class OneFormerConfig:
    swin: SwinConfig = SWIN_L
    num_classes: int = 133
    hidden_dim: int = 256
    num_queries: int = 150
    nheads: int = 8
    dim_feedforward: int = 2048
    enc_ffn_dim: int = 1024        # deformable encoder FFN (``:309``)
    enc_layers: int = 6
    dec_layers: int = 9            # DEC_LAYERS 10 - 1 (``from_config``)
    class_dec_layers: int = 2
    enc_points: int = 4
    mask_dim: int = 256
    task_seq_len: int = 77
    size_divisibility: int = 32
    layer_norm_eps: float = 1e-5


ONEFORMER_COCO_SWIN_L = OneFormerConfig()

# CLIP-BPE ids of the three task strings (sot ... eot; zero-padded to
# task_seq_len). Computed with the reference tokenizer + its
# bpe_simple_vocab_16e6 merges; constants because the strings are fixed
# ("The task is {x}", demo/defaults.py:73).
TASK_TOKEN_IDS = {
    "panoptic": [49406, 518, 10549, 533, 1072, 24755, 49407],
    "instance": [49406, 518, 10549, 533, 34572, 49407],
    "semantic": [49406, 518, 10549, 533, 29119, 1550, 49407],
}


def task_tokens(task: str, seq_len: int = 77) -> np.ndarray:
    ids = TASK_TOKEN_IDS[task]
    out = np.zeros((seq_len,), np.float32)
    out[:len(ids)] = ids
    return out


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------

def _linear(p, x):
    out = x @ p["w"]
    if "b" in p:
        out = out + p["b"]
    return out


def _layer_norm(p, x, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _group_norm(p, x, groups=32, eps=1e-5):
    """x: [B, H, W, C]; torch GroupNorm semantics."""
    B, H, W, C = x.shape
    xg = x.reshape(B, H * W, groups, C // groups)
    mu = xg.mean(axis=(1, 3), keepdims=True)
    var = ((xg - mu) ** 2).mean(axis=(1, 3), keepdims=True)
    xg = (xg - mu) * jax.lax.rsqrt(var + eps)
    return xg.reshape(B, H, W, C) * p["scale"] + p["bias"]


def _conv(p, x, stride=1, padding="SAME"):
    out = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in p:
        out = out + p["b"]
    return out


def _mha(p, q, k, v, nheads: int, mask=None):
    """torch nn.MultiheadAttention semantics (packed in_proj).
    q/k/v: [B, L, C]; mask: additive-or-bool [B*h, Lq, Lk] (True =
    blocked) or None."""
    B, Lq, C = q.shape
    d = C // nheads
    wq, wk, wv = jnp.split(p["in_w"], 3, axis=1)   # stored [C, 3C]
    bq, bk, bv = jnp.split(p["in_b"], 3)
    qh = (q @ wq + bq).reshape(B, Lq, nheads, d).transpose(0, 2, 1, 3)
    kh = (k @ wk + bk).reshape(B, -1, nheads, d).transpose(0, 2, 1, 3)
    vh = (v @ wv + bv).reshape(B, -1, nheads, d).transpose(0, 2, 1, 3)
    attn = (qh * (d ** -0.5)) @ kh.transpose(0, 1, 3, 2)
    if mask is not None:
        m = mask.reshape(B, nheads, Lq, -1)
        attn = jnp.where(m, -jnp.inf, attn) if m.dtype == jnp.bool_ \
            else attn + m
        # a fully-masked row would produce NaNs; the decoder pre-clears
        # such rows, but keep softmax safe regardless
        attn = jnp.where(jnp.isneginf(attn).all(-1, keepdims=True), 0.0,
                         attn)
    attn = jax.nn.softmax(attn, axis=-1)
    out = (attn @ vh).transpose(0, 2, 1, 3).reshape(B, Lq, C)
    return _linear(p["out"], out)


def position_embedding_sine(H: int, W: int, num_pos_feats: int = 128,
                            temperature: float = 10000.0) -> np.ndarray:
    """[H, W, 2*num_pos_feats] (y-part then x-part), normalize=True
    (``transformer_decoder/position_encoding.py:15-56``)."""
    scale = 2 * math.pi
    eps = 1e-6
    y = (np.arange(1, H + 1, dtype=np.float64)[:, None] / (H + eps)
         * scale) * np.ones((1, W))
    x = (np.arange(1, W + 1, dtype=np.float64)[None, :] / (W + eps)
         * scale) * np.ones((H, 1))
    dim_t = temperature ** (2 * (np.arange(num_pos_feats) // 2)
                            / num_pos_feats)
    px = x[:, :, None] / dim_t
    py = y[:, :, None] / dim_t
    px = np.stack([np.sin(px[..., 0::2]), np.cos(px[..., 1::2])],
                  axis=-1).reshape(H, W, -1)
    py = np.stack([np.sin(py[..., 0::2]), np.cos(py[..., 1::2])],
                  axis=-1).reshape(H, W, -1)
    return np.concatenate([py, px], axis=-1).astype(np.float32)


def _resize_bilinear(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """align_corners=False bilinear (torch F.interpolate default), NHWC."""
    return jax.image.resize(x, (x.shape[0],) + tuple(out_hw)
                            + (x.shape[-1],), "linear")


def _mlp(p, x, layers: int):
    for i in range(layers):
        x = _linear(p[f"l{i}"], x)
        if i < layers - 1:
            x = jax.nn.relu(x)
    return x


# ---------------------------------------------------------------------------
# Pixel decoder
# ---------------------------------------------------------------------------

def _deform_layer(p, src, pos, ref_points, shapes, cfg: OneFormerConfig):
    """One MSDeformAttnTransformerEncoderLayer (``msdeformattn.py:92-131``)."""
    B, S, C = src.shape
    H, L, P = cfg.nheads, len(shapes), cfg.enc_points
    query = src + pos
    value = _linear(p["value_proj"], src).reshape(B, S, H, C // H)
    offsets = _linear(p["sampling_offsets"], query).reshape(
        B, S, H, L, P, 2)
    weights = _linear(p["attention_weights"], query).reshape(
        B, S, H, L * P)
    weights = jax.nn.softmax(weights, axis=-1).reshape(B, S, H, L, P)
    normalizer = jnp.asarray([[w, h] for h, w in shapes], jnp.float32)
    loc = ref_points[:, :, None, :, None, :] \
        + offsets / normalizer[None, None, None, :, None, :]
    attn = ms_deform_attn(value, shapes, loc, weights)
    attn = _linear(p["output_proj"], attn)
    src = _layer_norm(p["norm1"], src + attn)
    h = _linear(p["linear2"], jax.nn.relu(_linear(p["linear1"], src)))
    return _layer_norm(p["norm2"], src + h)


def _encoder_reference_points(shapes) -> np.ndarray:
    """[S, L, 2] normalized centers (valid_ratios = 1; ``:141-153``)."""
    pts = []
    for (H, W) in shapes:
        ry, rx = np.meshgrid(
            (np.arange(H, dtype=np.float64) + 0.5) / H,
            (np.arange(W, dtype=np.float64) + 0.5) / W, indexing="ij")
        pts.append(np.stack([rx.ravel(), ry.ravel()], -1))
    pts = np.concatenate(pts, 0)
    return np.tile(pts[:, None], (1, len(shapes), 1)).astype(np.float32)


def pixel_decoder_forward(cfg: OneFormerConfig, p: Params,
                          feats: Dict[str, jnp.ndarray]):
    """feats: NHWC {res2..res5}. Returns (mask_features [B,h4,w4,256],
    multi_scale [res5, res4, res3] each [B,h,w,256])
    (``msdeformattn.py:316-358``)."""
    B = feats["res2"].shape[0]
    C = cfg.hidden_dim
    srcs, poss, shapes = [], [], []
    for i, name in enumerate(["res5", "res4", "res3"]):   # top-down
        x = feats[name]
        proj = _group_norm(p[f"input_proj{i}"]["gn"],
                           _conv(p[f"input_proj{i}"]["conv"], x))
        h, w = x.shape[1:3]
        shapes.append((h, w))
        srcs.append(proj.reshape(B, h * w, C))
        pe = position_embedding_sine(h, w, C // 2)
        poss.append(jnp.asarray(pe.reshape(h * w, C))[None]
                    + p["level_embed"][i][None, None])
    src = jnp.concatenate(srcs, axis=1)
    pos = jnp.concatenate(poss, axis=1)
    ref = jnp.asarray(_encoder_reference_points(shapes))[None]
    for i in range(cfg.enc_layers):
        src = _deform_layer(p[f"enc_layer{i}"], src, pos, ref, shapes,
                            cfg)
    # split back to levels
    sizes = [h * w for h, w in shapes]
    offs = np.concatenate([[0], np.cumsum(sizes)])
    out = [src[:, offs[i]:offs[i + 1]].reshape(B, *shapes[i], C)
           for i in range(len(shapes))]
    # FPN: lateral res2 + upsampled res3-level output
    lat = _group_norm(p["adapter1"]["gn"],
                      _conv(p["adapter1"]["conv"], feats["res2"]))
    y = lat + _resize_bilinear(out[-1], lat.shape[1:3])
    y = jax.nn.relu(_group_norm(p["layer1"]["gn"],
                                _conv(p["layer1"]["conv"], y)))
    mask_features = _conv(p["mask_features"], y)
    return mask_features, out            # out = [res5, res4, res3]


# ---------------------------------------------------------------------------
# Transformer decoder
# ---------------------------------------------------------------------------

def _detr_decoder_layer(p, tgt, memory, pos, query_pos, nheads: int,
                        eps: float):
    """Post-norm DETR TransformerDecoderLayer (``transformer.py``):
    self-attn, cross-attn, FFN — each residual + LayerNorm."""
    q = k = tgt + query_pos
    tgt = _layer_norm(p["norm1"], tgt + _mha(p["self_attn"], q, k, tgt,
                                             nheads), eps)
    tgt = _layer_norm(
        p["norm2"],
        tgt + _mha(p["multihead_attn"], tgt + query_pos, memory + pos,
                   memory, nheads), eps)
    h = _linear(p["linear2"], jax.nn.relu(_linear(p["linear1"], tgt)))
    return _layer_norm(p["norm3"], tgt + h, eps)


def _prediction_heads(cfg: OneFormerConfig, p: Params, output,
                      mask_features, target_hw):
    """(``oneformer_transformer_decoder.py:495-520``). output: [Q,B,C];
    mask_features: [B,h4,w4,256]. Returns class logits, mask logits,
    bool attn mask [B*h, Q, target_hw]."""
    dec = _layer_norm(p["decoder_norm"], output).transpose(1, 0, 2)
    outputs_class = _linear(p["class_embed"], dec)       # [B, Q, K+1]
    mask_embed = _mlp(p["mask_embed"], dec, 3)           # [B, Q, 256]
    outputs_mask = jnp.einsum("bqc,bhwc->bqhw", mask_embed,
                              mask_features)
    B, Q = outputs_mask.shape[:2]
    am = _resize_bilinear(outputs_mask.transpose(0, 2, 3, 1), target_hw)
    am = jax.nn.sigmoid(am.transpose(0, 3, 1, 2).reshape(B, Q, -1)) < 0.5
    # un-mask rows that would see nothing (``:459``)
    all_true = am.all(-1, keepdims=True)
    am = jnp.where(all_true, False, am)
    am = jnp.repeat(am[:, None], cfg.nheads, axis=1).reshape(
        B * cfg.nheads, Q, -1)
    return outputs_class, outputs_mask, am


def transformer_decoder_forward(cfg: OneFormerConfig, p: Params,
                                multi_scale: List[jnp.ndarray],
                                mask_features: jnp.ndarray,
                                task: jnp.ndarray):
    """multi_scale: [res5, res4, res3] NHWC; task: [B, C]. Returns
    (pred_logits [B,Q,K+1], pred_masks [B,Q,h4,w4])
    (``oneformer_transformer_decoder.py:405-493``)."""
    B = mask_features.shape[0]
    C = cfg.hidden_dim
    eps = cfg.layer_norm_eps
    src, pos, size_list = [], [], []
    for i in range(3):
        x = multi_scale[i]
        h, w = x.shape[1:3]
        size_list.append((h, w))
        pe = position_embedding_sine(h, w, C // 2).reshape(h * w, C)
        pos.append(jnp.asarray(pe)[None].repeat(B, 0))
        s = x.reshape(B, h * w, C) + p["level_embed"][i][None, None]
        src.append(s)

    query_embed = p["query_embed"][None].repeat(B, 0)     # [B, Q, C]
    tasks = _layer_norm(p["decoder_norm"], task, eps)[:, None]  # [B,1,C]

    # --- 2-layer DETR "class" transformer seeds the 149 object queries
    # from the task token (``:430-440``). Note the reference's arg swap:
    # src = sine-PE of mask_features, pos = projected mask_features.
    h4, w4 = mask_features.shape[1:3]
    feats_pe = jnp.asarray(position_embedding_sine(h4, w4, C // 2)
                           .reshape(h4 * w4, C))[None].repeat(B, 0)
    cls_pos = _conv(p["class_input_proj"], mask_features).reshape(
        B, h4 * w4, C)
    memory = feats_pe                      # 0 encoder layers
    qe = p["query_embed"][:-1][None].repeat(B, 0)         # [B, Q-1, C]
    tgt = jnp.tile(tasks, (1, qe.shape[1], 1))            # task-seeded
    for i in range(cfg.class_dec_layers):
        tgt = _detr_decoder_layer(p[f"class_dec{i}"], tgt, memory,
                                  cls_pos, qe, cfg.nheads, eps)
    out_t = _layer_norm(p["class_dec_norm"], tgt, eps)    # [B, Q-1, C]

    output = jnp.concatenate([out_t, tasks], axis=1)      # [B, Q, C]
    output = output.transpose(1, 0, 2)                    # [Q, B, C]

    _, _, attn_mask = _prediction_heads(cfg, p, output, mask_features,
                                        size_list[0])
    for i in range(cfg.dec_layers):
        lvl = i % 3
        lp = p[f"dec_layer{i}"]
        # cross-attention (masked) first (``:461-470``)
        o = output.transpose(1, 0, 2)
        o = _layer_norm(
            lp["cross_norm"],
            o + _mha(lp["cross_attn"], o + query_embed,
                     src[lvl] + pos[lvl], src[lvl], cfg.nheads,
                     mask=attn_mask), eps)
        # self-attention
        q = k = o + query_embed
        o = _layer_norm(lp["self_norm"],
                        o + _mha(lp["self_attn"], q, k, o, cfg.nheads),
                        eps)
        # FFN
        h = _linear(lp["linear2"],
                    jax.nn.relu(_linear(lp["linear1"], o)))
        o = _layer_norm(lp["ffn_norm"], o + h, eps)
        output = o.transpose(1, 0, 2)
        _, _, attn_mask = _prediction_heads(
            cfg, p, output, mask_features,
            size_list[(i + 1) % 3])
    outputs_class, outputs_mask, _ = _prediction_heads(
        cfg, p, output, mask_features, size_list[0])
    return outputs_class, outputs_mask


def oneformer_forward(cfg: OneFormerConfig, params: Params,
                      image: jnp.ndarray, task: jnp.ndarray):
    """image: [B, H, W, 3] normalized+padded; task: [B, task_seq_len]
    float token ids. Returns (pred_logits [B,Q,K+1], pred_masks
    [B,Q,H/4,W/4])."""
    feats = swin_forward(cfg.swin, params["backbone"], image)
    mask_features, multi_scale = pixel_decoder_forward(
        cfg, params["pixel_decoder"], feats)
    task_emb = _mlp(params["task_mlp"], task, 2)
    return transformer_decoder_forward(cfg, params["predictor"],
                                       multi_scale, mask_features,
                                       task_emb)


# ---------------------------------------------------------------------------
# Panoptic fusion (host-side numpy; ``oneformer_model.py:378-434``)
# ---------------------------------------------------------------------------

def panoptic_inference(mask_cls: np.ndarray, mask_pred: np.ndarray,
                       thing_ids: Sequence[int],
                       object_mask_threshold: float = 0.8,
                       overlap_threshold: float = 0.8):
    """mask_cls: [Q, K+1] logits; mask_pred: [Q, H, W] logits (already
    upsampled to the output size). Returns (panoptic_seg [H, W] int32,
    segments_info list of {id, isthing, category_id})."""
    num_classes = mask_cls.shape[-1] - 1
    prob = _softmax_np(mask_cls)
    scores = prob.max(-1)
    labels = prob.argmax(-1)
    sig = 1.0 / (1.0 + np.exp(-mask_pred))
    keep = (labels != num_classes) & (scores > object_mask_threshold)
    cur_scores = scores[keep]
    cur_classes = labels[keep]
    cur_masks = sig[keep]
    H, W = mask_pred.shape[-2:]
    panoptic_seg = np.zeros((H, W), np.int32)
    segments_info = []
    if cur_masks.shape[0] == 0:
        return panoptic_seg, segments_info
    cur_prob_masks = cur_scores[:, None, None] * cur_masks
    cur_mask_ids = cur_prob_masks.argmax(0)
    stuff_memory = {}
    segment_id = 0
    thing_set = set(int(t) for t in thing_ids)
    for k in range(cur_classes.shape[0]):
        pred_class = int(cur_classes[k])
        isthing = pred_class in thing_set
        mask_area = int((cur_mask_ids == k).sum())
        original_area = int((cur_masks[k] >= 0.5).sum())
        mask = (cur_mask_ids == k) & (cur_masks[k] >= 0.5)
        if mask_area > 0 and original_area > 0 and mask.sum() > 0:
            if mask_area / original_area < overlap_threshold:
                continue
            if not isthing:
                if pred_class in stuff_memory:
                    panoptic_seg[mask] = stuff_memory[pred_class]
                    continue
                stuff_memory[pred_class] = segment_id + 1
            segment_id += 1
            panoptic_seg[mask] = segment_id
            segments_info.append({"id": segment_id,
                                  "isthing": bool(isthing),
                                  "category_id": pred_class})
    return panoptic_seg, segments_info


def _softmax_np(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


# ---------------------------------------------------------------------------
# Init + torch-name weight mapping
# ---------------------------------------------------------------------------

def init_oneformer(key, cfg: OneFormerConfig = ONEFORMER_COCO_SWIN_L
                   ) -> Params:
    keys = iter(jax.random.split(key, 1000))
    C = cfg.hidden_dim

    def lin(i, o):
        return {"w": 0.05 * jax.random.normal(next(keys), (i, o)),
                "b": jnp.zeros((o,))}

    def ln(c=C):
        return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}

    def mha():
        return {"in_w": 0.05 * jax.random.normal(next(keys), (C, 3 * C)),
                "in_b": jnp.zeros((3 * C,)), "out": lin(C, C)}

    def conv(cin, cout, k=1, bias=True):
        p = {"w": 0.05 * jax.random.normal(next(keys), (k, k, cin, cout))}
        if bias:
            p["b"] = jnp.zeros((cout,))
        return p

    swin_dims = [cfg.swin.embed_dim * 2 ** i for i in range(4)]
    pd = {"level_embed": 0.05 * jax.random.normal(next(keys), (3, C)),
          "mask_features": conv(C, cfg.mask_dim),
          "adapter1": {"conv": conv(swin_dims[0], C, 1, bias=False),
                       "gn": ln()},
          "layer1": {"conv": conv(C, C, 3, bias=False), "gn": ln()}}
    for i, d in enumerate([swin_dims[3], swin_dims[2], swin_dims[1]]):
        pd[f"input_proj{i}"] = {"conv": conv(d, C), "gn": ln()}
    L, P = 3, cfg.enc_points
    for i in range(cfg.enc_layers):
        pd[f"enc_layer{i}"] = {
            "sampling_offsets": lin(C, cfg.nheads * L * P * 2),
            "attention_weights": lin(C, cfg.nheads * L * P),
            "value_proj": lin(C, C), "output_proj": lin(C, C),
            "norm1": ln(), "norm2": ln(),
            "linear1": lin(C, cfg.enc_ffn_dim),
            "linear2": lin(cfg.enc_ffn_dim, C)}

    pred = {"query_embed": 0.05 * jax.random.normal(
                next(keys), (cfg.num_queries, C)),
            "level_embed": 0.05 * jax.random.normal(next(keys), (3, C)),
            "class_input_proj": conv(C, C),
            "decoder_norm": ln(), "class_dec_norm": ln(),
            "class_embed": lin(C, cfg.num_classes + 1),
            "mask_embed": {f"l{i}": lin(C, C) for i in range(3)}}
    for i in range(cfg.class_dec_layers):
        pred[f"class_dec{i}"] = {
            "self_attn": mha(), "multihead_attn": mha(),
            "linear1": lin(C, cfg.dim_feedforward),
            "linear2": lin(cfg.dim_feedforward, C),
            "norm1": ln(), "norm2": ln(), "norm3": ln()}
    for i in range(cfg.dec_layers):
        pred[f"dec_layer{i}"] = {
            "cross_attn": mha(), "self_attn": mha(),
            "cross_norm": ln(), "self_norm": ln(), "ffn_norm": ln(),
            "linear1": lin(C, cfg.dim_feedforward),
            "linear2": lin(cfg.dim_feedforward, C)}

    return {"backbone": init_swin(next(keys), cfg.swin),
            "pixel_decoder": pd,
            "predictor": pred,
            "task_mlp": {"l0": lin(cfg.task_seq_len, C),
                         "l1": lin(C, C)}}


def oneformer_from_state_dict(sd: Dict[str, np.ndarray],
                              cfg: OneFormerConfig = ONEFORMER_COCO_SWIN_L
                              ) -> Params:
    """Released detectron2 OneFormer checkpoint -> param pytree.
    Key layout: ``backbone.*`` (D2SwinTransformer),
    ``sem_seg_head.pixel_decoder.*``, ``sem_seg_head.predictor.*``,
    ``task_mlp.layers.{0,1}.*``."""
    g = lambda n: jnp.asarray(np.asarray(sd[n]))  # noqa: E731

    def lin(name):
        return {"w": g(f"{name}.weight").T, "b": g(f"{name}.bias")}

    def ln(name):
        return {"scale": g(f"{name}.weight"), "bias": g(f"{name}.bias")}

    def mha(name):
        return {"in_w": g(f"{name}.in_proj_weight").T,
                "in_b": g(f"{name}.in_proj_bias"),
                "out": lin(f"{name}.out_proj")}

    def conv(name, bias=True):
        p = {"w": g(f"{name}.weight").transpose(2, 3, 1, 0)}
        if bias:
            p["b"] = g(f"{name}.bias")
        return p

    P = "sem_seg_head.pixel_decoder"
    pd = {"level_embed": g(f"{P}.transformer.level_embed"),
          "mask_features": conv(f"{P}.mask_features"),
          "adapter1": {"conv": conv(f"{P}.adapter_1", bias=False),
                       "gn": ln(f"{P}.adapter_1.norm")},
          "layer1": {"conv": conv(f"{P}.layer_1", bias=False),
                     "gn": ln(f"{P}.layer_1.norm")}}
    for i in range(3):
        pd[f"input_proj{i}"] = {"conv": conv(f"{P}.input_proj.{i}.0"),
                                "gn": ln(f"{P}.input_proj.{i}.1")}
    for i in range(cfg.enc_layers):
        b = f"{P}.transformer.encoder.layers.{i}"
        pd[f"enc_layer{i}"] = {
            "sampling_offsets": lin(f"{b}.self_attn.sampling_offsets"),
            "attention_weights": lin(f"{b}.self_attn.attention_weights"),
            "value_proj": lin(f"{b}.self_attn.value_proj"),
            "output_proj": lin(f"{b}.self_attn.output_proj"),
            "norm1": ln(f"{b}.norm1"), "norm2": ln(f"{b}.norm2"),
            "linear1": lin(f"{b}.linear1"),
            "linear2": lin(f"{b}.linear2")}

    D = "sem_seg_head.predictor"
    pred = {"query_embed": g(f"{D}.query_embed.weight"),
            "level_embed": g(f"{D}.level_embed.weight"),
            "class_input_proj": conv(f"{D}.class_input_proj"),
            "decoder_norm": ln(f"{D}.decoder_norm"),
            "class_dec_norm": ln(f"{D}.class_transformer.decoder.norm"),
            "class_embed": lin(f"{D}.class_embed"),
            "mask_embed": {f"l{i}": lin(f"{D}.mask_embed.layers.{i}")
                           for i in range(3)}}
    for i in range(cfg.class_dec_layers):
        b = f"{D}.class_transformer.decoder.layers.{i}"
        pred[f"class_dec{i}"] = {
            "self_attn": mha(f"{b}.self_attn"),
            "multihead_attn": mha(f"{b}.multihead_attn"),
            "linear1": lin(f"{b}.linear1"),
            "linear2": lin(f"{b}.linear2"),
            "norm1": ln(f"{b}.norm1"), "norm2": ln(f"{b}.norm2"),
            "norm3": ln(f"{b}.norm3")}
    for i in range(cfg.dec_layers):
        pred[f"dec_layer{i}"] = {
            "cross_attn": mha(
                f"{D}.transformer_cross_attention_layers.{i}"
                f".multihead_attn"),
            "cross_norm": ln(
                f"{D}.transformer_cross_attention_layers.{i}.norm"),
            "self_attn": mha(
                f"{D}.transformer_self_attention_layers.{i}.self_attn"),
            "self_norm": ln(
                f"{D}.transformer_self_attention_layers.{i}.norm"),
            "linear1": lin(f"{D}.transformer_ffn_layers.{i}.linear1"),
            "linear2": lin(f"{D}.transformer_ffn_layers.{i}.linear2"),
            "ffn_norm": ln(f"{D}.transformer_ffn_layers.{i}.norm")}

    return {"backbone": swin_from_state_dict(sd, cfg.swin,
                                             prefix="backbone."),
            "pixel_decoder": pd,
            "predictor": pred,
            "task_mlp": {"l0": lin("task_mlp.layers.0"),
                         "l1": lin("task_mlp.layers.1")}}
