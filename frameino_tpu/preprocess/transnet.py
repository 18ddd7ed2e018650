"""TransNetV2 shot-boundary model in JAX — learned detector for step 2.

Reference: ``preprocess/auxiliary/TransNetV2.py`` (the public
soCzech/TransNetV2 architecture the AutoShot supernet builds on;
``auxiliary/AutoShot.py:70``). Re-expressed functionally for XLA:

- (2+1)D separable convs: (1,3,3) spatial then (3,1,1) temporal with
  dilation d in {1,2,4,8}, concatenated -> BatchNorm(eps 1e-3) -> relu
  (``DilatedDCNNV2``); two per stack with a pre-activation shortcut and
  (1,2,2) average pooling (``StackedDDCNNV2``); three stacks F=16/32/64.
- FrameSimilarity: L2-normalized projected per-frame features (all
  stacks, spatially averaged), cosine-similarity matrix, banded
  101-wide lookup, linear+relu.
- ColorHistograms: 512-bin RGB histogram (3 bits/channel) per frame,
  L2-normalized, same banded-similarity head.
- Head: flatten 3x6 spatial grid + the two 128-d similarity features ->
  fc1(1024) relu -> single-logit (+ many-hot) classifiers.

Input contract matches the reference exactly: uint8 [B, T, 27, 48, 3].
``transnet_from_state_dict`` maps the public torch checkpoint names, so
released weights drop in; without weights the classical histogram
detector (``scene_cut.histogram_cut_scores``) remains the default.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TransNetV2Config:
    filters: int = 16            # F
    num_stacks: int = 3          # L
    blocks_per_stack: int = 2    # S
    hidden_dim: int = 1024       # D
    lookup_window: int = 101
    similarity_dim: int = 128
    sim_output_dim: int = 128
    use_many_hot: bool = True
    bn_eps: float = 1e-3


TRANSNETV2 = TransNetV2Config()


# ---------------------------------------------------------------------------
# Functional blocks (channels-last [B, T, H, W, C] internally)
# ---------------------------------------------------------------------------

def _conv3d(x, kernel, bias=None, dilation=(1, 1, 1)):
    """kernel: [kt, kh, kw, Cin, Cout]; SAME padding per dilated extent."""
    pads = [((k - 1) * d // 2,) * 2 for k, d in
            zip(kernel.shape[:3], dilation)]
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1, 1), padding=pads,
        rhs_dilation=dilation,
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"))
    if bias is not None:
        y = y + bias
    return y


def _sep_conv(p, x, dilation: int):
    """Conv3DConfigurable separable: (1,3,3) then dilated (3,1,1)."""
    x = _conv3d(x, p["spatial"]["kernel"])                 # no bias
    x = _conv3d(x, p["temporal"]["kernel"],
                p["temporal"].get("bias"), dilation=(dilation, 1, 1))
    return x


def _batch_norm(p, x, eps):
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["weight"] + p["bias"]


def _ddcnn(cfg, p, x, last: bool):
    outs = [_sep_conv(p[f"d{d}"], x, d) for d in (1, 2, 4, 8)]
    y = jnp.concatenate(outs, axis=-1)
    y = _batch_norm(p["bn"], y, cfg.bn_eps)
    if not last:
        y = jax.nn.relu(y)
    return y


def _stack(cfg, p, x):
    shortcut = None
    for j, bp in enumerate(p["blocks"]):
        x = _ddcnn(cfg, bp, x, last=j == len(p["blocks"]) - 1)
        if shortcut is None:
            shortcut = x
    x = jax.nn.relu(x)
    x = x + shortcut
    # AvgPool3d (1, 2, 2)
    B, T, H, W, C = x.shape
    x = x[:, :, : H // 2 * 2, : W // 2 * 2]
    x = x.reshape(B, T, H // 2, 2, W // 2, 2, C).mean(axis=(3, 5))
    return x


def _banded_lookup(sim: jax.Array, window: int) -> jax.Array:
    """[B, T, T] similarity matrix -> [B, T, window] band centered on
    the diagonal, zero-padded at the edges (reference gather logic)."""
    B, T, _ = sim.shape
    half = (window - 1) // 2
    padded = jnp.pad(sim, ((0, 0), (0, 0), (half, half)))
    idx = jnp.arange(T)[:, None] + jnp.arange(window)[None, :]   # [T, W]
    return padded[:, jnp.arange(T)[:, None], idx]


def _dense(p, x):
    y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def _frame_similarity(cfg, p, block_features):
    feats = jnp.concatenate([f.mean(axis=(2, 3)) for f in block_features],
                            axis=-1)                       # [B, T, sumC]
    x = _dense(p["projection"], feats)
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-12)
    sim = jnp.einsum("btd,bsd->bts", x, x)
    band = _banded_lookup(sim, cfg.lookup_window)
    return jax.nn.relu(_dense(p["fc"], band))


def color_histograms(frames_uint8: jax.Array) -> jax.Array:
    """[B, T, H, W, 3] uint8 -> [B, T, 512] L2-normalized RGB histograms
    (3 bits per channel, reference ``compute_color_histograms``)."""
    f = frames_uint8.astype(jnp.int32)
    bins = ((f[..., 0] >> 5) << 6) + ((f[..., 1] >> 5) << 3) \
        + (f[..., 2] >> 5)                                  # [B,T,H,W]
    B, T = bins.shape[:2]
    flat = bins.reshape(B * T, -1)
    one_hot_counts = jax.vmap(
        lambda row: jnp.zeros((512,), jnp.float32).at[row].add(1.0))(flat)
    hist = one_hot_counts.reshape(B, T, 512)
    return hist / jnp.linalg.norm(hist, axis=-1, keepdims=True).clip(1e-12)


def _color_hist_layer(cfg, p, frames_uint8):
    h = color_histograms(frames_uint8)
    sim = jnp.einsum("btd,bsd->bts", h, h)
    band = _banded_lookup(sim, cfg.lookup_window)
    return jax.nn.relu(_dense(p["fc"], band))


def transnet_forward(cfg: TransNetV2Config, params: Params,
                     frames_uint8: jax.Array):
    """frames: uint8 [B, T, 27, 48, 3] -> (logits [B, T, 1],
    many_hot [B, T, 1] | None). Apply sigmoid for cut probabilities."""
    x = frames_uint8.astype(jnp.float32) / 255.0
    block_features = []
    for sp in params["stacks"]:
        x = _stack(cfg, sp, x)
        block_features.append(x)
    B, T = x.shape[:2]
    feat = x.reshape(B, T, -1)
    feat = jnp.concatenate(
        [_frame_similarity(cfg, params["frame_sim"], block_features), feat],
        axis=-1)
    feat = jnp.concatenate(
        [_color_hist_layer(cfg, params["color_hist"], frames_uint8), feat],
        axis=-1)
    h = jax.nn.relu(_dense(params["fc1"], feat))
    one_hot = _dense(params["cls1"], h)
    many_hot = _dense(params["cls2"], h) if "cls2" in params else None
    return one_hot, many_hot


# ---------------------------------------------------------------------------
# Init + torch-name weight mapping
# ---------------------------------------------------------------------------

def _stack_channels(cfg):
    F = cfg.filters
    chans = []
    cin = 3
    for i in range(cfg.num_stacks):
        f = F * 2 ** i
        chans.append((cin, f))
        cin = f * 4
    return chans


def init_transnet(key, cfg: TransNetV2Config = TRANSNETV2) -> Params:
    ks = iter(jax.random.split(key, 256))

    def dense(i, o, bias=True):
        p = {"kernel": jax.random.normal(next(ks), (i, o)) * (i ** -0.5)}
        if bias:
            p["bias"] = jnp.zeros((o,))
        return p

    def sep(cin, f, bias):
        p = {"spatial": {"kernel": jax.random.normal(
                next(ks), (1, 3, 3, cin, 2 * f)) * 0.05},
             "temporal": {"kernel": jax.random.normal(
                 next(ks), (3, 1, 1, 2 * f, f)) * 0.05}}
        if bias:
            p["temporal"]["bias"] = jnp.zeros((f,))
        return p

    stacks = []
    for cin, f in _stack_channels(cfg):
        blocks = []
        bin_ = cin
        for _ in range(cfg.blocks_per_stack):
            blocks.append({
                **{f"d{d}": sep(bin_, f, bias=False) for d in (1, 2, 4, 8)},
                "bn": {"weight": jnp.ones((4 * f,)),
                       "bias": jnp.zeros((4 * f,)),
                       "mean": jnp.zeros((4 * f,)),
                       "var": jnp.ones((4 * f,))},
            })
            bin_ = 4 * f
        stacks.append({"blocks": blocks})

    sum_c = sum(4 * f for _, f in _stack_channels(cfg))
    top_c = 4 * cfg.filters * 2 ** (cfg.num_stacks - 1)
    feat_dim = top_c * 3 * 6 + cfg.sim_output_dim * 2
    params: Params = {
        "stacks": stacks,
        "frame_sim": {"projection": dense(sum_c, cfg.similarity_dim),
                      "fc": dense(cfg.lookup_window, cfg.sim_output_dim)},
        "color_hist": {"fc": dense(cfg.lookup_window, cfg.sim_output_dim)},
        "fc1": dense(feat_dim, cfg.hidden_dim),
        "cls1": dense(cfg.hidden_dim, 1),
    }
    if cfg.use_many_hot:
        params["cls2"] = dense(cfg.hidden_dim, 1)
    return params


def transnet_from_state_dict(sd: Dict[str, np.ndarray],
                             cfg: TransNetV2Config = TRANSNETV2) -> Params:
    """Public torch checkpoint names -> param pytree.

    Conv3d OIDHW -> THWIO ("D"=temporal); Linear [out,in] -> [in,out].
    """
    def lin(name):
        p = {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T)}
        if f"{name}.bias" in sd:
            p["bias"] = sd[f"{name}.bias"]
        return p

    def conv(name):
        w = sd[f"{name}.weight"]            # [O, I, kt, kh, kw]
        p = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0))}
        if f"{name}.bias" in sd:
            p["bias"] = sd[f"{name}.bias"]
        return p

    stacks = []
    for i in range(cfg.num_stacks):
        blocks = []
        for j in range(cfg.blocks_per_stack):
            b = f"SDDCNN.{i}.DDCNN.{j}."
            blk = {}
            for d in (1, 2, 4, 8):
                blk[f"d{d}"] = {
                    "spatial": conv(b + f"Conv3D_{d}.layers.0"),
                    "temporal": conv(b + f"Conv3D_{d}.layers.1"),
                }
            blk["bn"] = {"weight": sd[b + "bn.weight"],
                         "bias": sd[b + "bn.bias"],
                         "mean": sd[b + "bn.running_mean"],
                         "var": sd[b + "bn.running_var"]}
            blocks.append(blk)
        stacks.append({"blocks": blocks})

    params: Params = {
        "stacks": stacks,
        "frame_sim": {"projection": lin("frame_sim_layer.projection"),
                      "fc": lin("frame_sim_layer.fc")},
        "color_hist": {"fc": lin("color_hist_layer.fc")},
        "fc1": lin("fc1"),
        "cls1": lin("cls_layer1"),
    }
    if "cls_layer2.weight" in sd:
        params["cls2"] = lin("cls_layer2")
    return jax.tree.map(jnp.asarray, params)


def make_transnet_scorer(params: Params,
                         cfg: TransNetV2Config = TRANSNETV2,
                         window: int = 100, overlap: int = 30):
    """Callable for ``scene_cut.score_scene_cuts``: [F, H, W, 3] uint8
    (any resolution; resized to 27x48) -> [F] cut probabilities, scored
    in overlapping temporal windows like the reference driver."""
    import cv2
    fwd = jax.jit(lambda p, f: transnet_forward(cfg, p, f)[0])

    def score(frames: np.ndarray) -> np.ndarray:
        small = np.stack([cv2.resize(f, (48, 27)) for f in frames])
        F = len(small)
        probs = np.zeros((F,), np.float32)
        counts = np.zeros((F,), np.float32)
        step = max(1, window - overlap)
        for s in range(0, F, step):
            chunk = small[s:s + window]
            logits = np.asarray(fwd(params, jnp.asarray(chunk[None])))
            p = 1.0 / (1.0 + np.exp(-logits[0, :, 0]))
            probs[s:s + len(p)] += p
            counts[s:s + len(p)] += 1.0
            if s + window >= F:
                break
        return probs / np.maximum(counts, 1.0)

    return score
