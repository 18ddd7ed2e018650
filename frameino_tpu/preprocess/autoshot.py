"""AutoShot shot-boundary supernet — JAX reimplementation of the
reference's deployed step-2 model (``preprocess/auxiliary/AutoShot.py``
``TransNetV2Supernet``; driven by
``preprocess/scoring_scene_cut_autoshot.py:46-186``).

The searched architecture the released checkpoint instantiates
(``AutoShot.py:70-127``): six dilated-(2+1)D-conv layers —
``DilatedDCNNV2(3,16,mult=1,n_dil=4)`` then three shared-spatial
``DilatedDCNNV2ABC`` type-A layers (one (1,3,3) conv shared by five
dilated (3,1,1) branches) and two more ``DilatedDCNNV2`` layers —
with residual adds + (1,2,2) average pools after layers 1/3/5, plus
the TransNetV2 frame-similarity (448->128) and color-histogram (->128)
banded features and a 4864->1024 FC head with one-hot / many-hot
logits. The supernet's ``Attention1D`` is constructed with
``n_layer=0`` and returns ``None`` at inference (``AutoShot.py:645``),
so the transformer branch and ``fc1`` are dead weight — only ``fc1_0``
runs.

``autoshot_from_state_dict`` maps the released checkpoint names so the
public AutoShot weights drop in; parity-tested against a hand-built
torch mirror (``tests/test_autoshot.py``). Shares the banded-lookup /
histogram kernels with ``preprocess/transnet.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from frameino_tpu.preprocess.transnet import (_banded_lookup, _batch_norm,
                                              _conv3d, _dense,
                                              color_histograms)

Params = Dict


@dataclasses.dataclass(frozen=True)
class AutoShotConfig:
    lookup_window: int = 101
    bn_eps: float = 1e-3
    hidden: int = 1024
    # (in_ch, filters, multiplier, n_dilation, shared-spatial?)
    layers: tuple = ((3, 16, 1, 4, False),
                     (64, 16, 4, 5, True),
                     (64, 32, 4, 5, True),
                     (128, 32, 4, 5, True),
                     (128, 64, 3, 5, False),
                     (256, 64, 2, 5, False))


AUTOSHOT = AutoShotConfig()


def _branch_filters(filters: int, n_dilation: int) -> List[int]:
    """filters*4 split across dilation branches; the last branch takes
    the remainder (``AutoShot.py:528-550``)."""
    per = (filters * 4) // n_dilation
    return [per] * (n_dilation - 1) + [filters * 4 - per * (n_dilation - 1)]


def _layer_apply(cfg: AutoShotConfig, spec, p, x):
    _, filters, _, n_dil, shared = spec
    if shared:
        base = _conv3d(x, p["share"]["kernel"])           # (1,3,3) shared
        outs = [_conv3d(base, p[f"b{i}"]["temporal"]["kernel"],
                        dilation=(2 ** i, 1, 1))
                for i in range(n_dil)]
    else:
        outs = []
        for i in range(n_dil):
            h = _conv3d(x, p[f"b{i}"]["spatial"]["kernel"])
            outs.append(_conv3d(h, p[f"b{i}"]["temporal"]["kernel"],
                                dilation=(2 ** i, 1, 1)))
    y = jnp.concatenate(outs, axis=-1)
    y = _batch_norm(p["bn"], y, cfg.bn_eps)
    return jax.nn.relu(y)


def _avg_pool_122(x):
    B, T, H, W, C = x.shape
    x = x[:, :, : H // 2 * 2, : W // 2 * 2]
    return x.reshape(B, T, H // 2, 2, W // 2, 2, C).mean(axis=(3, 5))


def _frame_similarity(cfg, p, block_features):
    feats = jnp.concatenate([f.mean(axis=(2, 3)) for f in block_features],
                            axis=-1)                      # [B, T, 448]
    x = _dense(p["projection"], feats)
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-12)
    sim = jnp.einsum("btd,bsd->bts", x, x)
    band = _banded_lookup(sim, cfg.lookup_window)
    return jax.nn.relu(_dense(p["fc"], band))


def autoshot_forward(cfg: AutoShotConfig, params: Params,
                     frames_uint8: jax.Array):
    """frames: uint8 [B, T, 27, 48, 3] -> (one_hot [B, T, 1],
    many_hot [B, T, 1]). Sigmoid for cut probabilities
    (``AutoShot.py:145-216``)."""
    x = frames_uint8.astype(jnp.float32) / 255.0
    shortcut = None
    block_features = []
    for i, spec in enumerate(cfg.layers):
        x = _layer_apply(cfg, spec, params[f"layer{i}"], x)
        if i % 2 == 0:
            shortcut = x
        else:
            x = shortcut + x
            x = _avg_pool_122(x)
            block_features.append(x)
    B, T = x.shape[:2]
    feat = x.reshape(B, T, -1)                            # (H, W, C) flat
    feat = jnp.concatenate(
        [_frame_similarity(cfg, params["frame_sim"], block_features),
         feat], axis=-1)
    feat = jnp.concatenate(
        [jax.nn.relu(_dense(
            params["color_hist"]["fc"],
            _color_band(cfg, frames_uint8))), feat], axis=-1)
    h = jax.nn.relu(_dense(params["fc1_0"], feat))
    return _dense(params["cls1"], h), _dense(params["cls2"], h)


def _color_band(cfg, frames_uint8):
    h = color_histograms(frames_uint8)
    sim = jnp.einsum("btd,bsd->bts", h, h)
    return _banded_lookup(sim, cfg.lookup_window)


# ---------------------------------------------------------------------------
# Init + torch-name weight mapping
# ---------------------------------------------------------------------------

def init_autoshot(key, cfg: AutoShotConfig = AUTOSHOT) -> Params:
    keys = iter(jax.random.split(key, 300))

    def conv(kt, kh, kw, cin, cout):
        return {"kernel": 0.1 * jax.random.normal(
            next(keys), (kt, kh, kw, cin, cout))}

    def bn(c):
        return {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,)),
                "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}

    def dense(i, o):
        return {"kernel": 0.05 * jax.random.normal(next(keys), (i, o)),
                "bias": jnp.zeros((o,))}

    params: Params = {}
    for li, (cin, filters, mult, n_dil, shared) in enumerate(cfg.layers):
        mid = mult * filters
        lp: Params = {}
        if shared:
            lp["share"] = conv(1, 3, 3, cin, mid)
        for i, bf in enumerate(_branch_filters(filters, n_dil)):
            bp = {}
            if not shared:
                bp["spatial"] = conv(1, 3, 3, cin, mid)
            bp["temporal"] = conv(3, 1, 1, mid, bf)
            lp[f"b{i}"] = bp
        lp["bn"] = bn(filters * 4)
        params[f"layer{li}"] = lp
    params["frame_sim"] = {"projection": dense(448, 128),
                           "fc": dense(cfg.lookup_window, 128)}
    params["color_hist"] = {"fc": dense(cfg.lookup_window, 128)}
    params["fc1_0"] = dense(4864, cfg.hidden)
    params["cls1"] = dense(cfg.hidden, 1)
    params["cls2"] = dense(cfg.hidden, 1)
    return params


_LAYER_NAMES = ("Layer_0_3", "Layer_1_8", "Layer_2_8", "Layer_3_8",
                "Layer_4_13", "Layer_5_12")


def autoshot_from_state_dict(sd: Dict[str, np.ndarray],
                             cfg: AutoShotConfig = AUTOSHOT) -> Params:
    """Released AutoShot checkpoint names -> param pytree. The dead
    supernet branches (``Layer_6_0`` attention, ``fc1``) are ignored."""
    g = lambda n: jnp.asarray(np.asarray(sd[n]))  # noqa: E731

    def conv(name):                       # torch [O, I, kt, kh, kw]
        return {"kernel": g(f"{name}.weight").transpose(2, 3, 4, 1, 0)}

    def bn(name):
        return {"weight": g(f"{name}.weight"), "bias": g(f"{name}.bias"),
                "mean": g(f"{name}.running_mean"),
                "var": g(f"{name}.running_var")}

    def lin(name):
        return {"kernel": g(f"{name}.linear.weight").T,
                "bias": g(f"{name}.linear.bias")}

    params: Params = {}
    for li, (cin, filters, mult, n_dil, shared) in enumerate(cfg.layers):
        L = _LAYER_NAMES[li]
        lp: Params = {}
        if shared:
            lp["share"] = conv(f"{L}.share")
            for i in range(n_dil):
                lp[f"b{i}"] = {"temporal":
                               conv(f"{L}.conv_blocks.{i}.layers.0")}
        else:
            for i in range(n_dil):
                lp[f"b{i}"] = {
                    "spatial": conv(f"{L}.conv_blocks.{i}.layers.0"),
                    "temporal": conv(f"{L}.conv_blocks.{i}.layers.1")}
        lp["bn"] = bn(f"{L}.batch_norm")
        params[f"layer{li}"] = lp
    params["frame_sim"] = {
        "projection": lin("frame_sim_layer.projection"),
        "fc": lin("frame_sim_layer.fc")}
    params["color_hist"] = {"fc": lin("color_hist_layer.fc")}
    params["fc1_0"] = lin("fc1_0")
    params["cls1"] = lin("cls_layer1")
    params["cls2"] = lin("cls_layer2")
    return params


def load_autoshot(checkpoint_path: str,
                  cfg: AutoShotConfig = AUTOSHOT) -> Params:
    """Load the released AutoShot .pth (torch pickle; plain state dict
    or {'model'|'state_dict': ...}, ``scoring_scene_cut_autoshot.py:
    112-121``)."""
    import torch
    ckpt = torch.load(checkpoint_path, map_location="cpu",
                      weights_only=False)
    for key in ("model", "state_dict", "net"):
        if isinstance(ckpt, dict) and key in ckpt:
            ckpt = ckpt[key]
            break
    sd = {k.removeprefix("module."):
          (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in ckpt.items()}
    return autoshot_from_state_dict(sd, cfg)


def make_autoshot_scorer(params: Params,
                         cfg: AutoShotConfig = AUTOSHOT,
                         window: int = 100, pad: int = 25):
    """frames uint8 [T, 27, 48, 3] -> per-frame cut probabilities [T]
    (the reference's sliding-window inference keeps the middle 50 of
    each 100-frame window, ``scoring_scene_cut_autoshot.py:46-96``)."""
    jfwd = jax.jit(lambda p, f: jax.nn.sigmoid(
        autoshot_forward(cfg, p, f)[0][0, :, 0]))
    fwd = lambda f: jfwd(params, f)  # noqa: E731  (no HLO constants)

    def score(frames: np.ndarray) -> np.ndarray:
        T = frames.shape[0]
        padded = np.concatenate([frames[:1].repeat(pad, 0), frames,
                                 frames[-1:].repeat(pad + window, 0)])
        out = []
        for start in range(0, T, window - 2 * pad):
            win = padded[start:start + window]
            probs = np.asarray(fwd(jnp.asarray(win[None])))
            out.append(probs[pad:window - pad])
        return np.concatenate(out)[:T]

    return score
