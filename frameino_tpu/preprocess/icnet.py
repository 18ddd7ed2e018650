"""IC9600 ICNet image-complexity model — JAX reimplementation of the
reference's ``preprocess/auxiliary/ICNet.py`` (150 LoC torch; weights:
huggingface ``incantor/image_complexity_ic9600`` ``ck.pth``).

Architecture (reference ``ICNet.py:79-150``): two ResNet-18 branches —
a *detail* branch on the full 512px image cut after layer2, and a
*context* branch on a 256px downsample cut after layer4 — each block
followed by a SLAM spatial-attention gate (per-channel sigmoid weight
from flattened fixed-size features, ``:8-31``); both branches are
upsampled to size1/8, concatenated, and fed to a 1x1-sigmoid complexity
*map* head and a pooled linear-sigmoid *score* head.

``icnet_from_state_dict`` maps the released torch checkpoint names so
``ck.pth`` drops in; numerics are parity-tested against a hand-built
torch mirror with matching names (``tests/test_icnet.py``).

TPU notes: NHWC layout, inference-mode batch norm folded to scale/bias,
align-corners bilinear resizes (torch semantics) via explicit gather —
all static shapes, single XLA program per image size.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict


@dataclasses.dataclass(frozen=True)
class ICNetConfig:
    size1: int = 512     # detail-branch input (reference default)
    size2: int = 256     # context-branch input


ICNET = ICNetConfig()


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------

def _resize_bilinear_ac(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Bilinear resize with torch ``align_corners=True`` semantics
    (source coord = i * (in-1)/(out-1)). x: [N,H,W,C]."""
    n, h, w, c = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x

    def coords(insz, outsz):
        if outsz == 1:
            return jnp.zeros((1,), x.dtype)
        return jnp.arange(outsz, dtype=x.dtype) * ((insz - 1) / (outsz - 1))

    yc, xc = coords(h, oh), coords(w, ow)
    y0 = jnp.clip(jnp.floor(yc).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xc).astype(jnp.int32), 0, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fy = (yc - y0.astype(x.dtype))[None, :, None, None]
    fx = (xc - x0.astype(x.dtype))[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - fx) + x[:, y0][:, :, x1] * fx
    bot = x[:, y1][:, :, x0] * (1 - fx) + x[:, y1][:, :, x1] * fx
    return top * (1 - fy) + bot * fy


def _conv(p, x, stride=1, padding="SAME"):
    """p: {w [HWIO], b? [O]}; x NHWC."""
    out = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in p:
        out = out + p["b"]
    return out


def _bn(p, x, eps=1e-5):
    """Inference batch norm, running stats."""
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


def _linear(p, x):
    return x @ p["w"] + p["b"]


def _maxpool_3x3_s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])


def _basic_block(p, x, stride=1):
    """ResNet-18 BasicBlock (conv1/bn1/relu/conv2/bn2 + skip)."""
    idn = x
    out = jax.nn.relu(_bn(p["bn1"], _conv(p["conv1"], x, stride)))
    out = _bn(p["bn2"], _conv(p["conv2"], out))
    if "down_conv" in p:
        idn = _bn(p["down_bn"], _conv(p["down_conv"], x, stride))
    return jax.nn.relu(out + idn)


def _layer(p, x, stride):
    x = _basic_block(p["0"], x, stride)
    return _basic_block(p["1"], x, 1)


def _resnet_prefix(p, x):
    """conv1(7x7 s2) -> bn -> relu -> maxpool(3x3 s2) -> layer1
    (= torchvision resnet18 ``children()[:5]``, reference ``:89``)."""
    x = jax.lax.conv_general_dilated(
        x, p["conv1"]["w"], (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = jax.nn.relu(_bn(p["bn1"], x))
    x = _maxpool_3x3_s2(x)
    return _layer(p["layer1"], x, 1)


def _slam(p, x, spatial_dim):
    """Spatial attention (reference ``slam``, ``:8-31``): features
    resized to [sd,sd], flattened per channel, MLP -> sigmoid scalar per
    channel, multiplied back onto the un-resized features."""
    n, h, w, c = x.shape
    f = _resize_bilinear_ac(x, (spatial_dim, spatial_dim))
    f = f.transpose(0, 3, 1, 2).reshape(n, c, spatial_dim * spatial_dim)
    f = jax.nn.relu(_linear(p["l0"], f))
    gate = jax.nn.sigmoid(_linear(p["l1"], f))       # [n, c, 1]
    return x * gate[:, None, :, 0][:, :, None, :]    # broadcast HW


def _conv_bn_relu(p, x):
    return jax.nn.relu(_bn(p["bn"], _conv(p["conv"], x)))


def _up_conv_bn_relu(p, x, up_size):
    x = _resize_bilinear_ac(x, (up_size, up_size))
    return jax.nn.relu(_bn(p["bn"], _conv(p["conv"], x)))


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

def icnet_forward(cfg: ICNetConfig, params: Params, x: jnp.ndarray):
    """x: [N, size1, size1, 3] normalized (ImageNet stats). Returns
    (score [N], complexity_map [N, size1/8, size1/8, 1]) — the
    reference forward (``ICNet.py:131-150``)."""
    assert x.shape[1] == x.shape[2] == cfg.size1, x.shape
    x2 = _resize_bilinear_ac(x, (cfg.size2, cfg.size2))

    d = _slam(params["b1_1_slam"], _resnet_prefix(params["b1_1"], x), 32)
    d = _slam(params["b1_2_slam"], _layer(params["b1_2"], d, 2), 32)

    c = _slam(params["b2_1_slam"], _resnet_prefix(params["b2_1"], x2), 32)
    c = _slam(params["b2_2_slam"], _layer(params["b2_2"], c, 2), 32)
    c = _slam(params["b2_3_slam"], _layer(params["b2_3"], c, 2), 16)
    c = _slam(params["b2_4_slam"], _layer(params["b2_4"], c, 2), 8)

    upsize = cfg.size1 // 8
    d = _up_conv_bn_relu(params["up1"], d, upsize)
    c = _up_conv_bn_relu(params["up2"], c, upsize)
    x_cat = jnp.concatenate([d, c], axis=-1)

    m = _slam(params["to_map_f_slam"],
              _conv_bn_relu(params["to_map_f"], x_cat), 32)
    cly_map = jax.nn.sigmoid(_conv(params["to_map"], m))

    s = _slam(params["to_score_f_slam"],
              _conv_bn_relu(params["to_score_f"], x_cat), 32)
    s = s.mean(axis=(1, 2))                          # AdaptiveAvgPool(1)
    s = jax.nn.relu(_linear(params["head0"], s))
    score = jax.nn.sigmoid(_linear(params["head1"], s))[:, 0]
    return score, cly_map


# ---------------------------------------------------------------------------
# Init + torch-name weight mapping
# ---------------------------------------------------------------------------

def _rand_conv(key, kh, kw, cin, cout, bias=False):
    k1, k2 = jax.random.split(key)
    p = {"w": jax.random.normal(k1, (kh, kw, cin, cout)) * 0.05}
    if bias:
        p["b"] = jax.random.normal(k2, (cout,)) * 0.05
    return p


def _rand_bn(key, c):
    k1, k2 = jax.random.split(key)
    return {"scale": 1.0 + 0.1 * jax.random.normal(k1, (c,)),
            "bias": 0.1 * jax.random.normal(k2, (c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def init_icnet(key, cfg: ICNetConfig = ICNET) -> Params:
    """Random init with the checkpoint's exact tree (tests/parity)."""
    keys = iter(jax.random.split(key, 200))

    def block(cin, cout, down):
        p = {"conv1": _rand_conv(next(keys), 3, 3, cin, cout),
             "bn1": _rand_bn(next(keys), cout),
             "conv2": _rand_conv(next(keys), 3, 3, cout, cout),
             "bn2": _rand_bn(next(keys), cout)}
        if down:
            p["down_conv"] = _rand_conv(next(keys), 1, 1, cin, cout)
            p["down_bn"] = _rand_bn(next(keys), cout)
        return p

    def layer(cin, cout):
        return {"0": block(cin, cout, cin != cout),
                "1": block(cout, cout, False)}

    def prefix():
        return {"conv1": _rand_conv(next(keys), 7, 7, 3, 64),
                "bn1": _rand_bn(next(keys), 64),
                "layer1": layer(64, 64)}

    def slam_p(sd):
        return {"l0": {"w": 0.05 * jax.random.normal(
                            next(keys), (sd * sd, 512)),
                       "b": jnp.zeros((512,))},
                "l1": {"w": 0.05 * jax.random.normal(next(keys), (512, 1)),
                       "b": jnp.zeros((1,))}}

    def cbr(cin, cout, k):
        return {"conv": _rand_conv(next(keys), k, k, cin, cout, bias=True),
                "bn": _rand_bn(next(keys), cout)}

    return {
        "b1_1": prefix(), "b1_1_slam": slam_p(32),
        "b1_2": layer(64, 128), "b1_2_slam": slam_p(32),
        "b2_1": prefix(), "b2_1_slam": slam_p(32),
        "b2_2": layer(64, 128), "b2_2_slam": slam_p(32),
        "b2_3": layer(128, 256), "b2_3_slam": slam_p(16),
        "b2_4": layer(256, 512), "b2_4_slam": slam_p(8),
        "up1": cbr(128, 256, 1), "up2": cbr(512, 256, 1),
        "to_map_f": cbr(512, 512, 3), "to_map_f_slam": slam_p(32),
        "to_map": _rand_conv(next(keys), 1, 1, 512, 1, bias=True),
        "to_score_f": cbr(512, 512, 3), "to_score_f_slam": slam_p(32),
        "head0": {"w": 0.05 * jax.random.normal(next(keys), (512, 512)),
                  "b": jnp.zeros((512,))},
        "head1": {"w": 0.05 * jax.random.normal(next(keys), (512, 1)),
                  "b": jnp.zeros((1,))},
    }


def _t_conv(sd, name, bias=False):
    p = {"w": jnp.asarray(np.asarray(sd[f"{name}.weight"])
                          .transpose(2, 3, 1, 0))}   # OIHW -> HWIO
    if bias:
        p["b"] = jnp.asarray(np.asarray(sd[f"{name}.bias"]))
    return p


def _t_bn(sd, name):
    g = lambda s: jnp.asarray(np.asarray(sd[f"{name}.{s}"]))  # noqa: E731
    return {"scale": g("weight"), "bias": g("bias"),
            "mean": g("running_mean"), "var": g("running_var")}


def _t_lin(sd, name):
    return {"w": jnp.asarray(np.asarray(sd[f"{name}.weight"]).T),
            "b": jnp.asarray(np.asarray(sd[f"{name}.bias"]))}


def icnet_from_state_dict(sd: Dict[str, np.ndarray],
                          cfg: ICNetConfig = ICNET) -> Params:
    """Released ``ck.pth`` state-dict names -> param pytree.

    Torch module layout (reference ``ICNet.py:79-129``): ``b1_1`` is
    ``Sequential(conv1, bn1, relu, maxpool, layer1)`` so its children
    index as ``b1_1.0/1/4``; ``b1_2`` IS torchvision's layer2
    (``b1_2.0``, ``b1_2.1`` blocks); slam MLPs are ``*.linear.0/2``.
    """
    def t_block(name, down):
        p = {"conv1": _t_conv(sd, f"{name}.conv1"),
             "bn1": _t_bn(sd, f"{name}.bn1"),
             "conv2": _t_conv(sd, f"{name}.conv2"),
             "bn2": _t_bn(sd, f"{name}.bn2")}
        if down:
            p["down_conv"] = _t_conv(sd, f"{name}.downsample.0")
            p["down_bn"] = _t_bn(sd, f"{name}.downsample.1")
        return p

    def t_layer(name, down):
        return {"0": t_block(f"{name}.0", down),
                "1": t_block(f"{name}.1", False)}

    def t_prefix(name):
        return {"conv1": _t_conv(sd, f"{name}.0"),
                "bn1": _t_bn(sd, f"{name}.1"),
                "layer1": t_layer(f"{name}.4", False)}

    def t_slam(name):
        return {"l0": _t_lin(sd, f"{name}.linear.0"),
                "l1": _t_lin(sd, f"{name}.linear.2")}

    def t_cbr(name):
        return {"conv": _t_conv(sd, f"{name}.conv", bias=True),
                "bn": _t_bn(sd, f"{name}.bn")}

    return {
        "b1_1": t_prefix("b1_1"), "b1_1_slam": t_slam("b1_1_slam"),
        "b1_2": t_layer("b1_2", True), "b1_2_slam": t_slam("b1_2_slam"),
        "b2_1": t_prefix("b2_1"), "b2_1_slam": t_slam("b2_1_slam"),
        "b2_2": t_layer("b2_2", True), "b2_2_slam": t_slam("b2_2_slam"),
        "b2_3": t_layer("b2_3", True), "b2_3_slam": t_slam("b2_3_slam"),
        "b2_4": t_layer("b2_4", True), "b2_4_slam": t_slam("b2_4_slam"),
        "up1": t_cbr("up1"), "up2": t_cbr("up2"),
        "to_map_f": t_cbr("to_map_f"),
        "to_map_f_slam": t_slam("to_map_f_slam"),
        "to_map": _t_conv(sd, "to_map.to_map.0", bias=True),
        "to_score_f": t_cbr("to_score_f"),
        "to_score_f_slam": t_slam("to_score_f_slam"),
        "head0": _t_lin(sd, "head.0"),
        "head1": _t_lin(sd, "head.2"),
    }


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def make_complexity_scorer(params: Params, cfg: ICNetConfig = ICNET):
    """image uint8 RGB [H,W,3] -> complexity score in [0,1] (the
    reference's IC_inference_transform: resize 512 + ImageNet
    normalize, ``scoring_img.py:109-113``)."""
    import cv2
    jfwd = jax.jit(lambda p, x: icnet_forward(cfg, p, x)[0])
    fwd = lambda x: jfwd(params, x)  # noqa: E731  (no HLO constants)

    def score(image: np.ndarray) -> float:
        img = cv2.resize(image, (cfg.size1, cfg.size1),
                         interpolation=cv2.INTER_LINEAR)
        img = (img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / \
            IMAGENET_STD
        return float(fwd(jnp.asarray(img[None])))

    return score
