"""CogVideoX causal 3D video VAE — TPU-native segmented full-sequence form.

Reimplements the behavior of diffusers' ``AutoencoderKLCogVideoX`` (the
reference imports it rather than vendoring —
``train_code/train_cogvideox_motion_FrameINO.py:673``,
``test_code/run_cogvideox_FrameIn_mass_evaluation.py:17``): a causal 3D
conv VAE with replicate temporal padding, 4x temporal (first-frame
special) and 8x spatial compression, GroupNorm encoder and
latent-conditioned SpatialNorm decoder, scaling_factor latents.

Chunking is SEMANTIC here, unlike the Wan VAE: the reference encodes in
(8+r, 8, 8, ...)-frame batches and decodes in (2+r, 2, ...)-latent
batches with a conv cache, and the Group/Spatial norms compute their
statistics over (C/G, T_chunk, H, W) — so chunk boundaries change the
numbers. This implementation runs everything full-sequence on TPU but
reproduces the chunked statistics exactly via *segmented* normalization:
the temporal axis is split into (first, rest x count) segments that
mirror the reference chunk lengths at every depth, and stats are
computed per segment (vectorized over segments).

Causal convs use replicate-first-frame temporal padding (equivalent to
the conv-cache protocol across chunks); temporal pooling/upsampling has
the first-frame bypass (frame 0 never pooled/duplicated).

``tests/test_cogvideox_vae.py`` re-enacts the chunked protocol literally
and asserts agreement.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from frameino_tpu.ops import conv as cops

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class CogVideoXVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 256, 512)
    latent_channels: int = 16
    layers_per_block: int = 3
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    temporal_compression_ratio: int = 4
    scaling_factor: float = 1.15258426
    frame_batch_size_encode: int = 8
    frame_batch_size_decode: int = 2

    @property
    def temporal_compress_level(self) -> int:
        return int(np.log2(self.temporal_compression_ratio))

    @property
    def spatial_compression_ratio(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)


COGVIDEOX_VAE_CONFIG = CogVideoXVAEConfig()


def tiny_vae_config(**kw) -> CogVideoXVAEConfig:
    base = dict(block_out_channels=(8, 8, 16), latent_channels=4,
                layers_per_block=1, norm_num_groups=4)
    base.update(kw)
    return CogVideoXVAEConfig(**base)


class Seg(NamedTuple):
    """Temporal segmentation: first segment + `count` segments of `rest`."""
    first: int
    rest: int
    count: int

    @property
    def total(self) -> int:
        return self.first + self.rest * self.count


def encode_segments(cfg: CogVideoXVAEConfig, num_frames: int) -> Seg:
    fb = cfg.frame_batch_size_encode
    nb = max(num_frames // fb, 1)
    if nb == 1:
        return Seg(num_frames, 0, 0)
    return Seg(fb + num_frames % fb, fb, nb - 1)


def decode_segments(cfg: CogVideoXVAEConfig, num_latent_frames: int) -> Seg:
    fb = cfg.frame_batch_size_decode
    nb = max(num_latent_frames // fb, 1)
    if nb == 1:
        return Seg(num_latent_frames, 0, 0)
    return Seg(fb + num_latent_frames % fb, fb, nb - 1)


def _pool_seg(seg: Seg) -> Seg:
    # first frame bypass, pairs averaged (chunk lengths: odd first, even rest)
    return Seg((seg.first + 1) // 2, seg.rest // 2, seg.count)


def _up_seg(seg: Seg) -> Seg:
    return Seg(2 * seg.first - 1, 2 * seg.rest, seg.count)


# ---------------------------------------------------------------------------
# Primitives (channels-last [B, T, H, W, C])
# ---------------------------------------------------------------------------

def replicate_causal_conv3d(x: jax.Array, kernel: jax.Array,
                            bias: Optional[jax.Array],
                            kt: int) -> jax.Array:
    """Causal conv with (kt-1) REPLICATED first frames at the time front
    and zero spatial SAME padding (CogVideoXCausalConv3d semantics; the
    conv-cache protocol across chunks reduces to exactly this over the
    full sequence)."""
    if kt > 1:
        front = jnp.repeat(x[:, :1], kt - 1, axis=1)
        x = jnp.concatenate([front, x], axis=1)
    kh = kernel.shape[1]
    ph = kh // 2
    acc = cops.default_accum_dtype()   # fp32 unless a serving/trainer
    y = jax.lax.conv_general_dilated(  # accum_dtype_scope is active
        x, kernel.astype(x.dtype), window_strides=(1, 1, 1),
        padding=((0, 0), (ph, ph), (ph, ph)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=acc)
    if bias is not None:
        y = y + bias.astype(acc)
    return y.astype(x.dtype)


def _split_segments(x: jax.Array, seg: Seg):
    first = x[:, :seg.first]
    if seg.count == 0:
        return first, None
    B, T, H, W, C = x.shape
    rest = x[:, seg.first:].reshape(B, seg.count, seg.rest, H, W, C)
    return first, rest


def _merge_segments(first: jax.Array, rest, seg: Seg) -> jax.Array:
    if rest is None:
        return first
    B = first.shape[0]
    H, W, C = first.shape[2], first.shape[3], first.shape[4]
    return jnp.concatenate(
        [first, rest.reshape(B, seg.count * seg.rest, H, W, C)], axis=1)


def group_norm_seg(x: jax.Array, seg: Seg, gamma: jax.Array,
                   beta: jax.Array, groups: int,
                   eps: float = 1e-6) -> jax.Array:
    """GroupNorm with statistics over (T_segment, H, W, C/G) per segment —
    matching nn.GroupNorm applied to each reference chunk."""
    def gn(y):
        # y: [..., t, H, W, C]; stats over the last four dims per group
        shp = y.shape
        g = y.astype(jnp.float32).reshape(*shp[:-1], groups, shp[-1] // groups)
        axes = tuple(range(g.ndim - 5, g.ndim - 2)) + (g.ndim - 1,)
        mean = jnp.mean(g, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(g - mean), axis=axes, keepdims=True)
        out = (g - mean) * jax.lax.rsqrt(var + eps)
        return out.reshape(shp)

    first, rest = _split_segments(x, seg)
    nf = gn(first)
    nr = gn(rest) if rest is not None else None
    y = _merge_segments(nf, nr, seg)
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return y.astype(x.dtype)


def temporal_downsample(x: jax.Array) -> jax.Array:
    """Frame-0 bypass + pairwise average (CogVideoXDownsample3D compress
    path, acting globally thanks to odd-first/even-rest chunk alignment)."""
    B, T, H, W, C = x.shape
    rest = x[:, 1:].reshape(B, (T - 1) // 2, 2, H, W, C).mean(axis=2)
    return jnp.concatenate([x[:, :1], rest.astype(x.dtype)], axis=1)


def spatial_downsample(p: Params, x: jax.Array) -> jax.Array:
    """ZeroPad (0,1,0,1) + per-frame Conv2d stride 2."""
    B, T, H, W, C = x.shape
    x2 = cops.zero_pad_hw_br(x.reshape(B * T, H, W, C))
    x2 = cops.conv2d(x2, **p, stride=2, padding="VALID")
    return x2.reshape(B, T, x2.shape[1], x2.shape[2], x2.shape[3])


def temporal_spatial_upsample(p: Params, x: jax.Array,
                              compress_time: bool) -> jax.Array:
    """CogVideoXUpsample3D: nearest 2x (time rest-only + space), then
    per-frame Conv2d 3x3."""
    B, T, H, W, C = x.shape
    if compress_time and T > 1:
        rest = jnp.repeat(x[:, 1:], 2, axis=1)
        x = jnp.concatenate([x[:, :1], rest], axis=1)
    x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
    B, T, H, W, C = x.shape
    x2 = cops.conv2d(x.reshape(B * T, H, W, C), **p, padding="SAME")
    return x2.reshape(B, T, H, W, x2.shape[-1])


def align_zq(zq: jax.Array, f_shape, f_seg: Seg) -> jax.Array:
    """Nearest-resize the latent zq to the feature grid (SpatialNorm3D's
    F.interpolate): frame 0 maps to frame 0, the rest repeat uniformly;
    integer spatial repeat."""
    B, Tz, Hz, Wz, C = zq.shape
    Tf, Hf, Wf = f_shape[1], f_shape[2], f_shape[3]
    if Tf != Tz:
        r = (Tf - 1) // max(Tz - 1, 1)
        rest = jnp.repeat(zq[:, 1:], r, axis=1)
        zq = jnp.concatenate([zq[:, :1], rest], axis=1)
    if Hf != Hz:
        s = Hf // Hz
        zq = jnp.repeat(jnp.repeat(zq, s, axis=2), Wf // Wz, axis=3)
    return zq


def spatial_norm_seg(p: Params, f: jax.Array, zq: jax.Array, seg: Seg,
                     groups: int, eps: float = 1e-6) -> jax.Array:
    """CogVideoXSpatialNorm3D: GroupNorm(f) * conv_y(zq) + conv_b(zq)."""
    zq = align_zq(zq, f.shape, seg)
    ones = jnp.ones((f.shape[-1],), jnp.float32)
    zeros = jnp.zeros((f.shape[-1],), jnp.float32)
    nf = group_norm_seg(f, seg, p["norm"]["weight"], p["norm"]["bias"],
                        groups, eps)
    y = replicate_causal_conv3d(zq, p["conv_y"]["kernel"],
                                p["conv_y"]["bias"], kt=1)
    b = replicate_causal_conv3d(zq, p["conv_b"]["kernel"],
                                p["conv_b"]["bias"], kt=1)
    return (nf.astype(jnp.float32) * y.astype(jnp.float32)
            + b.astype(jnp.float32)).astype(f.dtype)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def _norm(p, x, seg, zq, groups, eps):
    if zq is None:
        return group_norm_seg(x, seg, p["weight"], p["bias"], groups, eps)
    return spatial_norm_seg(p, x, zq, seg, groups, eps)


def resnet_forward(cfg: CogVideoXVAEConfig, p: Params, x: jax.Array,
                   seg: Seg, zq: Optional[jax.Array]) -> jax.Array:
    """CogVideoXResnetBlock3D (GroupNorm or SpatialNorm variant)."""
    g, eps = cfg.norm_num_groups, cfg.norm_eps
    h = jax.nn.silu(_norm(p["norm1"], x, seg, zq, g, eps))
    h = replicate_causal_conv3d(h, p["conv1"]["kernel"], p["conv1"]["bias"], 3)
    h = jax.nn.silu(_norm(p["norm2"], h, seg, zq, g, eps))
    h = replicate_causal_conv3d(h, p["conv2"]["kernel"], p["conv2"]["bias"], 3)
    if "conv_shortcut" in p:
        x = replicate_causal_conv3d(x, p["conv_shortcut"]["kernel"],
                                    p["conv_shortcut"]["bias"], 1)
    return x + h


def encoder_forward(cfg: CogVideoXVAEConfig, params: Params,
                    x: jax.Array, seg: Seg) -> jax.Array:
    x = replicate_causal_conv3d(x, params["conv_in"]["kernel"],
                                params["conv_in"]["bias"], 3)
    for i, blk in enumerate(params["down_blocks"]):
        for r in blk["resnets"]:
            x = resnet_forward(cfg, r, x, seg, None)
        if blk.get("downsampler") is not None:
            if blk["compress_time"].v:
                x = temporal_downsample(x)
                seg = _pool_seg(seg)
            x = spatial_downsample(blk["downsampler"], x)
    for r in params["mid"]["resnets"]:
        x = resnet_forward(cfg, r, x, seg, None)
    x = group_norm_seg(x, seg, params["norm_out"]["weight"],
                       params["norm_out"]["bias"], cfg.norm_num_groups,
                       cfg.norm_eps)
    x = jax.nn.silu(x)
    x = replicate_causal_conv3d(x, params["conv_out"]["kernel"],
                                params["conv_out"]["bias"], 3)
    return x


def decoder_forward(cfg: CogVideoXVAEConfig, params: Params,
                    z: jax.Array, seg: Seg) -> jax.Array:
    zq = z
    x = replicate_causal_conv3d(z, params["conv_in"]["kernel"],
                                params["conv_in"]["bias"], 3)
    for r in params["mid"]["resnets"]:
        x = resnet_forward(cfg, r, x, seg, zq)
    for blk in params["up_blocks"]:
        for r in blk["resnets"]:
            x = resnet_forward(cfg, r, x, seg, zq)
        if blk.get("upsampler") is not None:
            ct = blk["compress_time"].v
            x = temporal_spatial_upsample(blk["upsampler"], x, ct)
            if ct:
                seg = _up_seg(seg)
    x = spatial_norm_seg(params["norm_out"], x, zq, seg,
                         cfg.norm_num_groups, cfg.norm_eps)
    x = jax.nn.silu(x)
    x = replicate_causal_conv3d(x, params["conv_out"]["kernel"],
                                params["conv_out"]["bias"], 3)
    return x


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _init_cconv(key, cin, cout, k):
    if k == 1:
        return cops.init_conv3d(key, 1, 1, 1, cin, cout)
    return cops.init_conv3d(key, 3, 3, 3, cin, cout)


def _init_gn(dim):
    return {"weight": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def _init_spatial_norm(key, f_ch, zq_ch):
    k1, k2 = jax.random.split(key)
    return {
        "norm": _init_gn(f_ch),
        "conv_y": cops.init_conv3d(k1, 1, 1, 1, zq_ch, f_ch),
        "conv_b": cops.init_conv3d(k2, 1, 1, 1, zq_ch, f_ch),
    }


def _init_resnet(key, cfg, cin, cout, zq_ch=None):
    ks = iter(jax.random.split(key, 5))
    p: Params = {
        "conv1": _init_cconv(next(ks), cin, cout, 3),
        "conv2": _init_cconv(next(ks), cout, cout, 3),
    }
    if zq_ch is None:
        p["norm1"] = _init_gn(cin)
        p["norm2"] = _init_gn(cout)
    else:
        p["norm1"] = _init_spatial_norm(next(ks), cin, zq_ch)
        p["norm2"] = _init_spatial_norm(next(ks), cout, zq_ch)
    if cin != cout:
        p["conv_shortcut"] = _init_cconv(next(ks), cin, cout, 1)
    return p


def init_cogvideox_vae(key, cfg: CogVideoXVAEConfig) -> Params:
    from frameino_tpu.core.tree import meta
    boc = cfg.block_out_channels
    keys = iter(jax.random.split(key, 256))
    params: Params = {"encoder": {}, "decoder": {}}

    # --- encoder ---
    e: Params = {"conv_in": _init_cconv(next(keys), cfg.in_channels, boc[0], 3),
                 "down_blocks": []}
    ch = boc[0]
    for i, out_ch in enumerate(boc):
        blk = {"resnets": [], "downsampler": None,
               "compress_time": meta(i < cfg.temporal_compress_level)}
        for _ in range(cfg.layers_per_block):
            blk["resnets"].append(_init_resnet(next(keys), cfg, ch, out_ch))
            ch = out_ch
        if i < len(boc) - 1:
            blk["downsampler"] = cops.init_conv2d(next(keys), 3, 3, ch, ch)
        e["down_blocks"].append(blk)
    e["mid"] = {"resnets": [_init_resnet(next(keys), cfg, ch, ch)
                            for _ in range(2)]}
    e["norm_out"] = _init_gn(ch)
    e["conv_out"] = _init_cconv(next(keys), ch, 2 * cfg.latent_channels, 3)
    params["encoder"] = e

    # --- decoder ---
    rboc = list(reversed(boc))
    zc = cfg.latent_channels
    d: Params = {"conv_in": _init_cconv(next(keys), zc, rboc[0], 3),
                 "mid": {"resnets": [
                     _init_resnet(next(keys), cfg, rboc[0], rboc[0], zq_ch=zc)
                     for _ in range(2)]},
                 "up_blocks": []}
    ch = rboc[0]
    for i, out_ch in enumerate(rboc):
        blk = {"resnets": [], "upsampler": None,
               "compress_time": meta(i < cfg.temporal_compress_level)}
        for _ in range(cfg.layers_per_block + 1):
            blk["resnets"].append(
                _init_resnet(next(keys), cfg, ch, out_ch, zq_ch=zc))
            ch = out_ch
        if i < len(rboc) - 1:
            blk["upsampler"] = cops.init_conv2d(next(keys), 3, 3, ch, ch)
        d["up_blocks"].append(blk)
    d["norm_out"] = _init_spatial_norm(next(keys), ch, zc)
    d["conv_out"] = _init_cconv(next(keys), ch, cfg.out_channels, 3)
    params["decoder"] = d
    return params


# ---------------------------------------------------------------------------
# Public API ([B, C, T, H, W] boundary like the reference)
# ---------------------------------------------------------------------------

def _to_cl(x):
    return jnp.transpose(x, (0, 2, 3, 4, 1))


def _to_cf(x):
    return jnp.transpose(x, (0, 4, 1, 2, 3))


def encode_moments(cfg: CogVideoXVAEConfig, params: Params,
                   video: jax.Array) -> jax.Array:
    """video [B, 3, T, H, W] -> moments [B, 2z, T', H', W']."""
    x = _to_cl(video)
    seg = encode_segments(cfg, x.shape[1])
    h = encoder_forward(cfg, params["encoder"], x, seg)
    return _to_cf(h)


def encode(cfg: CogVideoXVAEConfig, params: Params, video: jax.Array,
           sample_mode: str = "sample",
           key: Optional[jax.Array] = None) -> jax.Array:
    moments = encode_moments(cfg, params, video)
    mean, logvar = jnp.split(moments, 2, axis=1)
    if sample_mode == "argmax":
        return mean
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    key = key if key is not None else jax.random.key(0)
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


def decode(cfg: CogVideoXVAEConfig, params: Params, z: jax.Array) -> jax.Array:
    """z [B, z, T', H', W'] -> video [B, 3, T, H, W]."""
    x = _to_cl(z)
    seg = decode_segments(cfg, x.shape[1])
    out = decoder_forward(cfg, params["decoder"], x, seg)
    return _to_cf(out)
