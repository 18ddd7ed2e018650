"""Streaming (temporally-chunked) Wan VAE decode/encode — jitted chunks.

The full-sequence decoder (``wan_vae.decode``) is fastest when its
activations fit; at 5B-inference memory budgets the decoder can exceed
HBM next to the resident DiT. This module processes LATENT-FRAME CHUNKS
at full width, carrying the reference's per-conv feature caches across
chunks (``autoencoder_kl_wan.py:1198-1227`` frame-by-frame decode /
``:1145-1169`` 1+4k encode) with a configurable chunk size.

TPU execution model: each chunk runs as ONE jitted program taking
``(params, x_chunk, caches)`` and returning ``(out, new_caches)`` — so
intermediates are freed inside XLA instead of piling up in the async
dispatch queue (eager chunk loops OOM on the tunneled backend because
nothing synchronizes). Three programs compile in total: the first
chunk (no caches), the second (caches partially filled), and steady
state.

"Rep" marker equivalence: the reference marks a fresh upsample3d cache
with the string "Rep" (``:271-282``), which makes the next chunk (a)
run the time conv with full causal zero padding and (b) seed the cache
with a zero frame. Both behaviors are exactly reproduced by a cache of
two ZERO frames, so caches here are always arrays and cross the jit
boundary as regular pytree leaves.

Numerics match ``wan_vae.decode``/``encode_moments`` exactly (chunk
protocol == full-sequence form; see the equivalence tests).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from frameino_tpu.core.tree import unmeta
from frameino_tpu.models import wan_vae as M
from frameino_tpu.ops import conv as cops

Params = Dict[str, Any]
CACHE_T = 2


def _triple(p):
    return (p, p, p) if isinstance(p, int) else p


def _cconv_fwd(x, p, cache, padding, stride=(1, 1, 1)):
    """WanCausalConv3d.forward with an explicit cache (channels-last)."""
    pt, ph, pw = _triple(padding)
    front = 2 * pt
    if cache is not None and front > 0:
        x = jnp.concatenate([cache, x], axis=1)
        front -= cache.shape[1]
    st, sh, sw = _triple(stride) if not isinstance(stride, tuple) else stride
    pads = ((front, 0), (ph, ph), (pw, pw))
    dn = ("NDHWC", "DHWIO", "NDHWC")
    if "kernel_q" in p:   # int8 w8a8 serving path (quantize_wan_vae_int8)
        return cops._conv_int8(x, p["kernel_q"], p["scale"], p.get("bias"),
                               (st, sh, sw), pads, dn)
    accum = cops.default_accum_dtype()   # fp32; bf16 under the trainer's
    if jnp.dtype(accum).itemsize < jnp.dtype(x.dtype).itemsize:  # encode scope
        x = x.astype(accum)
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), window_strides=(st, sh, sw),
        padding=pads, dimension_numbers=dn,
        preferred_element_type=accum)
    return (y + p["bias"].astype(accum)).astype(x.dtype)


def _cconv_call(x, p, cache, idx, padding):
    i = idx[0]
    cache_x = x[:, -CACHE_T:]
    if cache_x.shape[1] < 2 and cache[i] is not None:
        cache_x = jnp.concatenate([cache[i][:, -1:], cache_x], axis=1)
    out = _cconv_fwd(x, p, cache[i], padding)
    cache[i] = cache_x
    idx[0] += 1
    return out


def _res_chunk(p, x, cache, idx):
    if "conv_shortcut" in p:
        h = _cconv_fwd(x, p["conv_shortcut"], None, 0)
    else:
        h = x
    x = jax.nn.silu(M._rms(x, p["norm1"]))
    x = _cconv_call(x, p["conv1"], cache, idx, 1)
    x = jax.nn.silu(M._rms(x, p["norm2"]))
    x = _cconv_call(x, p["conv2"], cache, idx, 1)
    return x + h


def _up3d_chunk(p, x, cache, idx):
    """upsample3d; a fresh cache slot ("Rep" in the reference) is the
    first-chunk bypass and seeds a two-zero-frame cache."""
    B, T, H, W, C = x.shape
    i = idx[0]
    if cache[i] is None:
        cache[i] = jnp.zeros((B, 2, H, W, C), x.dtype)
        idx[0] += 1
    else:
        cache_x = x[:, -CACHE_T:]
        if cache_x.shape[1] < 2:
            cache_x = jnp.concatenate([cache[i][:, -1:], cache_x], axis=1)
        x = _cconv_fwd(x, p["time_conv"], cache[i], (1, 0, 0))
        cache[i] = cache_x
        idx[0] += 1
        t = x.shape[1]
        x = x.reshape(B, t, H, W, 2, C)
        x = x.transpose(0, 1, 4, 2, 3, 5).reshape(B, 2 * t, H, W, C)
    return M.spatial_resample_apply(p, x, "upsample3d")


def _down3d_chunk(p, x, cache, idx):
    x = M.spatial_resample_apply(p, x, "downsample3d")
    i = idx[0]
    if cache[i] is None:
        # first chunk: identity bypass; only the last frame is consumed
        cache[i] = x[:, -1:]
        idx[0] += 1
        return x
    cache_x = x[:, -1:]
    x = _cconv_fwd(jnp.concatenate([cache[i], x], axis=1),
                   p["time_conv"], None, 0, stride=(2, 1, 1))
    cache[i] = cache_x
    idx[0] += 1
    return x


def _decoder_chunk(cfg, params, x, cache, idx, first_chunk):
    x = _cconv_call(x, params["conv_in"], cache, idx, 1)
    x = _res_chunk(params["mid"]["res1"], x, cache, idx)
    x = M.attn_block_apply(params["mid"]["attn"], x)
    x = _res_chunk(params["mid"]["res2"], x, cache, idx)
    for blk in params["up_blocks"]:
        x_copy = x
        for r in blk["resnets"]:
            x = _res_chunk(r, x, cache, idx)
        if blk.get("upsampler") is not None:
            if unmeta(blk["up_mode"]) == "upsample3d":
                x = _up3d_chunk(blk["upsampler"], x, cache, idx)
            else:
                x = M.upsample2d_apply(blk["upsampler"], x)
        if unmeta(blk.get("has_dup_shortcut", False)):
            x = x + M.dup_up3d(x_copy, unmeta(blk["out_dim"]),
                               unmeta(blk["factor_t"]), 2,
                               first_chunk=first_chunk)
    x = jax.nn.silu(M._rms(x, params["norm_out"]))
    x = _cconv_call(x, params["conv_out"], cache, idx, 1)
    return x


def _encoder_chunk(cfg, params, x, cache, idx):
    x = _cconv_call(x, params["conv_in"], cache, idx, 1)
    for blk in params["down_blocks"]:
        kind = unmeta(blk["kind"])
        if kind == "res":
            x = _res_chunk(blk, x, cache, idx)
        elif kind == "attn":
            x = M.attn_block_apply(blk, x)
        elif kind == "downsample2d":
            x = M.downsample2d_apply(blk, x)
        elif kind == "downsample3d":
            x = _down3d_chunk(blk, x, cache, idx)
        elif kind == "res_down":
            x_copy = x
            for r in blk["resnets"]:
                x = _res_chunk(r, x, cache, idx)
            if blk.get("downsampler") is not None:
                if unmeta(blk["down_mode"]) == "downsample3d":
                    x = _down3d_chunk(blk["downsampler"], x, cache, idx)
                else:
                    x = M.downsample2d_apply(blk["downsampler"], x)
            x = x + M.avg_down3d(x_copy, unmeta(blk["out_dim"]),
                                 unmeta(blk["factor_t"]),
                                 unmeta(blk["factor_s"]))
    x = _res_chunk(params["mid"]["res1"], x, cache, idx)
    x = M.attn_block_apply(params["mid"]["attn"], x)
    x = _res_chunk(params["mid"]["res2"], x, cache, idx)
    x = jax.nn.silu(M._rms(x, params["norm_out"]))
    x = _cconv_call(x, params["conv_out"], cache, idx, 1)
    return x


_MAX_CACHE = 512


@functools.partial(jax.jit, static_argnames=("first", "cfg", "kind"))
def _chunk_step(params, xc, caches, first, cfg, kind):
    """One jitted chunk program. Module-level (NOT a per-call closure)
    so the jit cache is shared across calls — critical for the
    tiled x streaming hybrid decode, where 8+ tiles reuse the same 2-3
    chunk programs instead of recompiling per tile (measured: per-tile
    recompilation blew a 30-minute budget on the remote TPU compiler).
    ``cfg`` (frozen dataclass) and ``kind`` are static."""
    cache: List = list(caches) + [None] * (_MAX_CACHE - len(caches))
    idx = [0]
    if kind == "decoder":
        out = _decoder_chunk(cfg, params, xc, cache, idx, first_chunk=first)
    else:
        out = _encoder_chunk(cfg, params, xc, cache, idx)
    return out, tuple(cache[:idx[0]])


def _run_chunks(cfg, kind, params, x, chunk_sizes):
    """Drive the jitted per-chunk programs with caches as pytree state.

    Retracing happens automatically when cache shapes evolve (first
    chunk -> partially filled -> steady state): 2-3 programs total.
    """
    outs = []
    caches: Tuple = ()
    pos = 0
    for ci, n in enumerate(chunk_sizes):
        out, caches = _chunk_step(params, x[:, pos:pos + n], caches,
                                  ci == 0, cfg, kind)
        outs.append(out)
        pos += n
    return jnp.concatenate(outs, axis=1)


def streaming_decode(cfg: M.WanVAEConfig, params: Params, z: jax.Array,
                     chunk_latent_frames: int = 2,
                     clamp: bool = True) -> jax.Array:
    """z [B, z, T', h, w] -> video [B, Cout, T, H, W].

    First chunk is 1 latent frame (the causal bootstrap), then
    ``chunk_latent_frames`` per jitted step with conv caches carried.
    Peak memory ~ one chunk's decoder activations at full width.
    """
    x = M._to_cl(z)
    x = cops.causal_conv3d(x, **params["post_quant_conv"])
    T = x.shape[1]
    sizes = [1]
    while sum(sizes) < T:
        sizes.append(min(chunk_latent_frames, T - sum(sizes)))

    out = _run_chunks(cfg, "decoder", params["decoder"], x, sizes)
    if cfg.patch_size is not None:
        out = M.unpatchify(out, cfg.patch_size)
    out = M._to_cf(out)
    return jnp.clip(out, -1.0, 1.0) if clamp else out


def encode_moments_inline(cfg: M.WanVAEConfig, params: Params,
                          video: jax.Array,
                          chunk_pixel_frames: int = 8) -> jax.Array:
    """TRACEABLE chunked encode — same chunk protocol as
    ``streaming_encode_moments`` but with no inner ``jax.jit``, so it can
    run inside an outer jitted program (the one-jit train step,
    ``training/trainer.py``). Chunks are serialized with
    ``optimization_barrier`` so XLA frees each chunk's near-full-res
    encoder temps before starting the next: peak activation memory drops
    from the whole clip's stage-1 activations (5x 1.58 GB at
    480x832x49f — the 16 GB OOM in scripts/bench_train.py) to one
    chunk's. Numerics == ``wan_vae.encode_moments`` (chunk protocol ==
    full-sequence form; equivalence-tested in tests/test_vae_streaming.py).
    """
    assert chunk_pixel_frames % 4 == 0
    x = M._to_cl(video)
    if cfg.patch_size is not None:
        x = M.patchify(x, cfg.patch_size)
    T = x.shape[1]
    sizes = [1]
    while sum(sizes) < T:
        sizes.append(min(chunk_pixel_frames, T - sum(sizes)))

    outs: List = []
    caches: Tuple = ()
    pos = 0
    for n in sizes:
        xc = x[:, pos:pos + n]
        if outs:
            xc = jax.lax.optimization_barrier((outs[-1], xc))[1]
        cache: List = list(caches) + [None] * (_MAX_CACHE - len(caches))
        idx = [0]
        outs.append(_encoder_chunk(cfg, params["encoder"], xc, cache, idx))
        caches = tuple(cache[:idx[0]])
        pos += n
    out = jnp.concatenate(outs, axis=1)
    out = cops.causal_conv3d(out, **params["quant_conv"])
    return M._to_cf(out)


def streaming_encode_moments(cfg: M.WanVAEConfig, params: Params,
                             video: jax.Array,
                             chunk_pixel_frames: int = 8) -> jax.Array:
    """Chunked encode (first 1 frame, then multiples of 4 pixel frames)."""
    assert chunk_pixel_frames % 4 == 0
    x = M._to_cl(video)
    if cfg.patch_size is not None:
        x = M.patchify(x, cfg.patch_size)
    T = x.shape[1]
    sizes = [1]
    while sum(sizes) < T:
        sizes.append(min(chunk_pixel_frames, T - sum(sizes)))

    out = _run_chunks(cfg, "encoder", params["encoder"], x, sizes)
    out = cops.causal_conv3d(out, **params["quant_conv"])
    return M._to_cf(out)
