"""Post-training int8 quantization of the DiT matmul weights (inference).

v5e's MXU runs int8 at 2x bf16 throughput (measured 266 TOP/s raw,
224 effective with dynamic activation quant, vs 160 TFLOP/s bf16 at the
Wan 5B FFN shape). The reference has no quantized inference path at all
(its 8-bit option is the bitsandbytes *optimizer*,
``train_code/train_wan_motion_FrameINO.py:433-451``) — this is TPU
headroom, opt-in via ``quantize_wan_dit_int8`` on a loaded param tree.

Scheme: symmetric per-output-channel weight scales + dynamic per-token
activation scales (``ops/linear.dense_int8``). Quantized: the block
qkv/out projections and the FFN — the FLOP carriers. Kept bf16/fp32:
patch embedding, condition embedders, qk-norm gains, AdaLN tables,
proj_out (quality-sensitive, negligible FLOPs).
"""

from __future__ import annotations

import re
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from frameino_tpu.core.tree import flatten, unflatten

Params = Dict[str, Any]

# block-level matmuls worth quantizing (stacked under blocks.)
_QUANT_PATTERNS = (
    r"blocks\..*(to_q|to_k|to_v|to_out|add_k_proj|add_v_proj)\.kernel$",
    r"blocks\..*ffn\.fc[12]\.kernel$",
    r"blocks\..*ff\.fc[12]\.kernel$",           # CogVideoX naming
)


def _quantize_kernel(w: jax.Array):
    """[.., in, out] fp -> int8 kernel + per-out-channel fp32 scale.

    Works on stacked [layers, in, out] kernels: scales are per (layer,
    out-channel).
    """
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)     # [..,1,out]
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale.squeeze(-2)


def _quantize_kernel_chunked(w: jax.Array):
    """Per-leaf quantization with fp32 intermediates bounded: stacked
    [L, in, out] kernels quantize one layer at a time (``lax.map``) so
    the fp32 upcast peaks at one layer's kernel, not the whole leaf."""
    if w.ndim >= 3:
        return jax.lax.map(_quantize_kernel, w)
    return _quantize_kernel(w)


# the donating variant frees each bf16 kernel as soon as its int8 copy
# exists — peak HBM ~ (full tree) + (one int8 leaf), which is what lets
# CogVideoX-5B (12.8 GB bf16) quantize on a 15.75 GB chip
_quantize_device = jax.jit(_quantize_kernel_chunked)
_quantize_device_donate = jax.jit(_quantize_kernel_chunked,
                                  donate_argnums=(0,))


def _quantize_kernel_host(w: "np.ndarray"):
    """Same math in numpy for host-resident (pre-upload) leaves."""
    wf = np.asarray(w, dtype=np.float32)
    absmax = np.max(np.abs(wf), axis=-2, keepdims=True)
    scale = np.maximum(absmax / 127.0, 1e-12).astype(np.float32)
    q = np.clip(np.round(wf / scale), -127, 127).astype(np.int8)
    return q, np.squeeze(scale, axis=-2)


def quantize_dit_int8(params: Params, donate: bool = False) -> Params:
    """Replace hot matmul kernels with {kernel_q, scale}; the ops-layer
    ``dense`` dispatches automatically. Returns a new param tree.

    Streaming: each kernel is quantized by its own per-leaf jit call,
    and host (numpy) leaves quantize in numpy before any upload. With
    ``donate=True`` each device bf16 kernel is donated — freed as soon
    as its int8 copy exists — so quantizing never holds two full param
    trees in HBM (required for CogVideoX-5B on one chip). Donation
    invalidates the caller's tree; serving paths that hand the tree off
    (the pipelines) use it, callers that keep the bf16 tree (tests,
    bf16-vs-int8 benches) must not.
    """
    flat = flatten(params)
    out = {}
    quantized = set()
    dev_q = _quantize_device_donate if donate else _quantize_device
    for path, leaf in flat.items():
        if any(re.match(p, path) for p in _QUANT_PATTERNS):
            if isinstance(leaf, np.ndarray):
                q, s = _quantize_kernel_host(leaf)
            else:
                q, s = dev_q(leaf)
            base = path[: -len(".kernel")]
            out[base + ".kernel_q"] = q
            out[base + ".scale"] = s
            quantized.add(path)
        else:
            out[path] = leaf
    if not quantized:
        raise ValueError("no kernels matched the int8 quant patterns")
    return unflatten(out)


# aliases per model family (same patterns cover both)
quantize_wan_dit_int8 = quantize_dit_int8
quantize_cogvideox_dit_int8 = quantize_dit_int8


# ---------------------------------------------------------------------------
# VAE conv quantization (decoder/encoder w8a8 serving path)
# ---------------------------------------------------------------------------

# conv param-dict names inside resblocks/resamplers worth quantizing.
# Kept full precision: conv_in / conv_out (first/last pixel-facing
# convs), quant_conv/post_quant_conv (1x1, negligible), attention
# to_qkv/proj (dense einsums, tiny FLOPs at latent resolution).
_VAE_CONV_NAMES = ("conv1", "conv2", "conv_shortcut", "conv", "time_conv")


def _quantize_conv_kernel(w) -> tuple:
    """[k..., cin, cout] -> int8 kernel + per-cout fp32 scale (reduce
    over every axis but the last)."""
    if isinstance(w, np.ndarray):
        wf = np.asarray(w, np.float32)
        absmax = np.max(np.abs(wf), axis=tuple(range(wf.ndim - 1)))
        scale = np.maximum(absmax / 127.0, 1e-12).astype(np.float32)
        q = np.clip(np.round(wf / scale), -127, 127).astype(np.int8)
        return q, scale
    wf = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=tuple(range(wf.ndim - 1)))
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_wan_vae_int8(params: Params) -> Params:
    """int8 w8a8 serving transform for the Wan VAE param tree
    (``models/wan_vae.py`` nested dict/list layout; the streaming and
    tiled/hybrid variants share the same apply fns so they inherit the
    quantized path automatically via the ops-layer dispatch in
    ``ops/conv.py``).

    Opt-in and inference-only: measured ~1.35x on decoder conv time
    (ROADMAP.md); training VAE encodes stay bf16/f32. Quality must be
    certified per checkpoint like the DiT path
    (``scripts/certify_int8.py --quantize_vae``).
    """
    n_quantized = 0

    def walk(node, name):
        nonlocal n_quantized
        if isinstance(node, dict):
            if (name in _VAE_CONV_NAMES and "kernel" in node
                    and getattr(node["kernel"], "ndim", 0) in (4, 5)):
                q, s = _quantize_conv_kernel(node["kernel"])
                n_quantized += 1
                out = {"kernel_q": q, "scale": s}
                if "bias" in node:
                    out["bias"] = node["bias"]
                return out
            return {k: walk(v, k) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return [walk(v, name) for v in node]
        return node

    out = walk(params, "")
    if not n_quantized:
        raise ValueError("no VAE conv kernels matched the int8 patterns")
    return out
