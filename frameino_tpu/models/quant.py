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


def quantize_dit_int8(params: Params) -> Params:
    """Replace hot matmul kernels with {kernel_q, scale}; the ops-layer
    ``dense`` dispatches automatically. Returns a new param tree."""
    flat = flatten(params)
    out = {}
    quantized = set()
    for path, leaf in flat.items():
        if any(re.match(p, path) for p in _QUANT_PATTERNS):
            q, s = _quantize_kernel(leaf)
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
