"""Parameter/activation sharding rules for the video DiTs.

The reference's distributed story is single-node DDP (NCCL all-reduce,
``config/accelerate_config_4GPU.json``, ``train_code/
train_wan_motion_FrameINO.py:733-741``). The TPU-native design instead
lays parameters and activations out over a 4-axis
``jax.sharding.Mesh``:

    dp    batch data parallelism (gradient psum over ICI)
    fsdp  ZeRO-3-style parameter/optimizer sharding
    tp    tensor parallelism (attention heads / FFN hidden)
    sp    sequence parallelism over video tokens
    pp    pipeline parallelism: stacked-block 'layers' axis sharded into
          stages (GPipe schedule in ``parallel/pipeline.py``)

and lets XLA GSPMD insert the collectives (pp's ppermutes are the one
manual exception). Rules are path-pattern based over the plain-dict
parameter pytrees, with divisibility guards so any mesh shape degrades
gracefully to replication.

EP is intentionally absent: the architecture has no per-token-routed
MoE experts (SURVEY §2.8). Wan2.2's "two experts" are timestep-routed
whole models — the pipeline splits the denoise schedule between them
(``frameino_tpu/pipelines/wan_i2v.py``), and sharding BOTH expert param
trees with these same rules (fsdp/tp/pp) is the expert-parallel layout:
per-chip memory halves without a dedicated mesh axis.
"""

from __future__ import annotations

import re
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from frameino_tpu.core.tree import flatten, unflatten


# (path regex, spec builder given leaf ndim). Specs may include a leading
# 'layers' axis when params are stacked for lax.scan — handled by the
# stacked flag below. Order matters: first match wins.
_DIT_RULES = [
    # column-parallel projections: output dim over tp, input over fsdp
    # (ffn? covers both the Wan 'ffn' and CogVideoX 'ff' FFN naming)
    (r".*(to_q|to_k|to_v|add_k_proj|add_v_proj)\.kernel$", ("fsdp", "tp")),
    (r".*ffn?\.fc1\.kernel$", ("fsdp", "tp")),
    (r".*(to_q|to_k|to_v|add_k_proj|add_v_proj)\.bias$", ("tp",)),
    (r".*ffn?\.fc1\.bias$", ("tp",)),
    # row-parallel projections: input dim over tp, output over fsdp
    (r".*to_out\.kernel$", ("tp", "fsdp")),
    (r".*ffn?\.fc2\.kernel$", ("tp", "fsdp")),
    # big non-attention matmuls: fsdp on the larger axis
    (r".*patch_embedding\.kernel$", (None, "fsdp")),
    (r".*proj_out\.kernel$", ("fsdp", None)),
    (r".*text_embedder\.linear_1\.kernel$", ("fsdp", None)),
    # time-embedding MLP + 6-way projection: activations are [B, dim]
    # scalars-per-example; sharding these kernels makes GSPMD reshard
    # tiny tensors every step ("involuntary full rematerialization"
    # warnings) — replicate them instead. Covers BOTH namings: Wan's
    # 'time_embedder' and CogVideoX's 'time_embedding' (the Cog one
    # previously fell through to the generic linear_\d rule, got
    # fsdp-sharded, and its [1, D] bias cotangent tripped the
    # involuntary-remat warning the collective audit fails on)
    (r".*(time_embedd(er|ing)|ofs_embedding)\.linear_\d\.kernel$", (None,)),
    (r".*time_proj\.kernel$", (None,)),
    (r".*linear_\d\.kernel$", (None, "fsdp")),
]


def _with_pp(spec: P, stacked: bool, shape, mesh: Mesh) -> P:
    """Stacked-block leaves: shard the leading 'layers' axis over pp.

    With pp == 1 this is the identity (layers replicated, scan sweeps
    them); with pp > 1 each pipeline stage holds its L/pp block slice
    (``parallel/pipeline.py`` consumes exactly this layout).
    """
    ppn = mesh.shape.get("pp", 1)
    if not stacked or ppn <= 1 or shape[0] % ppn:
        return spec
    dims = list(spec) + [None] * (len(shape) - len(spec))
    dims[0] = "pp"
    while dims and dims[-1] is None:
        dims.pop()
    return P(*dims)


def _spec_for(path: str, leaf, mesh: Mesh, stacked_prefixes=("blocks.",)):
    stacked = any(path.startswith(p) for p in stacked_prefixes)
    shape = leaf.shape
    offset = 1 if stacked else 0          # leading 'layers' axis (pp)
    # int8-quantized serving trees (models/quant.py): 'kernel_q' shards
    # exactly like the 'kernel' it replaced; its per-out-channel 'scale'
    # ([L?, out]) is REPLICATED (pp-sliced on the stacked layers axis
    # only) — scales are tiny (<=0.4 MB/leaf at 5B) and a replicated
    # operand lets GSPMD slice locally for free, where a sharded one
    # measurably inserts reshard all-to-alls into the denoise loop
    # (tests/test_collectives.py::test_int8_denoise_collectives_fsdp_tp).
    lookup = path
    if path.endswith(".kernel_q"):
        lookup = path[: -len("_q")]
    elif path.endswith(".scale"):
        if any(re.match(pat, path[: -len(".scale")] + ".kernel")
               for pat, _ in _DIT_RULES):
            return _with_pp(P(), stacked, shape, mesh)
    for pat, axes in _DIT_RULES:
        if re.match(pat, lookup):
            dims = [None] * len(shape)
            for i, ax in enumerate(axes):
                di = offset + i
                if ax is None or di >= len(shape):
                    continue
                if shape[di] % mesh.shape.get(ax, 1) == 0 and mesh.shape.get(ax, 1) > 1:
                    dims[di] = ax
            while dims and dims[-1] is None:
                dims.pop()
            return _with_pp(P(*dims), stacked, shape, mesh)
    # default: fsdp-shard the largest divisible axis of big tensors
    if leaf.size >= 1 << 16:
        fs = mesh.shape.get("fsdp", 1)
        if fs > 1:
            order = sorted(range(offset, len(shape)),
                           key=lambda i: -shape[i])
            for i in order:
                if shape[i] % fs == 0:
                    dims = [None] * len(shape)
                    dims[i] = "fsdp"
                    while dims and dims[-1] is None:
                        dims.pop()
                    return _with_pp(P(*dims), stacked, shape, mesh)
    return _with_pp(P(), stacked, shape, mesh)


def dit_param_specs(params, mesh: Mesh) -> Dict:
    """Same-structure pytree of PartitionSpecs for a DiT param dict."""
    flat = flatten(params)
    return unflatten({k: _spec_for(k, v, mesh) for k, v in flat.items()})


def shard_pytree(params, mesh: Mesh, specs=None):
    """device_put every leaf with its NamedSharding."""
    if specs is None:
        specs = dit_param_specs(params, mesh)
    return jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs)


def activation_spec(kind: str) -> P:
    """Activation layout constraints.

    'tokens':  [B, S, D]   batch over dp(+fsdp), sequence over sp
    'video':   [B, C, F, H, W] batch over dp(+fsdp)
    'text':    [B, L, D]   batch over dp(+fsdp)
    """
    if kind == "tokens":
        return P(("dp", "fsdp"), "sp", None)
    if kind == "video":
        return P(("dp", "fsdp"), None, None, None, None)
    if kind == "text":
        return P(("dp", "fsdp"), None, None)
    raise ValueError(kind)


def constrain(x, mesh: Optional[Mesh], kind: str):
    """with_sharding_constraint if a mesh is active, else identity."""
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, activation_spec(kind)))


def constrain_like_params(tree, mesh: Optional[Mesh]):
    """Pin a param-structured pytree (gradients) to the parameter
    sharding rules. Without this, GSPMD must back-propagate the param
    specs through the whole backward graph; on small broadcast-shaped
    grads (a [1, D] bias cotangent summed over batch uses) it gives up
    with '[SPMD] Involuntary full rematerialization' — harmless at
    bias size, a silent perf cliff if it ever lands on an
    activation-sized tensor. The collective audit fails hard on that
    warning (collective_audit.assert_no_involuntary_remat), and this
    constraint is what keeps the train steps clean."""
    if mesh is None:
        return tree
    specs = dit_param_specs(tree, mesh)
    return jax.tree.map(
        lambda g, s: jax.lax.with_sharding_constraint(
            g, NamedSharding(mesh, s)), tree, specs)
