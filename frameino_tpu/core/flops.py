"""Analytic FLOP counting that is correct under ``lax.scan``.

Why not ``compiled.cost_analysis()["flops"]``: XLA's cost analysis counts
a while-loop body ONCE, regardless of trip count. Every scanned structure
in this framework — the DiT block stack, denoise step loops, streaming
VAE chunk walkers — therefore gets undercounted by its trip count.
VERDICT r4 caught the symptom: the L=2 and L=4 train-step programs
differed by 6.5 GFLOP where two 3072-wide blocks are ~1.5e13 FLOPs.

This module walks the *jaxpr* instead: ``dot_general`` and
``conv_general_dilated`` FLOPs are computed from shapes, and ``scan``
bodies are multiplied by their trip count. The result is EXECUTED flops:
tracing a full train step (whose jaxpr contains the backward pass and
any remat recomputation explicitly) yields the hardware-FLOPs number
(HFU numerator); tracing just the loss forward and multiplying by 3
yields the conventional model-FLOPs number (MFU numerator, fwd + 2x bwd,
no recompute credit).

Known approximations (all second-order for this codebase):
  - ``while_loop`` trip counts are data-dependent; the body is counted
    once and the eqn is recorded in ``FlopReport.while_loops`` so the
    caller can see whether that matters (none of the benched programs
    use ``lax.while_loop`` on the hot path).
  - ``cond`` counts the most expensive branch.
  - Elementwise / reduction / gather flops are ignored: on TPU they are
    VPU/HBM-bound and conventionally excluded from MFU numerators.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import numpy as np


@dataclasses.dataclass
class FlopReport:
    flops: float = 0.0
    dot_flops: float = 0.0
    conv_flops: float = 0.0
    while_loops: int = 0  # bodies counted once (trip count unknown)

    def add(self, other: "FlopReport", times: float = 1.0):
        self.flops += other.flops * times
        self.dot_flops += other.dot_flops * times
        self.conv_flops += other.conv_flops * times
        self.while_loops += other.while_loops


def _dot_general_flops(eqn) -> float:
    lhs, _ = eqn.invars[0].aval, eqn.invars[1].aval
    out = eqn.outvars[0].aval
    (lhs_contract, _), _ = eqn.params["dimension_numbers"]
    k = math.prod(lhs.shape[d] for d in lhs_contract)
    return 2.0 * math.prod(out.shape) * k


def _conv_flops(eqn) -> float:
    lhs = eqn.invars[0].aval  # activations
    rhs = eqn.invars[1].aval  # kernel
    out = eqn.outvars[0].aval
    dn = eqn.params["dimension_numbers"]
    groups = eqn.params.get("feature_group_count", 1)
    batch_groups = eqn.params.get("batch_group_count", 1)
    kernel_spatial = math.prod(rhs.shape[d] for d in dn.rhs_spec[2:])
    in_ch = lhs.shape[dn.lhs_spec[1]] // max(groups, 1)
    return (2.0 * math.prod(out.shape) * kernel_spatial * in_ch
            / max(batch_groups, 1))


_CALL_JAXPR_PARAMS = ("jaxpr", "call_jaxpr", "fun_jaxpr")


def _subjaxprs(params) -> list:
    """All (jaxpr, multiplier) pairs reachable from an eqn's params,
    excluding the ones handled specially (scan/while/cond)."""
    out = []
    for name in _CALL_JAXPR_PARAMS:
        if name in params and params[name] is not None:
            out.append(params[name])
    return out


def _as_closed(j):
    if hasattr(j, "jaxpr"):
        return j
    from jax.extend import core as jex_core
    return jex_core.ClosedJaxpr(j, ())


def _count_jaxpr(jaxpr, report: FlopReport):
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "dot_general":
            f = _dot_general_flops(eqn)
            report.flops += f
            report.dot_flops += f
        elif prim == "conv_general_dilated":
            f = _conv_flops(eqn)
            report.flops += f
            report.conv_flops += f
        elif prim == "scan":
            sub = FlopReport()
            _count_jaxpr(eqn.params["jaxpr"].jaxpr, sub)
            report.add(sub, times=float(eqn.params["length"]))
        elif prim == "while":
            sub = FlopReport()
            _count_jaxpr(eqn.params["body_jaxpr"].jaxpr, sub)
            sub.while_loops += 1
            report.add(sub)
            cond_sub = FlopReport()
            _count_jaxpr(eqn.params["cond_jaxpr"].jaxpr, cond_sub)
            report.add(cond_sub)
        elif prim == "cond":
            branches = [FlopReport() for _ in eqn.params["branches"]]
            for br, r in zip(eqn.params["branches"], branches):
                _count_jaxpr(br.jaxpr, r)
            best = max(branches, key=lambda r: r.flops)
            report.add(best)
        elif prim == "pallas_call":
            # kernel body runs once per grid cell; a fori/while INSIDE
            # the kernel still gets counted once (flagged via
            # while_loops) — prefer tracing an XLA-attention variant
            # for exact counts on attention-heavy programs.
            sub = FlopReport()
            _count_jaxpr(_as_closed(eqn.params["jaxpr"]).jaxpr, sub)
            grid = getattr(eqn.params.get("grid_mapping"), "grid", ()) or ()
            report.add(sub, times=float(math.prod(grid) or 1))
        else:
            for sub_jaxpr in _subjaxprs(eqn.params):
                _count_jaxpr(_as_closed(sub_jaxpr).jaxpr, report)


def count_flops(fn, *args, **kwargs) -> FlopReport:
    """Trace ``fn(*args, **kwargs)`` abstractly and return executed
    matmul+conv FLOPs with scan bodies multiplied by trip count.

    ``fn`` may be jitted (the pjit call is recursed into). Tracing is
    abstract — no device computation happens.
    """
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    report = FlopReport()
    _count_jaxpr(closed.jaxpr, report)
    return report


def device_peak_flops(dtype_bits: int = 16) -> float:
    """Peak FLOP/s of the attached device generation (best effort)."""
    kind = jax.local_devices()[0].device_kind.lower()
    # v5e ("v5 lite"): 197 TFLOP/s bf16, 394 TOP/s int8
    table_bf16 = {
        "v5 lite": 197e12, "v5litepod": 197e12, "v5e": 197e12,
        "v4": 275e12, "v5p": 459e12, "v6 lite": 918e12, "v6e": 918e12,
    }
    for k, v in table_bf16.items():
        if k in kind:
            return v * (16.0 / dtype_bits if dtype_bits < 16 else 1.0)
    return 197e12
