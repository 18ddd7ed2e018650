"""Optimized-HLO op audit: verify a compiled step contains exactly the
expected compute ops (int8-path device-op trace, VERDICT r2 weak #2
follow-through).

The int8 serving claim rests on every quantized matmul actually hitting
the MXU's s8 x s8 -> s32 path — a silent fallback (XLA converting the
int8 kernel back to float, or an algebraic rewrite inserting an fp dot)
would still be numerically correct while forfeiting the 2x throughput.
``audit_matmuls`` parses a compiled executable's HLO text (TPU or CPU)
and inventories every dot/convolution with RESOLVED operand dtypes
(operands are resolved through the instruction-definition map, since
fusion bodies print bare operand names); ``audit_custom_calls`` lists
custom-call targets (the Pallas kernels must be the only ones on the
denoise path). ``scripts/audit_int8_step.py`` runs the audit on the
real bench step; ``tests/test_quant.py`` asserts the invariants on a
tiny model in CI.

No reference counterpart: the reference never verifies what its CUDA
graphs execute (SURVEY §5); this is TPU-native observability.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, List, Optional, Sequence, Tuple

# `  %name = s32[4,128]{1,0:T(4,128)} convolution(%a, %b), ...`
# also tuple-typed defs: `%x = (f32[2], u32[]) all-gather-start(...)`
_DEF_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%([\w.\-]+)\s*=\s*\(?\s*([a-z0-9]+)\[([0-9,]*)\]")

_OPCODE_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%[\w.\-]+\s*=\s*\(?[a-z0-9]+\[[0-9,]*\][^\s]*\s*"
    r"(?:,[^)]*\))?\s*([\w\-]+)\(")

_OPERANDS_RE = re.compile(r"%([\w.\-]+)")

_OP_NAME_RE = re.compile(r'op_name="([^"]*)"')

_TARGET_RE = re.compile(r'custom_call_target="([^"]*)"')


@dataclasses.dataclass
class MatmulOp:
    name: str
    opcode: str                       # "dot" | "convolution"
    out_dtype: str
    out_shape: Tuple[int, ...]
    operand_dtypes: Tuple[Optional[str], ...]
    op_name: str                      # jax-level metadata (source op)

    @property
    def dtype_sig(self) -> str:
        ops = "x".join(d or "?" for d in self.operand_dtypes)
        return f"{ops}->{self.out_dtype}"


@dataclasses.dataclass
class CustomCall:
    name: str
    target: str
    out_dtype: str


def _shape(s: str) -> Tuple[int, ...]:
    return tuple(int(x) for x in s.split(",")) if s else ()


def _definitions(hlo_text: str) -> Dict[str, Tuple[str, Tuple[int, ...]]]:
    """Instruction name -> (dtype, shape) over ALL computations (entry,
    fusion bodies, while bodies) so operands resolve anywhere."""
    defs: Dict[str, Tuple[str, Tuple[int, ...]]] = {}
    for line in hlo_text.splitlines():
        m = _DEF_RE.match(line)
        if m:
            defs[m.group(1)] = (m.group(2), _shape(m.group(3)))
    return defs


def audit_matmuls(hlo_text: str) -> List[MatmulOp]:
    """Every dot/convolution in the executable, with operand dtypes
    resolved through the definition map."""
    defs = _definitions(hlo_text)
    out: List[MatmulOp] = []
    for line in hlo_text.splitlines():
        mo = _OPCODE_RE.match(line)
        if not mo or mo.group(1) not in ("dot", "convolution"):
            continue
        md = _DEF_RE.match(line)
        if not md:
            continue
        # operands: names inside the opcode's parentheses (first %name is
        # the def itself, so split at the opcode call)
        call = line.split(mo.group(1) + "(", 1)[1]
        call = call.split(")", 1)[0]
        operands = _OPERANDS_RE.findall(call)
        m = _OP_NAME_RE.search(line)
        op_name = m.group(1) if m else ""
        out.append(MatmulOp(
            name=md.group(1), opcode=mo.group(1), out_dtype=md.group(2),
            out_shape=_shape(md.group(3)),
            operand_dtypes=tuple(defs.get(o, (None,))[0] for o in operands),
            op_name=op_name))
    return out


def audit_custom_calls(hlo_text: str) -> List[CustomCall]:
    out: List[CustomCall] = []
    for line in hlo_text.splitlines():
        mo = _OPCODE_RE.match(line)
        if not mo or mo.group(1) != "custom-call":
            continue
        md = _DEF_RE.match(line)
        tg = _TARGET_RE.search(line)
        out.append(CustomCall(name=md.group(1) if md else "?",
                              target=tg.group(1) if tg else "?",
                              out_dtype=md.group(2) if md else "?"))
    return out


def summarize(mms: Sequence[MatmulOp]) -> Dict[str, int]:
    """dtype-signature -> count (e.g. {"s8xs8->s32": 10,
    "bf16xbf16->f32": 4})."""
    counts: Dict[str, int] = {}
    for m in mms:
        counts[m.dtype_sig] = counts.get(m.dtype_sig, 0) + 1
    return counts


def assert_int8_step(hlo_text: str, n_quantized_kernels: int,
                     allow_float_sigs: Sequence[str] = (
                         "bf16xbf16->f32", "bf16xbf16->bf16",
                         "f32xf32->f32")) -> Dict[str, int]:
    """The int8-path invariants:

    1. exactly ``n_quantized_kernels`` matmuls run s8 x s8 -> s32 (the
       scan-stacked block body appears once in the HLO, so one stacked
       kernel leaf == one loop-body matmul);
    2. every remaining matmul uses an allowed float signature — no
       unresolved-operand dots, no f32 dot that could be a dequantized
       kernel sneaking back in.

    Returns the signature counts for logging.
    """
    mms = audit_matmuls(hlo_text)
    counts = summarize(mms)
    n_int8 = counts.get("s8xs8->s32", 0)
    if n_int8 != n_quantized_kernels:
        raise AssertionError(
            f"expected {n_quantized_kernels} s8xs8->s32 matmuls, found "
            f"{n_int8}; full inventory: {counts}")
    bad = [m for m in mms
           if m.dtype_sig != "s8xs8->s32"
           and m.dtype_sig not in allow_float_sigs]
    if bad:
        raise AssertionError(
            "unexpected matmul signatures on the int8 step: "
            + ", ".join(f"{m.name}:{m.dtype_sig}@{m.op_name}"
                        for m in bad[:8]))
    return counts
