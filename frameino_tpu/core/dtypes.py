"""Dtype policy for TPU execution.

Mirrors the reference's mixed-precision recipe (bf16 compute with fp32
normalization/AdaLN/time-embedding, see reference
``architecture/transformer_wan.py:393`` ``_keep_in_fp32_modules``) but
expressed as an explicit policy object instead of module-name string
matching.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    """Precision policy threaded through models.

    Attributes:
        compute: dtype for matmul/conv inputs (MXU-friendly bf16 on TPU).
        param: storage dtype of large weight matrices.
        norm: dtype in which LayerNorm/RMSNorm statistics and AdaLN
            modulation run. Always fp32 on TPU (VPU fp32 is cheap and the
            reference keeps these in fp32).
        accum: accumulation dtype for matmuls (``preferred_element_type``).
    """

    compute: jnp.dtype = jnp.bfloat16
    param: jnp.dtype = jnp.bfloat16
    norm: jnp.dtype = jnp.float32
    accum: jnp.dtype = jnp.float32

    def cast_compute(self, x):
        return x.astype(self.compute)

    def cast_norm(self, x):
        return x.astype(self.norm)


DEFAULT_POLICY = DTypePolicy()
# Full fp32 — used by golden-numerics tests on CPU.
FP32_POLICY = DTypePolicy(compute=jnp.float32, param=jnp.float32)
