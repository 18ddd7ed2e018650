#!/usr/bin/env python
"""Print the HLO collective inventory of the sharded train/denoise
programs on a virtual 8-device CPU mesh (the DEPLOYMENT.md scaling
table; asserted invariants live in ``tests/test_collectives.py``).

Usage: python scripts/audit_collectives.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from frameino_tpu.core.meshes import MeshConfig  # noqa: E402
from frameino_tpu.parallel.collective_audit import (audit_collectives,  # noqa: E402
                                                    format_table)
from tests.test_collectives import (_compile_denoise,  # noqa: E402
                                    _compile_train_step)


def main():
    for mcfg in (MeshConfig(dp=2, fsdp=2, tp=2, sp=1),
                 MeshConfig(dp=2, fsdp=2, tp=1, sp=2),
                 MeshConfig(dp=8, fsdp=1, tp=1, sp=1),
                 MeshConfig(dp=2, fsdp=1, tp=2, sp=1, pp=2)):
        compiled, pb, _ = _compile_train_step(mcfg)
        print(format_table(
            f"train step dp{mcfg.dp}/fsdp{mcfg.fsdp}/tp{mcfg.tp}"
            f"/sp{mcfg.sp}/pp{mcfg.pp} (params {pb / 1e6:.2f} MB)",
            audit_collectives(compiled)))
    for method in ("allgather", "ring"):
        compiled = _compile_denoise(
            MeshConfig(dp=1, fsdp=1, tp=2, sp=4), method)
        print(format_table(f"denoise tp2/sp4 ({method})",
                           audit_collectives(compiled)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
