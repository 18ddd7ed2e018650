"""Multi-host (multi-process) runtime: initialization + input plumbing.

The reference's distributed story is single-node DDP (SURVEY §2.8;
``/root/reference/config/accelerate_config_4GPU.json`` — one machine,
4 processes, NCCL). On TPU pods the equivalent is one process per host
wired into a single global device mesh by ``jax.distributed``: every
jitted step is then SPMD over *all* hosts' devices, and each host
contributes its local slice of the global input batch.

These helpers encapsulate the three host-side obligations:

- ``initialize``: platform-safe ``jax.distributed.initialize``. On real
  TPU pods this is one call per host before any backend initializes; in
  this repo's test environment it also supports a multi-PROCESS CPU
  topology (gloo collectives), which is how the recipe is validated by
  an actual 2-process run (``tests/test_multihost.py``) rather than a
  single-process virtual mesh.
- ``global_batch``: per-host numpy batches -> global jax.Arrays laid
  out for a (dp-outer) mesh via
  ``jax.make_array_from_process_local_data``.
- ``assert_same_across_processes``: cheap collective check that a
  host-computed scalar (e.g. the loss fetched for logging) agrees
  everywhere — a first-line corruption/divergence detector.

The mesh itself comes from ``core.meshes.make_mesh`` unchanged:
``jax.devices()`` orders devices process-major, and ``make_mesh``
reshapes (pp, dp, fsdp, ...) outermost-first, so with
``pp * dp % num_processes == 0`` the cross-host axes are exactly
pp/dp — gradient all-reduce is the only cross-host collective, as
DEPLOYMENT.md's multi-host section prescribes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np


def initialize(coordinator_address: str, num_processes: int,
               process_id: int, *, platform: Optional[str] = None) -> None:
    """``jax.distributed.initialize`` with the platform pinned FIRST.

    ``platform`` must be set before any backend initializes (site
    customizations may pre-pin a TPU plugin platform — observed with the
    tunneled-TPU ``axon`` plugin, which otherwise captures the backend
    even when ``JAX_PLATFORMS=cpu`` is exported). ``platform="cpu"``
    additionally selects gloo CPU collectives so cross-process
    collectives actually execute (the default CPU client is
    single-process only).
    """
    if platform is not None:
        jax.config.update("jax_platforms", platform)
        if platform == "cpu":
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_batch(mesh, local_batch: Dict[str, Any],
                 global_batch_size: int,
                 batch_axes=("dp", "fsdp")) -> Dict[str, Any]:
    """Assemble per-process local numpy batches into global jax.Arrays.

    Every leaf's dim 0 is the batch dim, sharded over ``batch_axes``
    (the trainer's batch layout, ``parallel/sharding.py``); all other
    dims replicate. Each process passes its own ``local_batch`` with
    ``global_batch_size // num_processes`` examples (the mesh's dp axis
    must be process-major, which ``make_mesh`` guarantees).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def leaf(x):
        if x is None:
            return None
        x = np.asarray(x)
        sharding = NamedSharding(mesh, P(batch_axes, *([None] * (x.ndim - 1))))
        return jax.make_array_from_process_local_data(
            sharding, x, (global_batch_size,) + x.shape[1:])

    return jax.tree.map(leaf, local_batch,
                        is_leaf=lambda v: v is None or isinstance(
                            v, (np.ndarray, jax.Array)))


def assert_same_across_processes(mesh, value: float,
                                 atol: float = 0.0) -> None:
    """Raise if a host-side scalar differs across processes.

    Runs a tiny all-gather of the scalar over the whole mesh and
    compares on every host — catches desynchronized RNG/data bugs that
    SPMD silently tolerates until checkpoints diverge.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = tuple(mesh.axis_names)
    local = np.full((jax.local_device_count(),), value, np.float32)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(axis)), local,
        (jax.device_count(),))
    gathered = np.asarray(
        jax.jit(lambda a: a, out_shardings=NamedSharding(mesh, P()))(arr))
    if not np.allclose(gathered, gathered[0], atol=atol):
        raise AssertionError(
            f"cross-process divergence: {gathered.tolist()}")
