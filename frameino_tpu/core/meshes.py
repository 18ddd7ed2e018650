"""Device mesh + sharding rules.

The reference's distributed story is single-node DDP over NCCL
(reference ``config/accelerate_config_4GPU.json``, ``train_code/
train_wan_motion_FrameINO.py:733-741``). The TPU-native equivalent is a
``jax.sharding.Mesh`` with named axes and XLA collectives over ICI:

    dp    data parallel (batch axis; gradient psum rides ICI)
    fsdp  parameter/optimizer-state sharding (ZeRO-3 analogue)
    tp    tensor parallel (attention heads / FFN hidden)
    sp    sequence parallel over video tokens (the reference has none —
          SURVEY §5 "long-context: none" — this is TPU headroom)
    pp    pipeline parallel over the stacked block axis (GPipe via
          shard_map + ppermute, ``parallel/pipeline.py``) — for
          multi-slice topologies where only activation microbatches
          should cross DCN

Models never name devices directly; parameters carry *logical* axis names
and ``logical_to_mesh_spec`` maps them onto mesh axes via rule tables.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    dp: int = 1
    fsdp: int = 1
    tp: int = 1
    sp: int = 1
    pp: int = 1

    @property
    def size(self) -> int:
        return self.dp * self.fsdp * self.tp * self.sp * self.pp


AXIS_NAMES = ("dp", "fsdp", "tp", "sp", "pp")


def make_mesh(cfg: Optional[MeshConfig] = None, devices=None) -> Mesh:
    """Build a 4-axis mesh. Defaults to pure data-parallel over all devices."""
    devices = list(devices if devices is not None else jax.devices())
    if cfg is None:
        cfg = MeshConfig(dp=len(devices))
    if cfg.size != len(devices):
        raise ValueError(
            f"mesh {cfg} needs {cfg.size} devices, got {len(devices)}"
        )
    # pp leads: stages map to the outermost (slice/DCN) dimension of a
    # multi-slice topology; the other axes stay intra-slice on ICI
    arr = np.array(devices).reshape(cfg.pp, cfg.dp, cfg.fsdp, cfg.tp,
                                    cfg.sp)
    arr = np.moveaxis(arr, 0, -1)
    return Mesh(arr, AXIS_NAMES)


# Logical-axis → mesh-axis rules for DiT models.
#
# Logical names used by the models:
#   batch     per-example batch dim
#   seq       video-token sequence dim (activations)
#   embed     model width (hidden size)
#   heads     attention heads dim of qkv/out projections
#   mlp       FFN hidden dim
#   vocab/text unsharded small dims
#   layers    stacked-block leading axis (never sharded)
DIT_LOGICAL_RULES: tuple = (
    ("batch", ("dp", "fsdp")),
    ("seq", "sp"),
    ("embed", None),
    ("heads", "tp"),
    ("mlp", "tp"),
    ("kv", None),
    ("layers", None),
    ("text", None),
    ("conv_in", None),
    ("conv_out", None),
)


def logical_to_mesh_spec(logical_axes: Sequence[Optional[str]],
                         rules=DIT_LOGICAL_RULES) -> P:
    """Map a tuple of logical axis names to a PartitionSpec via rules."""
    table = dict(rules)
    out = []
    for name in logical_axes:
        if name is None:
            out.append(None)
        else:
            out.append(table.get(name))
    # Trim trailing Nones (canonical PartitionSpec form).
    while out and out[-1] is None:
        out.pop()
    return P(*out)


def shard_params(params, logical_axes_tree, mesh: Mesh,
                 rules=DIT_LOGICAL_RULES):
    """Device-put a param pytree with shardings derived from logical axes.

    ``logical_axes_tree`` mirrors ``params`` with tuples of logical axis
    names (or None for replicated) at the leaves.
    """
    def place(p, axes):
        if axes is None:
            spec = P()
        else:
            spec = logical_to_mesh_spec(axes, rules)
        return jax.device_put(p, NamedSharding(mesh, spec))

    return jax.tree.map(place, params, logical_axes_tree,
                        is_leaf=lambda x: x is None)
