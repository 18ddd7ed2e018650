"""Parameter pytree utilities.

Models in this framework are pure functions over nested-dict parameter
pytrees. These helpers cover initialization, dtype casting, flattening to
'/'-joined names (for checkpoint IO and HF-weight mapping), and stacking
per-layer trees for ``lax.scan`` over transformer blocks.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np


Params = Dict[str, Any]


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class Meta:
    """Static (non-array) metadata stored inside a parameter pytree.

    Registered as a static pytree node so trees carrying structural tags
    (block kinds, factors) remain valid jit arguments: the tags become
    part of the treedef (hashed into the jit cache key), not leaves.
    """

    v: Any


def meta(v) -> Meta:
    return Meta(v)


def unmeta(x):
    return x.v if isinstance(x, Meta) else x


def flatten(params: Params, prefix: str = "") -> Dict[str, jax.Array]:
    out = {}
    for k, v in params.items():
        name = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(flatten(v, name + "."))
        else:
            out[name] = v
    return out


def unflatten(flat: Dict[str, jax.Array]) -> Params:
    out: Params = {}
    for name, v in flat.items():
        parts = name.split(".")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return out


def cast(params: Params, dtype) -> Params:
    return jax.tree.map(lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, params)


def stack_layers(layer_params: list) -> Params:
    """Stack a list of identical per-layer trees along a new leading axis.

    Enables ``lax.scan`` over transformer blocks: one compiled block body
    regardless of depth (compile-time win vs. the reference's Python loop
    over 30 modules).
    """
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *layer_params)


def unstack_layers(stacked: Params, num_layers: int) -> list:
    return [jax.tree.map(lambda x: x[i], stacked) for i in range(num_layers)]


def count_params(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def map_with_path(fn: Callable, params: Params) -> Params:
    """Apply fn(path_str, leaf) over the tree."""
    flat = flatten(params)
    return unflatten({k: fn(k, v) for k, v in flat.items()})
