"""Rank-stratified timestep sampling, jit-friendly global form.

Reference ``architecture/noise_sampler.py`` (DiscreteSampling,
uniform_sampling=True): with W ranks, pick the largest group count G
dividing W with num_idx % G == 0; rank r samples uniformly from stratum
``r // (W/G)`` of the timestep index range, so one global batch covers
the schedule uniformly.

Under pjit the program is written globally, so the per-rank behavior is
re-expressed per *example*: global example b sits on rank
``b // (B_global / W)``, giving a pure function of batch position —
deterministic, shard-independent, and identical in distribution to the
reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _group_num(world_size: int, num_idx: int) -> int:
    i = 1
    while True:
        if world_size % i != 0 or num_idx % (world_size // i) != 0:
            i += 1
        else:
            return world_size // i


def stratified_timestep_indices(key: jax.Array, batch_size: int,
                                num_idx: int = 1000,
                                world_size: int = 1) -> jax.Array:
    """[batch_size] int32 timestep indices in [0, num_idx).

    batch_size is the GLOBAL batch; world_size the dp shard count.
    """
    if world_size <= 1:
        return jax.random.randint(key, (batch_size,), 0, num_idx)
    g = _group_num(world_size, num_idx)
    group_width = world_size // g
    interval = num_idx // g
    per_rank = max(batch_size // world_size, 1)
    b = jnp.arange(batch_size)
    rank = b // per_rank
    stratum = jnp.minimum(rank // group_width, g - 1)
    lo = stratum * interval
    u = jax.random.randint(key, (batch_size,), 0, interval)
    return (lo + u).astype(jnp.int32)
