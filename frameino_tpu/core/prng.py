"""PRNG stream management.

Deterministic, shard-aware key derivation. Replaces the reference's
``torch.Generator`` seeding and the rank-dependent behavior of
``architecture/noise_sampler.py`` (rank-stratified timestep sampling) with
``jax.random.fold_in`` streams keyed by (seed, purpose, step, shard).
"""

from __future__ import annotations

import hashlib

import jax
import jax.numpy as jnp


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def _tag_to_int(tag: str) -> int:
    return int.from_bytes(hashlib.blake2s(tag.encode(), digest_size=4).digest(), "little")


def named_key(key: jax.Array, tag: str) -> jax.Array:
    """Derive a stream for a named purpose ('noise', 'timestep', 'dropout')."""
    return jax.random.fold_in(key, _tag_to_int(tag))


def step_key(key: jax.Array, step) -> jax.Array:
    return jax.random.fold_in(key, step)


def shard_key(key: jax.Array, axis_name: str = "dp") -> jax.Array:
    """Per-shard stream inside shard_map/pjit (for stratified sampling)."""
    return jax.random.fold_in(key, jax.lax.axis_index(axis_name))
