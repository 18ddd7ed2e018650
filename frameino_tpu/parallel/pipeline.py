"""Pipeline parallelism (pp mesh axis): GPipe over scan-stacked blocks.

The reference has no pipeline parallelism (single-node DDP only,
SURVEY §2.8) — fsdp/tp over ICI cover a v5e/v5p slice, and they are the
preferred layouts there (DEPLOYMENT.md). pp exists for the topology the
other axes cannot serve: multi-slice deployments where stages map to
slices and only activation microbatches cross the slow DCN links,
instead of fsdp's per-step parameter all-gathers.

Design (TPU-native, not a port of any torch pipeline engine):

- Blocks are already stacked on a leading ``layers`` axis for
  ``lax.scan`` (``models/wan_dit.py``); a stage is simply that axis
  reshaped ``[L, ...] -> [pp, L/pp, ...]`` and sharded over the ``pp``
  mesh axis — no per-stage parameter pytrees, no stage modules.
- The schedule is GPipe fill-drain expressed as ONE ``lax.scan`` over
  ``M + pp - 1`` ticks inside a *partial-manual* ``jax.shard_map``
  (manual over ``pp`` only): every tick each stage applies its block
  slice to the activation it holds and ``ppermute``s the result to the
  next stage. Stage 0 feeds microbatch ``t``; stage ``pp-1`` banks
  microbatch ``t - (pp-1)``. dp/fsdp/tp stay *auto*, so GSPMD keeps
  sharding the within-stage matmuls — the pipeline composes with the
  existing rules instead of re-implementing their collectives.
- Differentiation needs no bespoke backward schedule: the transpose of
  ``ppermute`` is the reversed permutation, so ``jax.grad`` of the
  forward scan IS the reverse (drain-fill) pipeline.

Bubble fraction is the usual ``(pp-1)/(M+pp-1)``; pick
``microbatches >= 4*pp`` in production. Idle ticks compute on zeros
(predication by skipping would save nothing under jit's static
schedule).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

Pytree = Any


def _shard_map_partial(f, mesh, in_specs, out_specs):
    """jax.shard_map manual over 'pp' only (jax>=0.8 API)."""
    return jax.shard_map(f, mesh=mesh, axis_names={"pp"},
                         in_specs=in_specs, out_specs=out_specs,
                         check_vma=False)


def stage_params(stacked: Pytree, pp: int) -> Pytree:
    """[L, ...] leaves -> [pp, L/pp, ...] (the per-stage block slices)."""

    def reshape(leaf):
        L = leaf.shape[0]
        if L % pp:
            raise ValueError(f"num_layers {L} not divisible by pp={pp}")
        return leaf.reshape(pp, L // pp, *leaf.shape[1:])

    return jax.tree.map(reshape, stacked)


def _microbatch(tree: Pytree, m: int) -> Pytree:
    """[B, ...] leaves -> [M, B/M, ...]."""

    def reshape(leaf):
        B = leaf.shape[0]
        if B % m:
            raise ValueError(f"batch {B} not divisible by microbatches={m}")
        return leaf.reshape(m, B // m, *leaf.shape[1:])

    return jax.tree.map(reshape, tree)


def _take(tree: Pytree, i) -> Pytree:
    return jax.tree.map(
        lambda a: jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False),
        tree)


def pipeline_blocks(mesh, stacked: Pytree, x: Pytree, aux_batch: Pytree,
                    aux_shared: Pytree,
                    block_fn: Callable[[Pytree, Pytree, Pytree, Pytree],
                                       Pytree],
                    *,
                    microbatches: Optional[int] = None,
                    remat: bool = False) -> Pytree:
    """Run the stacked block sweep as a GPipe pipeline over mesh axis 'pp'.

    stacked:    block params, leaves [num_layers, ...] (lax.scan layout).
    x:          activation pytree, leaves [B, ...]; returned updated.
    aux_batch:  per-example side inputs consumed by every block (text
                context, timestep modulation) — leaves [B, ...],
                microbatched alongside x.
    aux_shared: batch-independent side inputs (RoPE tables) — replicated.
    block_fn(layer_params, x, aux_mb, aux_shared) -> x applies ONE block.

    microbatches defaults to pp (minimum that keeps every stage busy in
    steady state). B must divide by it; num_layers by pp.
    """
    pp = mesh.shape.get("pp", 1)
    if pp <= 1:
        raise ValueError("pipeline_blocks requires a mesh with pp > 1")
    M = microbatches or pp
    staged = stage_params(stacked, pp)
    x_mb = _microbatch(x, M)
    aux_mb = _microbatch(aux_batch, M)

    def layer_sweep(params_lpp, h, aux, shared):
        """Apply this stage's L/pp layers (inner lax.scan)."""

        def body(carry, layer_params):
            return block_fn(layer_params, carry, aux, shared), None

        if remat:
            body = jax.checkpoint(body, prevent_cse=False)
        h, _ = jax.lax.scan(body, h, params_lpp)
        return h

    def per_shard(staged, x_mb, aux_mb, shared):
        # staged leaves arrive as [1, L/pp, ...]: drop the sharded dim
        mine = jax.tree.map(lambda a: a[0], staged)
        idx = jax.lax.axis_index("pp")
        zero_state = jax.tree.map(lambda a: jnp.zeros_like(a[0]), x_mb)
        outs0 = jax.tree.map(jnp.zeros_like, x_mb)
        fwd = [(i, i + 1) for i in range(pp - 1)]

        def tick(carry, t):
            state, outs = carry
            # stage s works on microbatch (t - s); clip keeps the
            # gather in-bounds on bubble ticks (results are discarded)
            mb_i = jnp.clip(t - idx, 0, M - 1)
            feed = _take(x_mb, mb_i)
            inp = jax.tree.map(
                lambda f, s: jnp.where(idx == 0, f, s), feed, state)
            out = layer_sweep(mine, inp, _take(aux_mb, mb_i), shared)
            # last stage banks its finished microbatch
            done_i = jnp.clip(t - (pp - 1), 0, M - 1)
            collect = (idx == pp - 1) & (t >= pp - 1)

            def bank(acc, o):
                cur = jax.lax.dynamic_index_in_dim(acc, done_i, 0,
                                                   keepdims=False)
                return jax.lax.dynamic_update_index_in_dim(
                    acc, jnp.where(collect, o, cur), done_i, 0)

            outs = jax.tree.map(bank, outs, out)
            # hand the activation to the next stage (stage 0 receives
            # zeros; it feeds from x_mb anyway)
            nxt = jax.tree.map(
                lambda o: jax.lax.ppermute(o, "pp", fwd), out)
            return (nxt, outs), None

        (_, outs), _ = jax.lax.scan(tick, (zero_state, outs0),
                                    jnp.arange(M + pp - 1))
        return outs

    out_mb = _shard_map_partial(
        per_shard, mesh,
        in_specs=(jax.tree.map(lambda _: P("pp"), staged),
                  jax.tree.map(lambda _: P(), x_mb),
                  jax.tree.map(lambda _: P(), aux_mb),
                  jax.tree.map(lambda _: P(), aux_shared)),
        # every stage returns its outs buffer; only the last stage's is
        # real. P('pp') stacks them [pp*M, ...] sharded over pp, and the
        # slice below reads the last stage's shard — no collective.
        out_specs=jax.tree.map(lambda _: P("pp"), x_mb),
    )(staged, x_mb, aux_mb, aux_shared)

    def unstack(leaf, ref):
        last = jax.lax.slice_in_dim(leaf, (pp - 1) * M, pp * M, axis=0)
        return last.reshape(ref.shape)

    return jax.tree.map(unstack, out_mb, x)


def supports_pp(mesh, num_layers: int, batch: int,
                microbatches: Optional[int] = None) -> bool:
    """True iff the pp pipeline's divisibility constraints hold."""
    if mesh is None:
        return False
    pp = mesh.shape.get("pp", 1)
    if pp <= 1:
        return False
    M = microbatches or pp
    return num_layers % pp == 0 and batch % M == 0
