"""Explicit-collective sharded embedding lookup/update (shard_map).

The engine's default path annotates tables with a `NamedSharding` and
lets GSPMD derive the cross-shard routing for its gathers and
scatter-adds (`recommenders_tpu.embedding.engine`). This module is the
hand-scheduled equivalent — the role of the SparseCore engine's internal
id all-to-all (`tensorflow_recommenders/layers/embedding/
tpu_embedding_layer.py:808,835`, where ids leave the host and the C++
engine routes them between chips):

  lookup:  every table shard sees the batch's ids (replicated over the
           table axis), gathers the rows it owns (out-of-range ids drop
           to zero), and a `psum` over the table axis assembles full
           embeddings — one collective, size `[batch, dim]`.
  update:  gradient rows are produced data-sharded; an `all_gather`
           over the data axis gives each table shard every (id, grad)
           pair, and each shard scatter-adds only the rows it owns — one
           collective, size `[batch, dim]`, no gradient allreduce over
           the vocabulary.

With static shapes a true ragged all-to-all (send each id only to its
owner) cannot be expressed without per-shard count padding; the
replicate+mask pattern above moves the same `[batch, dim]` bytes over
ICI as the ideal exchange's worst case and is what GSPMD itself emits
for sharded gathers. Having it explicit (a) documents the comm pattern,
(b) pins it against GSPMD regressions, and (c) gives a baseline to
benchmark the compiler against (`benchmarks/id_exchange.py`).

Functions take the table already sharded `P(table_axis, None)` and ids
sharded `P(data_axis)`; results come back data-sharded.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from recommenders_tpu.parallel import mesh as mesh_lib

Array = jax.Array


def _owned_gather(table_shard: Array, ids: Array, axis_name: str) -> Array:
    """Gathers rows this shard owns; other shards' rows read as zero."""
    rows_per_shard = table_shard.shape[0]
    base = jax.lax.axis_index(axis_name) * rows_per_shard
    local = ids - base
    safe = jnp.clip(local, 0, rows_per_shard - 1)
    rows = jnp.take(table_shard, safe, axis=0)
    owned = (local >= 0) & (local < rows_per_shard) & (ids >= 0)
    return jnp.where(owned[:, None], rows, 0.0)


def sharded_lookup(
    table: Array,
    ids: Array,
    mesh: Mesh,
    table_axis: str = mesh_lib.MODEL_AXIS,
    data_axis: str = mesh_lib.DATA_AXIS,
) -> Array:
    """`[B] ids → [B, dim]` rows from a row-sharded table.

    Negative ids (padding) return zero rows.
    """

    def fn(table_shard, local_ids):
        rows = _owned_gather(table_shard, local_ids, table_axis)
        return jax.lax.psum(rows, table_axis)

    return jax.jit(
        jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(P(table_axis, None), P(data_axis)),
            out_specs=P(data_axis, None),
            check_vma=False,
        )
    )(table, ids)


def sharded_scatter_add(
    table: Array,
    ids: Array,
    grads: Array,
    mesh: Mesh,
    table_axis: str = mesh_lib.MODEL_AXIS,
    data_axis: str = mesh_lib.DATA_AXIS,
    scale: float = 1.0,
) -> Array:
    """Scatter-adds `scale * grads[i]` into row `ids[i]` of the sharded
    table (the SGD-flavored update; richer optimizers compose the same
    exchange with their slot math). Negative ids are dropped.
    """

    def fn(table_shard, local_ids, local_grads):
        # Each table shard needs every (id, grad) pair: one all_gather
        # over the data axis (the explicit id/gradient exchange).
        all_ids = jax.lax.all_gather(
            local_ids, data_axis, axis=0, tiled=True
        )
        all_grads = jax.lax.all_gather(
            local_grads, data_axis, axis=0, tiled=True
        )
        rows_per_shard = table_shard.shape[0]
        base = jax.lax.axis_index(table_axis) * rows_per_shard
        local = all_ids - base
        owned = (
            (local >= 0) & (local < rows_per_shard) & (all_ids >= 0)
        )
        # Disowned rows route out of range and drop in the scatter.
        target = jnp.where(owned, local, rows_per_shard)
        return table_shard.at[target].add(
            scale * all_grads, mode="drop"
        )

    return jax.jit(
        jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(P(table_axis, None), P(data_axis), P(data_axis, None)),
            out_specs=P(table_axis, None),
            check_vma=False,
        )
    )(table, ids, grads)


@functools.partial(
    jax.jit, static_argnames=("mesh", "table_axis", "data_axis")
)
def gspmd_lookup(
    table: Array,
    ids: Array,
    mesh: Mesh,
    table_axis: str = mesh_lib.MODEL_AXIS,
    data_axis: str = mesh_lib.DATA_AXIS,
) -> Array:
    """Compiler-scheduled baseline: plain gather on sharded operands."""
    safe = jnp.maximum(ids, 0)
    rows = jnp.take(table, safe, axis=0)
    return jnp.where((ids >= 0)[:, None], rows, 0.0)
