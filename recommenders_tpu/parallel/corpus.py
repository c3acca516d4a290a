"""Distributed corpus scoring: shard the candidate corpus across the mesh.

The reference's "long axis" is the candidate corpus, scanned on a single
host through tf.data (`tensorflow_recommenders/layers/factorized_top_k.py:
404-509`). The TPU-native scaling story (SURVEY.md §5) shards the corpus
rows across a mesh axis instead: every chip scores queries against its
local shard (one MXU matmul), takes a local top-k, and the global result
is an `all_gather(k)` over ICI followed by a re-top-k — a distributed
top-k reduction with `k·devices` traffic instead of corpus-sized traffic.

`ShardedBruteForce` wraps this as a `TopK` index layer, so corpus-level
evaluation (`metrics.FactorizedTopK`) and serving run unchanged on a
sharded corpus. On a 1-device mesh it degrades to plain brute force.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from recommenders_tpu.layers import factorized_top_k as layers_ftk
from recommenders_tpu.ops import topk as topk_ops
from recommenders_tpu.parallel import mesh as mesh_lib

Array = jax.Array

MIN_FLOAT = topk_ops.MIN_FLOAT


def make_sharded_top_k(
    mesh: Mesh, axis: str, k: int
) -> Callable[[Array, Array, Array, Array], Tuple[Array, Array]]:
    """Builds a jitted `(queries, candidates, identifiers, valid) →
    ([q, k] scores, [q, k] ids)` over a corpus sharded along `axis`.

    Queries are replicated; candidates/identifiers/valid are row-sharded.
    Inside each shard: exact local scores → local top-k; across shards:
    `all_gather` of the k-sized partials over ICI → re-top-k.
    """

    def local_query(queries, candidates, identifiers, valid):
        scores = (queries @ candidates.T).astype(jnp.float32)
        scores = jnp.where(valid[None, :], scores, MIN_FLOAT)
        ids2d = jnp.broadcast_to(identifiers[None, :], scores.shape)
        return topk_ops.distributed_top_k(scores, ids2d, k, axis)

    sharded = jax.shard_map(
        local_query,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
        # Outputs ARE replicated (the all_gather + re-top-k is identical on
        # every shard), but the static checker can't prove it.
        check_vma=False,
    )
    return jax.jit(sharded)


class ShardedBruteForce(layers_ftk.TopK):
    """Exact brute-force retrieval over a mesh-sharded corpus.

    Same contract as `BruteForce`, but `index` distributes the corpus rows
    across `mesh[axis]` and queries run SPMD. Use for corpora too large
    for one chip's HBM, or to parallelize evaluation across a slice.

    Attributes:
      mesh: Device mesh; defaults to all devices on one axis.
      axis: Mesh axis name sharding the corpus rows.
      query_fn: Optional query-embedding function.
    """

    def __init__(
        self,
        query_fn: Optional[Callable[[Array], Array]] = None,
        k: int = 10,
        mesh: Optional[Mesh] = None,
        axis: str = mesh_lib.MODEL_AXIS,
    ) -> None:
        super().__init__(k=k)
        self.query_fn = query_fn
        if mesh is None:
            mesh = mesh_lib.create_mesh(
                shape=(jax.device_count(),), axis_names=(axis,)
            )
        self._mesh = mesh
        self._axis = axis
        self._candidates = None
        self._fns = {}

    def index(
        self,
        candidates: Array,
        identifiers: Optional[Array] = None,
    ) -> "ShardedBruteForce":
        candidates = jnp.asarray(candidates)
        if candidates.ndim != 2:
            raise ValueError(
                f"The candidates tensor must be 2D (got {candidates.shape})."
            )
        self._num_candidates = candidates.shape[0]
        identifiers = self._intern_identifiers(
            identifiers, self._num_candidates
        )
        axis_size = self._mesh.shape[self._axis]
        # Pad so every shard gets the same (lane-aligned) row count.
        multiple = axis_size * 128
        candidates, identifiers, valid = topk_ops.pad_corpus(
            candidates, identifiers, multiple
        )
        row_sharding = NamedSharding(self._mesh, P(self._axis))
        self._candidates = jax.device_put(candidates, row_sharding)
        self._identifiers = jax.device_put(identifiers, row_sharding)
        self._valid = jax.device_put(valid, row_sharding)
        self._fns = {}
        return self

    def __call__(
        self, queries: Array, k: Optional[int] = None
    ) -> Tuple[Array, Array]:
        k = k if k is not None else self._k
        if self._candidates is None:
            raise ValueError(
                "The `index` method must be called first to "
                "create the retrieval index."
            )
        if self.query_fn is not None:
            queries = self.query_fn(queries)
        k = min(k, self._num_candidates)
        if k not in self._fns:
            self._fns[k] = make_sharded_top_k(self._mesh, self._axis, k)
        return self._decode(*self._fns[k](
            queries, self._candidates, self._identifiers, self._valid
        ))

    def is_exact(self) -> bool:
        return True
