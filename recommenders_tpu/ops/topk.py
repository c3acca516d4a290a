"""Top-K primitives: merge, streaming scan, exclusion, distributed reduction.

These are the building blocks for the retrieval index layers
(`recommenders_tpu.layers.factorized_top_k`) and corpus-level evaluation,
replacing the reference's tf.data map/reduce streaming top-k
(`tensorflow_recommenders/layers/factorized_top_k.py:404-509`) with
device-side `lax.scan` and XLA collectives.

Design notes (TPU-first):
  - All shapes are static: corpora are padded up to a chunk multiple and
    padding rows are masked to `MIN_FLOAT` so they can never enter the
    top-k set.
  - The streaming reduction runs as one `lax.scan` on device — candidate
    chunks stream HBM→VMEM under XLA's pipelining, no host round-trips.
  - The distributed reduction is `local top-k → all_gather(k) → re-top-k`,
    riding ICI instead of host gRPC.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

MIN_FLOAT = np.finfo(np.float32).min / 100.0


def top_k(scores: Array, k: int) -> Tuple[Array, Array]:
    """Row-wise top-k: `(values, indices)`, sorted descending."""
    return jax.lax.top_k(scores, k)


def take_along_rows(data: Array, indices: Array) -> Array:
    """`data[i, indices[i, j]]` — counterpart of the reference's
    `_take_along_axis` (layers/factorized_top_k.py:57)."""
    return jnp.take_along_axis(data, indices, axis=1)


def topk_merge(
    state: Tuple[Array, Array],
    update: Tuple[Array, Array],
    k: int,
) -> Tuple[Array, Array]:
    """Merges two (scores, ids) top-k states into one of width `k`.

    The running-reduction step of streaming top-k (reference:
    layers/factorized_top_k.py:440-472). Both inputs are `[q, m]` /
    `[q, n]`; output is `[q, min(k, m + n)]`, sorted descending.
    """
    state_scores, state_ids = state
    new_scores, new_ids = update
    joined_scores = jnp.concatenate([state_scores, new_scores], axis=1)
    joined_ids = jnp.concatenate([state_ids, new_ids], axis=1)
    k = min(k, joined_scores.shape[1])
    scores, indices = jax.lax.top_k(joined_scores, k)
    return scores, take_along_rows(joined_ids, indices)


def pad_corpus(
    candidates: Array,
    identifiers: Optional[Array],
    multiple: int,
) -> Tuple[Array, Array, Array]:
    """Pads a corpus to a row-count multiple; returns (candidates, ids, valid).

    Padding rows are zero embeddings flagged invalid; scoring paths must
    mask them to `MIN_FLOAT`. Identifiers default to `arange(n)` (matching
    the reference's index-based identifiers,
    layers/factorized_top_k.py:544-545) and padding ids are 0 — they are
    unreachable because of the score mask.
    """
    n = candidates.shape[0]
    padded_n = ((n + multiple - 1) // multiple) * multiple
    if identifiers is None:
        identifiers = jnp.arange(n, dtype=jnp.int32)
    valid = jnp.arange(padded_n) < n
    if padded_n != n:
        candidates = jnp.pad(candidates, ((0, padded_n - n), (0, 0)))
        identifiers = jnp.pad(identifiers, (0, padded_n - n))
    return candidates, identifiers, valid


@functools.partial(jax.jit, static_argnames=("k", "chunk_size"))
def streaming_top_k(
    queries: Array,
    candidates: Array,
    identifiers: Array,
    valid: Array,
    k: int,
    chunk_size: int = 4096,
) -> Tuple[Array, Array]:
    """Exact top-k over a chunked corpus via a device-side scan.

    Replaces the reference's host-bound tf.data `.map(top_scores).reduce(
    top_k)` pipeline (layers/factorized_top_k.py:496-507) with one
    `lax.scan` whose carry is the running `[q, k]` top-k state. XLA
    double-buffers the HBM→VMEM streaming of candidate chunks.

    Args:
      queries: `[q, d]` query embeddings.
      candidates: `[n, d]` corpus, with `n` a multiple of `chunk_size`
        (use `pad_corpus`).
      identifiers: `[n]` candidate ids.
      valid: `[n]` bool mask; False rows are padding.
      k: Number of results.
      chunk_size: Candidate rows scored per scan step.

    Returns:
      `([q, k] scores, [q, k] ids)`, sorted descending by score.
    """
    n = candidates.shape[0]
    if n % chunk_size != 0:
        raise ValueError(
            f"corpus rows ({n}) must be a multiple of chunk_size "
            f"({chunk_size}); use pad_corpus first."
        )
    num_chunks = n // chunk_size
    q = queries.shape[0]
    k = min(k, n)

    cand_chunks = candidates.reshape(num_chunks, chunk_size, -1)
    id_chunks = identifiers.reshape(num_chunks, chunk_size)
    valid_chunks = valid.reshape(num_chunks, chunk_size)

    init = (
        jnp.full((q, k), MIN_FLOAT, dtype=jnp.float32),
        jnp.zeros((q, k), dtype=identifiers.dtype),
    )

    def step(state, chunk):
        cand, ids, ok = chunk
        scores = (queries @ cand.T).astype(jnp.float32)
        scores = jnp.where(ok[None, :], scores, MIN_FLOAT)
        kk = min(k, chunk_size)
        chunk_scores, idx = jax.lax.top_k(scores, kk)
        chunk_ids = jnp.take(ids, idx)
        return (
            topk_merge(state, (chunk_scores, chunk_ids), k),
            None,
        )

    (scores, ids), _ = jax.lax.scan(
        step, init, (cand_chunks, id_chunks, valid_chunks)
    )
    return scores, ids


def exclude(
    scores: Array, identifiers: Array, exclusions: Array, k: int
) -> Tuple[Array, Array]:
    """Removes excluded identifiers from over-fetched top-k results.

    Counterpart of the reference's `_exclude`
    (layers/factorized_top_k.py:83-115): rows whose identifier appears in
    that row of `exclusions` have their scores penalized by 1e5, then the
    top `k` survivors are reselected, returning their *original* scores.

    Args:
      scores: `[q, m]` candidate scores (m >= k).
      identifiers: `[q, m]` candidate ids aligned with scores.
      exclusions: `[q, e]` ids to exclude per row.
      k: Number of results to keep.

    Returns:
      `([q, k] scores, [q, k] ids)`.
    """
    isin = jnp.any(
        jnp.equal(identifiers[:, :, None], exclusions[:, None, :]), axis=-1
    )
    adjusted = scores - isin.astype(scores.dtype) * 1.0e5
    k = min(k, scores.shape[1])
    _, indices = jax.lax.top_k(adjusted, k)
    return take_along_rows(scores, indices), take_along_rows(
        identifiers, indices
    )


def distributed_top_k(
    scores: Array,
    identifiers: Array,
    k: int,
    axis_name: str,
) -> Tuple[Array, Array]:
    """Global top-k over a corpus sharded across a mesh axis.

    For use inside `shard_map`: each device contributes its local `[q, m]`
    (scores, ids); results are the global `[q, k]` top-k, replicated. The
    reduction is local-top-k → `all_gather(k)` over ICI → re-top-k, the
    TPU-native replacement for the reference's single-host streaming reduce.
    """
    kk = min(k, scores.shape[1])
    local_scores, idx = jax.lax.top_k(scores, kk)
    local_ids = take_along_rows(identifiers, idx)
    all_scores = jax.lax.all_gather(
        local_scores, axis_name, axis=1, tiled=True
    )
    all_ids = jax.lax.all_gather(local_ids, axis_name, axis=1, tiled=True)
    k = min(k, all_scores.shape[1])
    top_scores, top_idx = jax.lax.top_k(all_scores, k)
    return top_scores, take_along_rows(all_ids, top_idx)
