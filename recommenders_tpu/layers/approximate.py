"""ScaNN-equivalent approximate retrieval index, TPU-native.

The reference wraps the external ScaNN C++ searcher (k-means tree
partitioning + asymmetric-hash scoring + reordering,
`tensorflow_recommenders/layers/factorized_top_k.py:613-793`). This module
rebuilds the same serving capability as device code:

  - **Partitioning**: k-means over the corpus into `num_leaves` leaves
    (Lloyd iterations with device matmuls; host-side bounded-capacity
    packing with spill-to-next-nearest for overflow).
  - **Search**: score query × centroids `[Q, L]`, probe the top
    `num_leaves_to_search` leaves, gather only those leaves' packed rows,
    exact dot scores, top-k — the arithmetic/bandwidth saving is
    `P·cap / N`, the same dial as ScaNN's `leaves_to_search`.
  - **Quantization** (optional): leaves stored int8 with per-row scales
    (4× less scan bandwidth than f32, dequantized on the fly into the MXU
    scoring dot — the role of ScaNN's asymmetric hashing, `score_ah`) or
    bf16 (`leaf_dtype`, 2× less bandwidth at near-f32 recall — the finer
    point on the recall/bandwidth dial when int8 quantization error is
    the recall bottleneck).
  - **Reordering** (optional): the top `num_reordering_candidates` by
    quantized score are re-scored exactly from the full-precision corpus
    and re-top-k'd (ScaNN's `.reorder(n)` pass). `reorder_dtype=bfloat16`
    halves the reorder gather traffic.

Like the reference's test strategy, configuring `num_leaves=1` (and no
quantization) makes the index exact for oracle testing
(layers/factorized_top_k_test.py:249-258).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from recommenders_tpu.layers import factorized_top_k
from recommenders_tpu.ops import leaf_scoring
from recommenders_tpu.ops import quantization
from recommenders_tpu.ops import topk as topk_ops

Array = jax.Array

MIN_FLOAT = topk_ops.MIN_FLOAT


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=())
def _assign_chunk(chunk: Array, centroids: Array) -> Array:
    """Nearest centroid by squared L2 for one corpus chunk."""
    # argmin ||x - c||² = argmax (x·c - ||c||²/2)
    affinity = chunk @ centroids.T - 0.5 * jnp.sum(
        jnp.square(centroids), axis=1
    )
    return jnp.argmax(affinity, axis=1)


def kmeans(
    data: np.ndarray,
    num_clusters: int,
    iterations: int = 10,
    seed: int = 0,
    chunk_size: int = 65536,
) -> np.ndarray:
    """Lloyd's k-means; assignment on device, centroid update on host."""
    rng = np.random.RandomState(seed)
    n = data.shape[0]
    centroids = data[rng.choice(n, size=num_clusters, replace=False)]
    for _ in range(iterations):
        assignments = assign(data, centroids, chunk_size)
        sums = np.zeros_like(centroids)
        np.add.at(sums, assignments, data)
        counts = np.bincount(assignments, minlength=num_clusters)
        empty = counts == 0
        counts = np.maximum(counts, 1)
        centroids = sums / counts[:, None]
        if empty.any():
            # Re-seed empty clusters from random points.
            centroids[empty] = data[
                rng.choice(n, size=int(empty.sum()), replace=False)
            ]
    return centroids.astype(np.float32)


def assign(
    data: np.ndarray, centroids: np.ndarray, chunk_size: int = 65536
) -> np.ndarray:
    """Nearest-centroid assignment for all rows (chunked device matmuls)."""
    centroids_dev = jnp.asarray(centroids)
    out = np.empty((data.shape[0],), np.int32)
    for start in range(0, data.shape[0], chunk_size):
        chunk = jnp.asarray(data[start:start + chunk_size])
        out[start:start + chunk.shape[0]] = np.asarray(
            _assign_chunk(chunk, centroids_dev)
        )
    return out


def _pack_leaves(
    candidates: np.ndarray,
    identifiers: np.ndarray,
    centroids: np.ndarray,
    capacity: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Buckets rows into fixed-capacity leaves, spilling overflow to the
    next-nearest leaf with space. Returns (embs, ids, rows, valid).

    Vectorized for large corpora: slots are assigned by a grouped
    cumulative count (no Python loop over rows), and the full
    `[N, num_leaves]` affinity ranking is computed lazily only for the
    (rare) overflow rows — never for the whole corpus.
    """
    num_leaves = centroids.shape[0]
    n, dim = candidates.shape
    assignments = assign(candidates, centroids)

    # Slot within each leaf = rank of the row among its leaf's rows.
    order = np.argsort(assignments, kind="stable")
    sorted_assign = assignments[order]
    group_start = np.searchsorted(sorted_assign, np.arange(num_leaves))
    slot_sorted = np.arange(n) - group_start[sorted_assign]
    leaf_of = assignments.astype(np.int32).copy()
    slot_of = np.empty((n,), np.int32)
    slot_of[order] = slot_sorted.astype(np.int32)

    fill = np.minimum(
        np.bincount(assignments, minlength=num_leaves), capacity
    ).astype(np.int32)
    overflow_rows = np.where(slot_of >= capacity)[0]
    for row in overflow_rows:
        # Rank this row's affinity to all centroids (cheap per row).
        affinity = (
            candidates[row] @ centroids.T
            - 0.5 * np.sum(np.square(centroids), axis=1)
        )
        for leaf in np.argsort(-affinity):
            if fill[leaf] < capacity:
                leaf_of[row] = leaf
                slot_of[row] = fill[leaf]
                fill[leaf] += 1
                break
        else:
            raise ValueError(
                "Leaf capacity too small to hold the corpus; increase "
                "`leaf_capacity` (or `num_leaves`)."
            )

    embs = np.zeros((num_leaves, capacity, dim), np.float32)
    ids = np.zeros((num_leaves, capacity), identifiers.dtype)
    rows = np.full((num_leaves, capacity), -1, np.int32)
    valid = np.zeros((num_leaves, capacity), bool)
    embs[leaf_of, slot_of] = candidates
    ids[leaf_of, slot_of] = identifiers
    rows[leaf_of, slot_of] = np.arange(n, dtype=np.int32)
    valid[leaf_of, slot_of] = True
    return embs, ids, rows, valid


@functools.partial(jax.jit, static_argnames=("r", "chunk"))
def _topr_assign_soar_device(
    corpus: Array, centroids: Array, soar_lambda: float, r: int, chunk: int
) -> Array:
    """Top-`r` secondary leaves per row under the SOAR objective.

    SOAR (Sun et al. 2023, ScaNN's `soar_lambda`): a point's secondary
    assignment should cover the queries its primary leaf serves WORST —
    those aligned with the primary residual `r₁ = x − c₁`. Candidate
    leaves are ranked by the spilling loss

        ‖x − c‖² + λ · (r₁·(x − c))² / ‖r₁‖²

    i.e. ordinary quantization error plus λ times the component of the
    secondary residual parallel to the primary one; the primary leaf
    itself is excluded. All terms come from two `[chunk, L]` matmuls
    (`x·C` and `r₁·C`), so assignment stays MXU-bound and
    device-resident like `_topr_assign_device`.
    """
    n, d = corpus.shape
    half_norms = 0.5 * jnp.sum(jnp.square(centroids), axis=1)

    def top(block):
        affinity = block @ centroids.T - half_norms  # [c, L]
        primary = jnp.argmax(affinity, axis=1)
        # ‖x−c‖² − ‖x‖² = −2·affinity (row constant dropped: ranking
        # within a row is unchanged).
        dist2 = -2.0 * affinity
        resid = block - centroids[primary]  # r₁ = x − c₁
        r_norm2 = jnp.maximum(
            jnp.sum(jnp.square(resid), axis=1, keepdims=True), 1e-12
        )
        # r₁·(x−c) = r₁·x − r₁·c
        r_dot_x = jnp.sum(resid * block, axis=1, keepdims=True)
        parallel = r_dot_x - resid @ centroids.T  # [c, L]
        loss = dist2 + soar_lambda * jnp.square(parallel) / r_norm2
        loss = jnp.where(
            jax.nn.one_hot(primary, centroids.shape[0], dtype=bool),
            jnp.inf,
            loss,
        )
        _, idx = jax.lax.top_k(-loss, r)
        return idx.astype(jnp.int32)

    nfull = n // chunk
    out = jnp.zeros((n, r), jnp.int32)
    if nfull:
        def body(i, out):
            block = jax.lax.dynamic_slice(
                corpus, (i * chunk, 0), (chunk, d)
            )
            return jax.lax.dynamic_update_slice(
                out, top(block), (i * chunk, 0)
            )

        out = jax.lax.fori_loop(0, nfull, body, out)
    if n % chunk:
        out = out.at[nfull * chunk:].set(top(corpus[nfull * chunk:]))
    return out


@functools.partial(jax.jit, static_argnames=("r", "chunk"))
def _topr_assign_device(
    corpus: Array, centroids: Array, r: int, chunk: int
) -> Array:
    """Top-`r` nearest centroids per row, corpus resident on device.

    Iterates fixed-size corpus chunks with `dynamic_slice` (no padded
    copy of the corpus — at 10M×128 a pad would transiently double HBM)
    so the `[chunk, L]` affinity transient bounds memory; nothing
    crosses the host boundary (on a remote-attached chip the host link
    is the scarce resource — see CLAUDE.md on tunnel bandwidth)."""
    n, d = corpus.shape
    half_norms = 0.5 * jnp.sum(jnp.square(centroids), axis=1)

    def top(block):
        affinity = block @ centroids.T - half_norms
        if r == 1:
            return jnp.argmax(affinity, axis=1)[:, None].astype(jnp.int32)
        _, idx = jax.lax.top_k(affinity, r)
        return idx.astype(jnp.int32)

    nfull = n // chunk
    out = jnp.zeros((n, r), jnp.int32)
    if nfull:
        def body(i, out):
            block = jax.lax.dynamic_slice(
                corpus, (i * chunk, 0), (chunk, d)
            )
            return jax.lax.dynamic_update_slice(
                out, top(block), (i * chunk, 0)
            )

        out = jax.lax.fori_loop(0, nfull, body, out)
    if n % chunk:
        out = out.at[nfull * chunk:].set(top(corpus[nfull * chunk:]))
    return out


def _assign_device(corpus: Array, centroids: Array, chunk: int) -> Array:
    """Nearest-centroid assignment with the corpus resident on device."""
    return _topr_assign_device(corpus, centroids, 1, chunk)[:, 0]


@functools.partial(
    jax.jit, static_argnames=("num_clusters", "chunk", "balance")
)
def _kmeans_step_device(
    corpus: Array, centroids: Array, reseed: Array, num_clusters: int,
    chunk: int, balance: int = 0,
) -> Array:
    """One Lloyd iteration fully on device (assign + segment-sum).

    With `balance > 0`, that many of the LIGHTEST clusters re-seed as
    near-copies of the heaviest ones (split-reseed balancing): the next
    iterations separate each pair along the heavy cluster's principal
    mass, equalizing leaf loads. Bounded-capacity leaf packing turns
    load skew directly into SPILL — rows pushed to leaves the prober
    never visits — so at tight capacity factors (the 100M-on-16GB
    regime) balance buys probed recall.
    """
    assignments = _assign_device(corpus, centroids, chunk)
    sums = jax.ops.segment_sum(
        corpus, assignments, num_segments=num_clusters
    )
    counts = jax.ops.segment_sum(
        jnp.ones((corpus.shape[0],), jnp.float32),
        assignments,
        num_segments=num_clusters,
    )
    empty = counts == 0
    new = sums / jnp.maximum(counts, 1.0)[:, None]
    # Empty clusters re-seed from (pre-selected) random corpus rows.
    new = jnp.where(empty[:, None], reseed, new)
    if balance:
        order = jnp.argsort(counts)
        light = order[:balance]
        heavy = order[-balance:]
        # Split: the light centroid moves next to the heavy one, offset
        # a little toward a random corpus row so Lloyd can pull the
        # pair apart; the heavy cluster's mass then splits between them.
        split = new[heavy] + 0.05 * (reseed[:balance] - new[heavy])
        new = new.at[light].set(split)
    return new


def kmeans_device(
    corpus: Array,
    num_clusters: int,
    iterations: int = 10,
    seed: int = 0,
    chunk: int = 16384,
    sample: Optional[int] = None,
    balance_fraction: float = 0.0,
) -> Array:
    """Lloyd's k-means with the corpus resident on device throughout.

    Equivalent to `kmeans` but with ZERO per-iteration host↔device
    corpus traffic — the build-path requirement for 10M+ corpora behind
    a slow host link, and the faster path on any TPU host.

    `sample` caps the training-set size (random row subset) the Lloyd
    iterations run on — ScaNN likewise trains its partitioner on a
    sample; centroid quality saturates far below full-corpus size while
    assignment cost is linear in it.

    `balance_fraction` > 0 enables split-reseed load balancing: each
    iteration except the last two re-seeds that fraction of the
    lightest clusters next to the heaviest (see `_kmeans_step_device`);
    the final plain iterations let the split pairs settle."""
    rng = np.random.RandomState(seed)
    n = corpus.shape[0]
    train = corpus
    if sample is not None and sample < n:
        train = corpus[jnp.asarray(rng.choice(n, size=sample, replace=False))]
        n = sample
    centroids = train[
        jnp.asarray(rng.choice(n, size=num_clusters, replace=False))
    ]
    nb = int(balance_fraction * num_clusters)
    for it in range(iterations):
        reseed = train[
            jnp.asarray(rng.randint(0, n, size=num_clusters))
        ]
        centroids = _kmeans_step_device(
            train, centroids, reseed, num_clusters, chunk,
            balance=nb if it < iterations - 2 else 0,
        )
    return centroids


@functools.partial(
    jax.jit, static_argnames=("num_leaves", "capacity")
)
def _pack_assign_device(
    choices: Array, num_leaves: int, capacity: int
) -> Tuple[Array, Array, Array]:
    """Bounded-capacity leaf assignment from per-row top-R choices.

    Device twin of `_pack_leaves`' spill logic, restructured for SPMD:
    instead of a sequential walk over overflow rows, run R vectorized
    rounds — in round j every still-unplaced row bids for its j-th
    nearest leaf, ranks among that leaf's bidders via a stable sort, and
    is accepted while `fill + rank < capacity`. Rows a leaf rejects in
    round j spill to their (j+1)-th choice next round, matching the
    host path's next-nearest-with-space semantics up to tie order.

    Returns `(leaf_of, slot_of, unplaced)` where unplaced rows carry the
    sentinel `leaf_of == num_leaves` (callers scatter with mode="drop").
    """
    n, r = choices.shape
    iota = jnp.arange(n, dtype=jnp.int32)
    leaf_of = jnp.full((n,), num_leaves, jnp.int32)
    slot_of = jnp.zeros((n,), jnp.int32)
    fill = jnp.zeros((num_leaves,), jnp.int32)
    for j in range(r):
        unplaced = leaf_of == num_leaves
        cand = jnp.where(unplaced, choices[:, j], num_leaves)
        safe = jnp.minimum(cand, num_leaves - 1)
        order = jnp.argsort(cand, stable=True)
        sorted_cand = cand[order]
        group_start = jnp.searchsorted(
            sorted_cand, jnp.arange(num_leaves, dtype=sorted_cand.dtype)
        ).astype(jnp.int32)
        rank_sorted = iota - group_start[
            jnp.minimum(sorted_cand, num_leaves - 1)
        ]
        rank = jnp.zeros((n,), jnp.int32).at[order].set(rank_sorted)
        slot = rank + fill[safe]
        ok = unplaced & (slot < capacity)
        leaf_of = jnp.where(ok, cand, leaf_of)
        slot_of = jnp.where(ok, slot, slot_of)
        fill = fill + jax.ops.segment_sum(
            ok.astype(jnp.int32), safe, num_segments=num_leaves
        )

    # Final fallback, mirroring the host path's "next-nearest leaf WITH
    # SPACE" guarantee beyond the R-choice horizon: remaining rows pack
    # into the global pool of free slots in leaf order (a vectorized
    # matching via cumulative free capacity), so packing only fails when
    # total capacity is genuinely short.
    unplaced = leaf_of == num_leaves
    free = capacity - fill
    cum = jnp.cumsum(free)
    pos = jnp.cumsum(unplaced.astype(jnp.int32)) - 1  # rank among unplaced
    dest_leaf = jnp.searchsorted(cum, pos, side="right").astype(jnp.int32)
    in_pool = unplaced & (pos < cum[-1])
    safe_leaf = jnp.minimum(dest_leaf, num_leaves - 1)
    prev_cum = jnp.where(safe_leaf > 0, cum[safe_leaf - 1], 0)
    dest_slot = pos - prev_cum + fill[safe_leaf]
    leaf_of = jnp.where(in_pool, safe_leaf, leaf_of)
    slot_of = jnp.where(in_pool, dest_slot, slot_of)
    return leaf_of, slot_of, jnp.sum(leaf_of == num_leaves)


# Shared with the quantized Bucketed full-scan; see ops/quantization.py
# for the anisotropic closed forms.
_quantize_rows_device = quantization.quantize_rows_device


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _scatter_batch(
    embs_buf: Array, rows_buf: Array, valid_buf: Array,
    batch: Array, leaf_b: Array, slot_b: Array, row0,
) -> Tuple[Array, Array, Array]:
    """Scatters one corpus batch into unquantized leaf storage (donated,
    in-place). `row0` is the batch's first global row index."""
    b = batch.shape[0]
    rows = row0 + jnp.arange(b, dtype=jnp.int32)
    return (
        embs_buf.at[leaf_b, slot_b].set(
            batch.astype(embs_buf.dtype), mode="drop"
        ),
        rows_buf.at[leaf_b, slot_b].set(rows, mode="drop"),
        valid_buf.at[leaf_b, slot_b].set(True, mode="drop"),
    )


@functools.partial(
    jax.jit, donate_argnums=(0, 1, 2, 3),
    static_argnames=("threshold", "bits", "half"),
)
def _scatter_batch_quantized(
    codes_buf: Array, scales_buf: Array, rows_buf: Array,
    valid_buf: Array, batch: Array, leaf_b: Array, slot_b: Array, row0,
    threshold, bits: int, half: int,
) -> Tuple[Array, Array, Array, Array]:
    """Quantize-and-scatter one batch into int8 (or nibble-packed int4)
    leaf storage. For `bits=4`, `half = capacity // 2`: slot `s` lands
    in packed slot `s % half`, low nibble for `s < half`, high nibble
    otherwise (`ops/quantization.pack_nibbles` layout per leaf). Each
    (leaf, packed-slot, nibble) is written at most once over a zero
    buffer, so a wrapping int8 add realizes the bitwise OR exactly."""
    b = batch.shape[0]
    rows = row0 + jnp.arange(b, dtype=jnp.int32)
    scales, codes = quantization.quantize_block(
        batch, threshold, bits=bits
    )
    if bits == 4:
        nib = codes.astype(jnp.int32) & 15
        val = jnp.where(
            (slot_b < half)[:, None], nib, nib << 4
        ).astype(jnp.int8)
        codes_buf = codes_buf.at[leaf_b, slot_b % half].add(
            val, mode="drop"
        )
    else:
        codes_buf = codes_buf.at[leaf_b, slot_b].set(codes, mode="drop")
    return (
        codes_buf,
        scales_buf.at[leaf_b, slot_b].set(scales, mode="drop"),
        rows_buf.at[leaf_b, slot_b].set(rows, mode="drop"),
        valid_buf.at[leaf_b, slot_b].set(True, mode="drop"),
    )


@functools.partial(
    jax.jit, static_argnames=("num_leaves", "capacity", "fill")
)
def _scatter_leaves(
    values: Array, leaf_of: Array, slot_of: Array,
    num_leaves: int, capacity: int, fill=0,
) -> Array:
    """Scatter per-row values into `[num_leaves, capacity, ...]` blocks;
    unplaced rows (sentinel leaf == num_leaves) drop out of bounds.
    Empty slots hold `fill`."""
    shape = (num_leaves, capacity) + values.shape[1:]
    return (
        jnp.full(shape, fill, values.dtype)
        .at[leaf_of, slot_of]
        .set(values, mode="drop")
    )


# NumPy twin for host build paths; see ops/quantization.py for the
# score-aware (anisotropic) closed forms and their derivation.
_quantize_rows = quantization.quantize_rows


@functools.partial(
    jax.jit,
    static_argnames=("num_probes", "k", "quantized", "dedup", "for_tpu"),
)
def _search(
    queries: Array,
    centroids: Array,
    leaf_embs: Array,
    leaf_scales: Optional[Array],
    leaf_ids: Array,
    leaf_rows: Array,
    leaf_valid: Array,
    num_probes: int,
    k: int,
    quantized: Optional[str],
    dedup: bool = False,
    for_tpu: Optional[bool] = None,
) -> Tuple[Array, Array, Array]:
    """Probe top leaves, score their rows, top-k. Returns
    (scores, identifiers, global_rows). With `dedup` (SOAR indexes pack
    rows twice), duplicate global rows among the 2k best are removed
    before the final top-k — each duplicate pair carries identical
    scores, so one survivor per row is exact. `quantized` is
    None/"int8"/"int4" (int4 leaves are nibble-packed, `[L, cap/2, D]`)."""
    cscores = queries @ centroids.T  # [Q, L]
    _, probes = jax.lax.top_k(cscores, num_probes)  # [Q, P]

    q, d = queries.shape
    packed4 = quantized == "int4"
    cap_store = leaf_embs.shape[1]
    scales = leaf_scales if quantized else None
    # The Pallas kernel streams probed leaves HBM→VMEM and never
    # materializes the [Q, P, cap, D] gather (17 GB at the module
    # defaults on a 1M×128 corpus); the reference formulation remains
    # for CPU and for shapes off the tiling grid.
    if for_tpu is None:
        for_tpu = jax.default_backend() != "cpu"
    if for_tpu and d % 128 == 0 and cap_store % 128 == 0:
        scores = leaf_scoring.probed_leaf_scores(
            queries, leaf_embs, scales, probes, packed4=packed4
        )
    else:
        scores = leaf_scoring.probed_scores_reference(
            queries, leaf_embs, scales, probes, packed4=packed4
        )
    scores = jnp.where(
        leaf_valid[probes].reshape(q, -1), scores, MIN_FLOAT
    )
    ids = leaf_ids[probes].reshape(q, -1)
    rows = leaf_rows[probes].reshape(q, -1)
    k = min(k, scores.shape[1])
    fetch = min(2 * k, scores.shape[1]) if dedup else k
    top_scores, idx = jax.lax.top_k(scores, fetch)
    top_ids = jnp.take_along_axis(ids, idx, axis=1)
    top_rows = jnp.take_along_axis(rows, idx, axis=1)
    if dedup:
        top_scores, top_ids, top_rows = _dedup_topk(
            top_scores, top_ids, top_rows, k
        )
    return top_scores, top_ids, top_rows


def _dedup_topk(
    top_scores: Array, top_ids: Array, top_rows: Array, k: int
) -> Tuple[Array, Array, Array]:
    """Removes duplicate global rows from a 2k-wide shortlist, re-top-ks
    to k. A row appears at most twice (primary + SOAR copy), so fetching
    2k guarantees k unique survivors. Sort by row id, kill the second of
    each equal-adjacent pair (copies tie exactly — the same stored codes
    score identically), re-top-k."""
    q = top_scores.shape[0]
    order = jnp.argsort(top_rows, axis=1)
    sr = jnp.take_along_axis(top_rows, order, axis=1)
    ss = jnp.take_along_axis(top_scores, order, axis=1)
    si = jnp.take_along_axis(top_ids, order, axis=1)
    dup_mask = jnp.concatenate(
        [jnp.zeros((q, 1), bool), sr[:, 1:] == sr[:, :-1]], axis=1
    )
    ss = jnp.where(dup_mask, MIN_FLOAT, ss)
    top_scores, idx2 = jax.lax.top_k(ss, k)
    top_ids = jnp.take_along_axis(si, idx2, axis=1)
    top_rows = jnp.take_along_axis(sr, idx2, axis=1)
    return top_scores, top_ids, top_rows


def _tile_probes(
    queries: Array, cscores: Array, num_probes: int, tile: int
) -> Tuple[Array, Array, Optional[Array]]:
    """Probe lists per query tile; shared by the single-device bucketed
    search and `parallel.ann.ShardedScaNN`'s per-shard fold (identical
    probe construction is what makes the sharded scores an exact
    partition of the unsharded ones).

    With `tile == 1`: per-query top-P probes, queries untouched.
    With `tile > 1`: sort queries by primary centroid so tiles are
    probe-coherent, then give every tile member its personal
    top-⌈P/tile⌉ leaves, interleaved rank-major (all rank-0 probes
    first) so truncation to P stays fair. Sorting each tile's probe
    list ascending makes duplicate entries ADJACENT — the Pallas
    pipeline skips the HBM→VMEM copy when consecutive grid steps map to
    the same block, so coherent tiles pay only for their UNIQUE leaves.

    Returns `(queries, probes [tiles, P] int32, inv)` where `inv`
    restores the original query order (None when tile == 1).
    """
    if tile == 1:
        _, probes = jax.lax.top_k(cscores, num_probes)  # [Q, P]
        return queries, probes.astype(jnp.int32), None
    q = queries.shape[0]
    primary = jnp.argmax(cscores, axis=1)
    order = jnp.argsort(primary)
    queries = queries[order]
    cscores = cscores[order]
    tiles = q // tile
    p_each = num_probes // tile
    parts = []
    if p_each:
        _, per_q = jax.lax.top_k(cscores, p_each)  # [Q, p']
        parts.append(
            per_q.reshape(tiles, tile, p_each)
            .transpose(0, 2, 1)
            .reshape(tiles, tile * p_each)
        )
    rem = num_probes - p_each * tile
    if rem:
        # Slots beyond the per-query floor: the tile's consensus
        # leaves (max affinity over members).
        tile_aff = jnp.max(cscores.reshape(tiles, tile, -1), axis=1)
        _, shared = jax.lax.top_k(tile_aff, rem)
        parts.append(shared)
    probes = jnp.sort(jnp.concatenate(parts, axis=1), axis=1)
    return queries, probes.astype(jnp.int32), jnp.argsort(order)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_probes", "k", "quantized", "dedup", "buckets", "tile",
        "for_tpu",
    ),
)
def _search_bucketed(
    queries: Array,
    centroids: Array,
    leaf_embs: Array,
    leaf_scales: Optional[Array],
    leaf_rows: Array,
    identifiers: Array,
    num_probes: int,
    k: int,
    quantized: Optional[str],
    dedup: bool,
    buckets: int,
    tile: int,
    for_tpu: Optional[bool] = None,
) -> Tuple[Array, Array, Array]:
    """Probed search through the bucketed-argmax kernel.

    Two structural differences from `_search`:
      - Scores fold into `buckets` running-argmax cells INSIDE the
        kernel, so the host-visible tensors are `[Q, B]` (not
        `[Q, P·cap]`) and the final `top_k` is over B columns — at 10M
        rows / P=512 that replaces a [256, 1.7M] top-k plus two
        same-sized id gathers.
      - With `tile > 1`, queries are sorted by primary centroid and each
        tile of `tile` queries shares one probe list (the top-P leaves
        by the tile's max centroid affinity): a probed leaf streams
        HBM→VMEM once per TILE instead of once per query, dividing scan
        traffic by the tile width. Query order is restored on return.
    """
    q, d = queries.shape
    cscores = queries @ centroids.T  # [Q, L]
    queries, probes, inv = _tile_probes(queries, cscores, num_probes, tile)
    packed4 = quantized == "int4"
    scales = leaf_scales if quantized else None
    # Effective fold width cannot exceed leaf capacity (a leaf with
    # cap < requested buckets folds slot c into bucket c directly).
    cap_logical = leaf_embs.shape[1] * (2 if packed4 else 1)
    buckets = min(buckets, cap_logical)
    if for_tpu is None:
        for_tpu = jax.default_backend() != "cpu"
    if for_tpu and d % 128 == 0:
        vals, rows = leaf_scoring.probed_bucketed_scores(
            queries, leaf_embs, scales, leaf_rows, probes, buckets,
            query_tile=tile, packed4=packed4,
        )
    else:
        vals, rows = leaf_scoring.probed_bucketed_reference(
            queries, leaf_embs, scales, leaf_rows, probes, buckets,
            query_tile=tile, packed4=packed4,
        )
    if inv is not None:
        vals = vals[inv]
        rows = rows[inv]
    k = min(k, buckets)
    fetch = min(2 * k, buckets) if dedup else k
    top_scores, idx = jax.lax.top_k(vals, fetch)
    top_rows = jnp.take_along_axis(rows, idx, axis=1)
    # identifiers=None ⇒ rows ARE the ids (saves an [N] gather table —
    # 0.4 GB at 100M, which matters for the streamed build's budget).
    top_ids = (
        top_rows if identifiers is None
        else identifiers[jnp.maximum(top_rows, 0)]
    )
    if dedup:
        top_scores, top_ids, top_rows = _dedup_topk(
            top_scores, top_ids, top_rows, k
        )
    return top_scores, top_ids, top_rows


@functools.partial(jax.jit, static_argnames=("k",))
def _reorder(
    queries: Array,
    candidate_rows: Array,
    scores: Array,
    corpus: Array,
    identifiers: Array,
    k: int,
) -> Tuple[Array, Array]:
    """Exact re-scoring of the shortlisted rows (ScaNN's reorder pass)."""
    gathered = corpus[candidate_rows]  # [Q, R, D]
    exact = jnp.einsum(
        "qd,qrd->qr", queries, gathered, preferred_element_type=jnp.float32
    )
    exact = jnp.where(scores > MIN_FLOAT / 2, exact, MIN_FLOAT)
    k = min(k, exact.shape[1])
    top_scores, idx = jax.lax.top_k(exact, k)
    rows = jnp.take_along_axis(candidate_rows, idx, axis=1)
    return top_scores, jnp.take(identifiers, rows)


class ScaNN(factorized_top_k.TopK):
    """Approximate top-K index: partition → probe → (quantized) score →
    optional exact reorder.

    API-parity counterpart of the reference's `ScaNN` layer
    (layers/factorized_top_k.py:613-707): `num_leaves`,
    `num_leaves_to_search`, and `num_reordering_candidates` mean the same
    thing; `quantize` replaces `dimensions_per_block` (int8 rows instead
    of asymmetric hashing).

    Attributes:
      query_fn: Optional query-embedding function applied before search.
      k: Default number of results.
      num_leaves: Partitions in the k-means tree.
      num_leaves_to_search: Leaves probed per query.
      training_iterations: Lloyd iterations at index build.
      quantize: `False`, `"int8"` (or `True`), or `"int4"`. Integer
        leaf storage with per-row scales. `"int4"` packs two 4-bit
        codes per byte (`ops/quantization.pack_nibbles`) — the
        TPU-native counterpart of ScaNN's 4-bit asymmetric-hashing
        scan (`score_ah(2)`, where the reference's
        `dimensions_per_block=2` also spends 4 bits per 2 dims): 8×
        less probe-scan HBM traffic than f32, 2× less than int8. int4
        quantization error is large (~11% per-coordinate RMS), so pair
        it with `num_reordering_candidates` — the int4-scan → exact
        (bf16) reorder cascade is ScaNN's production recipe and
        recovers recall to near the reorder dtype's level.
      leaf_dtype: Storage dtype of unquantized leaves (float32 or
        bfloat16). bf16 leaves halve the probe-scan HBM traffic with
        ~3 decimal digits of score precision — between f32 and int8 on
        the recall/bandwidth trade; mutually exclusive with `quantize`.
      reorder_dtype: Storage dtype of the exact-reorder corpus (float32
        or bfloat16). The reorder pass is gather-bound, so bf16 halves
        its traffic; scores are still accumulated in f32.
      anisotropic_quantization_threshold: ScaNN's score-aware
        quantization dial (`score_ah`'s parameter of the same name):
        per-row scales minimize the anisotropic loss that weights
        parallel quantization error η = (d−1)T²/(1−T²) times heavier
        than orthogonal (Guo et al. 2020). None falls back to abs-max
        scaling. Only meaningful with `quantize=True`.
      num_reordering_candidates: If set, shortlist size re-scored exactly
        from the float corpus before the final top-k.
      soar_lambda: If set, every row is ALSO packed into a secondary
        leaf chosen by the SOAR spilling objective (Sun et al. 2023;
        ScaNN's `soar_lambda`, typically 1.0-1.5): secondary
        quantization error plus λ × its component parallel to the
        primary residual, covering exactly the queries the primary leaf
        serves worst. Doubles leaf memory, raises recall at fixed
        probes; duplicate hits are removed at query time. Device build
        only (NumPy corpora are moved to device).
      scoring_buckets: If set, probed leaves are scored through the
        bucketed-argmax kernel: scores fold into this many running
        argmax cells in VMEM and only `[Q, scoring_buckets]` leaves the
        kernel — the final top-k is over buckets, not `P·cap` slots
        (the `Bucketed` full-scan reduction applied to the probed
        subset). Use ≥ 40× k (bucket-collision recall loss matches
        `Bucketed`, e.g. ≈0.99 at 4096 buckets / k=100). Must be a
        multiple of 128; clamped to the leaf capacity (folding handles
        any 128-aligned capacity, including partial tail groups).
      probe_tile: With `scoring_buckets`, queries are sorted by primary
        centroid and each tile of `probe_tile` queries shares one probe
        list (top-P leaves by the tile's max centroid affinity), so a
        probed leaf streams from HBM once per tile instead of once per
        query — scan traffic divides by the tile width. Choose the
        probe count ~2-4× larger than the per-query setting to keep
        per-query coverage. 1 = exact per-query probing. Note tiles are
        formed by sorting WITHIN the query batch, so a query's results
        depend (mildly) on its batchmates; identical batches always
        return identical results.
      leaf_capacity: Rows per leaf; defaults to `1.3 × N / num_leaves`
        rounded up (spill handles imbalance).
      query_batch: Queries scored per search invocation. The probe gather
        materializes `[q, probes, capacity, dim]`, so large query batches
        are processed in chunks of this size to bound memory.
      seed: k-means seed.
      kmeans_sample_size: If set, Lloyd iterations train on this many
        randomly sampled rows instead of the full corpus (device build
        only; ScaNN likewise trains its partitioner on a sample).
      kmeans_balance_fraction: If > 0, split-reseed load balancing
        during the Lloyd iterations (`kmeans_device`): each iteration
        re-seeds this fraction of the lightest clusters next to the
        heaviest. At tight leaf-capacity factors load skew becomes
        capacity SPILL — rows packed into leaves the prober never
        visits — so balancing trades a little quantization optimality
        for probed recall (the 100M-on-one-chip regime; see
        docs/PARITY.md). A PINCH dial: ~1/16 is the tuned regime
        (100M flagship: 0.0625 → recall 0.974); large fractions
        over-reseed the centroids every iteration and cost recall
        (0.3 measured 0.882 at the same configuration).
      assign_chunk: Corpus rows per assignment block in the device
        build; bounds the `[chunk, num_leaves]` affinity transient.
      spill_rounds: Overflow rows may spill to at most this many
        nearest leaves in the device build's vectorized packing.
    """

    def __init__(
        self,
        query_fn: Optional[Callable[[Array], Array]] = None,
        k: int = 10,
        num_leaves: int = 100,
        num_leaves_to_search: int = 10,
        training_iterations: int = 10,
        quantize=False,
        leaf_dtype=jnp.float32,
        reorder_dtype=jnp.float32,
        anisotropic_quantization_threshold: Optional[float] = 0.2,
        num_reordering_candidates: Optional[int] = None,
        soar_lambda: Optional[float] = None,
        scoring_buckets: Optional[int] = None,
        probe_tile: int = 1,
        leaf_capacity: Optional[int] = None,
        query_batch: int = 256,
        seed: int = 0,
        kmeans_sample_size: Optional[int] = None,
        kmeans_balance_fraction: float = 0.0,
        assign_chunk: int = 16384,
        spill_rounds: int = 8,
    ) -> None:
        super().__init__(k=k)
        self.query_fn = query_fn
        self._num_leaves = num_leaves
        self._num_probes = min(num_leaves_to_search, num_leaves)
        self._iterations = training_iterations
        quantize = {True: "int8", False: None}.get(quantize, quantize)
        if quantize not in (None, "int8", "int4"):
            raise ValueError(
                f"quantize must be False, True, 'int8' or 'int4'; got "
                f"{quantize!r}"
            )
        self._quantize = quantize
        self._leaf_dtype = jnp.dtype(leaf_dtype)
        self._reorder_dtype = jnp.dtype(reorder_dtype)
        if self._leaf_dtype not in (jnp.float32, jnp.bfloat16):
            raise ValueError(
                f"leaf_dtype must be float32 or bfloat16, got {leaf_dtype}"
            )
        if self._reorder_dtype not in (jnp.float32, jnp.bfloat16):
            raise ValueError(
                f"reorder_dtype must be float32 or bfloat16, "
                f"got {reorder_dtype}"
            )
        if quantize and self._leaf_dtype != jnp.float32:
            raise ValueError(
                "quantize=True stores int8 leaves; leaf_dtype applies "
                "only to unquantized indexes."
            )
        self._anisotropic_threshold = anisotropic_quantization_threshold
        self._reorder_n = num_reordering_candidates
        if soar_lambda is not None and soar_lambda < 0:
            raise ValueError(
                f"soar_lambda must be >= 0, got {soar_lambda}"
            )
        self._soar_lambda = soar_lambda
        if scoring_buckets is not None and scoring_buckets % 128:
            raise ValueError(
                f"scoring_buckets must be a multiple of 128, got "
                f"{scoring_buckets}"
            )
        if probe_tile < 1:
            raise ValueError(f"probe_tile must be >= 1, got {probe_tile}")
        if probe_tile > 1 and scoring_buckets is None:
            raise ValueError(
                "probe_tile > 1 requires scoring_buckets (tile-coherent "
                "probing runs through the bucketed kernel)."
            )
        self._scoring_buckets = scoring_buckets
        self._probe_tile = probe_tile
        self._leaf_capacity = leaf_capacity
        self._query_batch = query_batch
        self._seed = seed
        self._kmeans_sample = kmeans_sample_size
        self._kmeans_balance = kmeans_balance_fraction
        self._assign_chunk = assign_chunk
        self._spill_rounds = spill_rounds
        self._built = False

    def _capacity(self, num_leaves: int, n: int) -> int:
        # SOAR packs every row twice (primary + spilled assignment).
        rows = 2 * n if self._soar_lambda is not None else n
        # Leaf blocks feed the Pallas scorers; keep them on the 128-row
        # tiling grid. The bucketed kernel folds any 128-aligned
        # capacity (partial tail group), so no bucket-grain padding —
        # that would inflate scan traffic by up to scoring_buckets/cap.
        # int4 packs slot pairs (s, s + cap/2) per byte, so the packed
        # half-capacity must itself sit on the 128 grid → grain 256.
        grain = 256 if self._quantize == "int4" else 128
        if self._leaf_capacity is not None:
            if num_leaves * self._leaf_capacity < rows:
                raise ValueError(
                    f"num_leaves ({num_leaves}) × leaf_capacity "
                    f"({self._leaf_capacity}) = "
                    f"{num_leaves * self._leaf_capacity} cannot hold "
                    f"the {rows} packed rows."
                )
            return _round_up(self._leaf_capacity, grain)
        return _round_up(
            max(1, int(np.ceil(1.3 * rows / num_leaves))), grain
        )

    def index(
        self,
        candidates: Array,
        identifiers: Optional[Array] = None,
    ) -> "ScaNN":
        """Builds the index. A `jax.Array` corpus is built fully on
        device (k-means, packing, and quantization never leave HBM —
        one corpus upload total, the scaling requirement for 10M+ rows
        behind a host link); NumPy input uses the host build path.

        String identifiers stay host-side (the device index runs on
        row positions; results decode on fetch — see the TopK base)."""
        identifiers = self._intern_identifiers(
            identifiers, np.shape(candidates)[0]
        )
        if isinstance(candidates, jax.Array):
            return self._index_device(candidates, identifiers)
        if self._soar_lambda is not None:
            # SOAR assignment is implemented device-side only.
            return self._index_device(
                jnp.asarray(candidates, jnp.float32),
                None if identifiers is None else jnp.asarray(identifiers),
            )
        candidates = np.asarray(candidates, np.float32)
        n = candidates.shape[0]
        if identifiers is None:
            identifiers = np.arange(n, dtype=np.int32)
        else:
            identifiers = np.asarray(identifiers)
            if identifiers.shape[0] != n:
                raise ValueError(
                    "The candidates and identifiers tensors must have the "
                    f"same number of rows (got {n} and "
                    f"{identifiers.shape[0]})."
                )

        num_leaves = min(self._num_leaves, n)
        capacity = self._capacity(num_leaves, n)

        centroids = kmeans(
            candidates, num_leaves, self._iterations, self._seed
        )
        embs, ids, rows, valid = _pack_leaves(
            candidates, identifiers, centroids, capacity
        )

        self._centroids = jnp.asarray(centroids)
        self._leaf_ids = jnp.asarray(ids)
        self._leaf_rows = jnp.asarray(rows)
        self._leaf_valid = jnp.asarray(valid)
        if self._quantize:
            bits = 4 if self._quantize == "int4" else 8
            scales, q = _quantize_rows(
                embs, self._anisotropic_threshold, bits=bits
            )
            codes = jnp.asarray(q)
            if bits == 4:
                codes = quantization.pack_nibbles(codes)
            self._leaf_embs = codes
            self._leaf_scales = jnp.asarray(scales.astype(np.float32))
        else:
            self._leaf_embs = jnp.asarray(embs).astype(self._leaf_dtype)
            self._leaf_scales = None
        # Full-precision corpus retained for the exact reorder pass.
        self._corpus = (
            jnp.asarray(candidates).astype(self._reorder_dtype)
            if self._reorder_n else None
        )
        self._identifiers = (
            jnp.asarray(identifiers) if self._reorder_n else None
        )
        self._flat_ids = (
            jnp.asarray(identifiers)
            if self._scoring_buckets is not None else None
        )
        self._num_candidates = n
        self._built = True
        return self

    def _index_device(
        self,
        candidates: Array,
        identifiers: Optional[Array] = None,
    ) -> "ScaNN":
        """Device-resident build: every stage (Lloyd iterations, top-R
        assignment, capacity packing, int8 quantization) runs as jitted
        device code over the in-HBM corpus; only a single scalar
        (the unplaced-row count) returns to the host."""
        candidates = candidates.astype(jnp.float32)
        n = candidates.shape[0]
        if identifiers is None:
            identifiers = jnp.arange(n, dtype=jnp.int32)
        else:
            identifiers = jnp.asarray(identifiers)
            if identifiers.shape[0] != n:
                raise ValueError(
                    "The candidates and identifiers tensors must have the "
                    f"same number of rows (got {n} and "
                    f"{identifiers.shape[0]})."
                )

        num_leaves = min(self._num_leaves, n)
        capacity = self._capacity(num_leaves, n)

        centroids = kmeans_device(
            candidates, num_leaves, self._iterations, self._seed,
            chunk=self._assign_chunk, sample=self._kmeans_sample,
            balance_fraction=self._kmeans_balance,
        )
        soar = self._soar_lambda is not None and num_leaves > 1
        rounds = min(
            self._spill_rounds, num_leaves - 1 if soar else num_leaves
        )
        choices = _topr_assign_device(
            candidates, centroids, rounds, self._assign_chunk
        )
        if soar:
            # Each row packs twice: once by nearest-centroid ranking,
            # once by the SOAR spilling objective (primary excluded).
            # Duplicated virtual rows [x; x] share the packing pass.
            soar_choices = _topr_assign_soar_device(
                candidates, centroids, float(self._soar_lambda),
                rounds, self._assign_chunk,
            )
            choices = jnp.concatenate([choices, soar_choices], axis=0)

        def dup(values: Array) -> Array:
            return jnp.concatenate([values, values], 0) if soar else values

        leaf_of, slot_of, unplaced = _pack_assign_device(
            choices, num_leaves, capacity
        )
        if int(unplaced) > 0:
            raise ValueError(
                f"{int(unplaced)} rows could not be placed within their "
                f"{rounds} nearest leaves; increase `leaf_capacity`, "
                "`num_leaves`, or `spill_rounds`."
            )

        self._centroids = centroids
        self._leaf_ids = _scatter_leaves(
            dup(identifiers), leaf_of, slot_of, num_leaves, capacity
        )
        self._leaf_rows = _scatter_leaves(
            dup(jnp.arange(n, dtype=jnp.int32)), leaf_of, slot_of,
            num_leaves, capacity, fill=-1,
        )
        self._leaf_valid = _scatter_leaves(
            dup(jnp.ones((n,), bool)), leaf_of, slot_of, num_leaves,
            capacity,
        )
        if self._quantize:
            # Per-row quantization is leaf-independent: quantize the
            # flat corpus, then scatter int8 codes — the [L, cap, D]
            # float intermediate never exists.
            bits = 4 if self._quantize == "int4" else 8
            scales, codes = _quantize_rows_device(
                candidates, self._anisotropic_threshold, bits=bits
            )
            leaf_codes = _scatter_leaves(
                dup(codes), leaf_of, slot_of, num_leaves, capacity
            )
            if bits == 4:
                leaf_codes = quantization.pack_nibbles(leaf_codes)
            self._leaf_embs = leaf_codes
            self._leaf_scales = _scatter_leaves(
                dup(scales), leaf_of, slot_of, num_leaves, capacity
            )
        else:
            self._leaf_embs = _scatter_leaves(
                dup(candidates.astype(self._leaf_dtype)), leaf_of,
                slot_of, num_leaves, capacity,
            )
            self._leaf_scales = None
        self._corpus = (
            candidates.astype(self._reorder_dtype)
            if self._reorder_n else None
        )
        self._identifiers = identifiers if self._reorder_n else None
        self._flat_ids = (
            identifiers if self._scoring_buckets is not None else None
        )
        self._num_candidates = n
        self._built = True
        return self

    def index_streamed(
        self,
        batches,
        num_rows: int,
        identifiers: Optional[Array] = None,
    ) -> "ScaNN":
        """Streamed PARTITIONED build: the f32 corpus never exists on
        device, so probed ANN serving reaches corpora past HBM's f32
        capacity (e.g. int8 leaves over 100M×128 rows on a 16 GB chip,
        where the f32 corpus would be 51 GB).

        Three passes over the batch stream (so `batches` must be a
        zero-arg callable returning a fresh iterator, or a list):

          1. **Sample** — stride-samples `kmeans_sample_size` rows
             (default 2²¹) for the device Lloyd iterations; ScaNN also
             trains its partitioner on a sample.
          2. **Assign** — per-batch top-R centroid choices accumulate
             into a device `[N, R]` buffer; bounded-capacity packing
             (`_pack_assign_device`) then runs on device, and the
             resulting `leaf_of`/`slot_of` maps move to HOST memory so
             the scatter pass's device peak is just the leaf storage
             plus one batch.
          3. **Quantize + scatter** — each batch quantizes on device
             and scatters into the preallocated leaf blocks (donated,
             in-place; int4 ORs nibbles into the packed layout).

        Restrictions (each would re-materialize corpus-scale state —
        the thing streaming exists to avoid): no SOAR (doubles leaf
        memory), no reorder (needs the full-precision corpus
        resident). With `identifiers=None`, global row indices serve
        as ids with no `[N]` gather table.

        Args:
          batches: Zero-arg callable returning an iterator of `[b, D]`
            row blocks in corpus order, or a list of blocks. Uniform
            batch sizes avoid per-shape recompiles.
          num_rows: Total corpus rows (must match the stream).
          identifiers: Optional `[num_rows]` id array (device-resident
            gather table; omit at extreme scale).
        """
        if self._soar_lambda is not None:
            raise ValueError(
                "index_streamed does not support soar_lambda (SOAR "
                "doubles leaf memory; the streamed build exists because "
                "memory is the binding constraint)."
            )
        if self._reorder_n:
            raise ValueError(
                "index_streamed does not support "
                "num_reordering_candidates (the exact reorder needs the "
                "full-precision corpus resident on device)."
            )
        if callable(batches):
            factory = batches
        else:
            blocks = list(batches)
            factory = lambda: iter(blocks)  # noqa: E731
        identifiers = self._intern_identifiers(identifiers, num_rows)
        if identifiers is not None:
            identifiers = jnp.asarray(identifiers)
            if identifiers.shape[0] != num_rows:
                raise ValueError(
                    f"identifiers rows ({identifiers.shape[0]}) != "
                    f"num_rows ({num_rows})."
                )

        num_leaves = min(self._num_leaves, num_rows)
        capacity = self._capacity(num_leaves, num_rows)
        packed4 = self._quantize == "int4"

        # Pass 1: stride-sample rows for centroid training.
        sample_target = min(
            self._kmeans_sample or (1 << 21), num_rows
        )
        rng = np.random.RandomState(self._seed)
        parts = []
        seen = 0
        for batch in factory():
            batch = jnp.asarray(batch)
            b = batch.shape[0]
            take = min(b, int(np.ceil(sample_target * b / num_rows)))
            if take:
                idx = np.sort(rng.choice(b, size=take, replace=False))
                parts.append(batch[jnp.asarray(idx)])
            seen += b
        if seen != num_rows:
            raise ValueError(
                f"Batches supplied {seen} rows, expected num_rows="
                f"{num_rows}."
            )
        sample = jnp.concatenate(parts, axis=0).astype(jnp.float32)
        del parts
        centroids = kmeans_device(
            sample, num_leaves, self._iterations, self._seed,
            chunk=self._assign_chunk,
            balance_fraction=self._kmeans_balance,
        )
        del sample

        # Pass 2: top-R assignment into a device [N, R] buffer, then
        # capacity packing; assignment maps stage on host.
        rounds = min(self._spill_rounds, num_leaves)
        choices = jnp.zeros((num_rows, rounds), jnp.int32)
        off = 0
        for batch in factory():
            batch = jnp.asarray(batch).astype(jnp.float32)
            ch = _topr_assign_device(
                batch, centroids, rounds, self._assign_chunk
            )
            choices = factorized_top_k._write_rows(choices, ch, off)
            off += batch.shape[0]
        leaf_of, slot_of, unplaced = _pack_assign_device(
            choices, num_leaves, capacity
        )
        if int(unplaced) > 0:
            raise ValueError(
                f"{int(unplaced)} rows could not be placed within their "
                f"{rounds} nearest leaves; increase `leaf_capacity`, "
                "`num_leaves`, or `spill_rounds`."
            )
        leaf_of_h = np.asarray(leaf_of)
        slot_of_h = np.asarray(slot_of)
        del choices, leaf_of, slot_of

        # Pass 3: quantize + scatter each batch into leaf storage.
        d = centroids.shape[1]
        rows_buf = jnp.full((num_leaves, capacity), -1, jnp.int32)
        valid_buf = jnp.zeros((num_leaves, capacity), bool)
        if self._quantize:
            bits = 4 if packed4 else 8
            code_cap = capacity // 2 if packed4 else capacity
            codes_buf = jnp.zeros((num_leaves, code_cap, d), jnp.int8)
            scales_buf = jnp.zeros((num_leaves, capacity), jnp.float32)
        else:
            codes_buf = jnp.zeros(
                (num_leaves, capacity, d), self._leaf_dtype
            )
            scales_buf = None
        off = 0
        for batch in factory():
            batch = jnp.asarray(batch).astype(jnp.float32)
            b = batch.shape[0]
            leaf_b = jnp.asarray(leaf_of_h[off:off + b])
            slot_b = jnp.asarray(slot_of_h[off:off + b])
            if self._quantize:
                codes_buf, scales_buf, rows_buf, valid_buf = (
                    _scatter_batch_quantized(
                        codes_buf, scales_buf, rows_buf, valid_buf,
                        batch, leaf_b, slot_b, jnp.int32(off),
                        threshold=self._anisotropic_threshold,
                        bits=bits, half=capacity // 2,
                    )
                )
            else:
                codes_buf, rows_buf, valid_buf = _scatter_batch(
                    codes_buf, rows_buf, valid_buf, batch, leaf_b,
                    slot_b, jnp.int32(off),
                )
            off += b

        self._centroids = centroids
        self._leaf_embs = codes_buf
        self._leaf_scales = scales_buf
        self._leaf_rows = rows_buf
        self._leaf_valid = valid_buf
        if identifiers is None:
            # Rows double as ids: `_search` gathers from `_leaf_ids`
            # (aliasing `_leaf_rows` costs nothing), the bucketed path
            # short-circuits on `_flat_ids=None`.
            self._leaf_ids = rows_buf
            self._flat_ids = None
        else:
            self._leaf_ids = _scatter_leaves(
                identifiers, jnp.asarray(leaf_of_h),
                jnp.asarray(slot_of_h), num_leaves, capacity,
            )
            self._flat_ids = (
                identifiers if self._scoring_buckets is not None
                else None
            )
        self._corpus = None
        self._identifiers = None
        self._num_candidates = num_rows
        self._built = True
        return self

    def __call__(
        self, queries: Array, k: Optional[int] = None
    ) -> Tuple[Array, Array]:
        if not self._built:
            raise ValueError(
                "The `index` method must be called first to "
                "create the retrieval index."
            )
        k = k if k is not None else self._k
        if self.query_fn is not None:
            queries = self.query_fn(queries)
        k = min(k, self._num_candidates)

        # Bound the probe-gather footprint: process query chunks of
        # `query_batch` (padded so one compiled shape serves all chunks).
        qn = queries.shape[0]
        qb = self._query_batch
        if qn > qb:
            padded_q = ((qn + qb - 1) // qb) * qb
            if padded_q != qn:
                queries = jnp.pad(
                    queries, ((0, padded_q - qn), (0, 0))
                )
            parts = [
                self._query_chunk(queries[i:i + qb], k)
                for i in range(0, padded_q, qb)
            ]
            scores = jnp.concatenate([p[0] for p in parts])[:qn]
            ids = jnp.concatenate([p[1] for p in parts])[:qn]
            return self._decode(scores, ids)
        return self._decode(*self._query_chunk(queries, k))

    def _query_chunk(
        self, queries: Array, k: int
    ) -> Tuple[Array, Array]:
        dedup = self._soar_lambda is not None
        shortlist = max(k, self._reorder_n) if self._reorder_n else k

        if self._scoring_buckets is not None:
            qn = queries.shape[0]
            tile = self._probe_tile
            pad = (-qn) % tile
            if pad:
                queries_p = jnp.pad(queries, ((0, pad), (0, 0)))
            else:
                queries_p = queries
            scores, ids, rows = _search_bucketed(
                queries_p, self._centroids, self._leaf_embs,
                self._leaf_scales, self._leaf_rows, self._flat_ids,
                self._num_probes, shortlist, self._quantize, dedup,
                self._scoring_buckets, tile,
            )
            if pad:
                scores, ids, rows = scores[:qn], ids[:qn], rows[:qn]
        else:
            scores, ids, rows = _search(
                queries, self._centroids, self._leaf_embs,
                self._leaf_scales, self._leaf_ids, self._leaf_rows,
                self._leaf_valid, self._num_probes, shortlist,
                self._quantize, dedup,
            )
        if self._reorder_n:
            return _reorder(
                queries, rows, scores, self._corpus, self._identifiers, k
            )
        if scores.shape[1] > k:
            scores, ids = scores[:, :k], ids[:, :k]
        return scores, ids

    def is_exact(self) -> bool:
        return False
