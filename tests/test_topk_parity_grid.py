"""Combinatorial top-k parity grid across every index implementation.

Mirrors the reference's oracle-vs-numpy `test_cases()` generator
(`tensorflow_recommenders/layers/factorized_top_k_test.py:31-66,85-165`):
a grid over k × num_queries × num_candidates × identifier dtype ×
exclusions, run against BruteForce, Streaming (both modes),
ShardedBruteForce, Bucketed, and exact-configured ScaNN, all checked
against the same numpy argsort oracle.
"""

import itertools

import numpy as np
import pytest

import jax.numpy as jnp

from recommenders_tpu.layers import approximate, factorized_top_k
from recommenders_tpu.parallel import corpus as corpus_lib

DIM = 128  # Lane-aligned so Bucketed participates in the grid.


def _oracle(queries, candidates, identifiers, k, exclusions=None):
    scores = queries @ candidates.T
    if exclusions is not None:
        for r in range(queries.shape[0]):
            for ex in exclusions[r]:
                hits = np.where(identifiers == ex)[0]
                scores[r, hits] = -np.inf
    order = np.argsort(-scores, axis=1)[:, :k]
    return identifiers[order]


def _make_index(kind, k):
    if kind == "brute_force":
        return factorized_top_k.BruteForce(k=k)
    if kind == "streaming":
        return factorized_top_k.Streaming(k=k, chunk_size=128)
    if kind == "sharded":
        return corpus_lib.ShardedBruteForce(k=k)
    if kind == "bucketed_exact":
        # buckets >= candidates → bucketed selection is exact.
        return factorized_top_k.Bucketed(k=k, buckets=1024, chunk=1024)
    if kind == "scann_exact":
        return approximate.ScaNN(
            k=k, num_leaves=1, num_leaves_to_search=1
        )
    raise ValueError(kind)


GRID = list(
    itertools.product(
        ("brute_force", "streaming", "sharded", "bucketed_exact",
         "scann_exact"),
        (1, 5, 33),              # k
        (3, 16),                 # num_queries
        (200, 512, 1000),        # num_candidates (incl. ragged sizes)
    )
)


@pytest.mark.parametrize("kind,k,num_queries,num_candidates", GRID)
def test_index_matches_numpy_oracle(kind, k, num_queries, num_candidates):
    rng = np.random.RandomState(k * 1000 + num_queries + num_candidates)
    candidates = rng.normal(size=(num_candidates, DIM)).astype(np.float32)
    queries = rng.normal(size=(num_queries, DIM)).astype(np.float32)
    identifiers = (
        np.arange(num_candidates, dtype=np.int64) * 3 + 11
    )

    index = _make_index(kind, k)
    index.index(jnp.asarray(candidates), jnp.asarray(identifiers))
    scores, ids = index(jnp.asarray(queries))

    expected = _oracle(queries, candidates, identifiers, k)
    np.testing.assert_array_equal(np.asarray(ids), expected)
    # Scores are the true dot products of the returned candidates.
    full = queries @ candidates.T
    id_to_row = {int(v): i for i, v in enumerate(identifiers)}
    rows = np.vectorize(id_to_row.get)(np.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(scores),
        np.take_along_axis(full, rows, axis=1),
        rtol=2e-4,
        atol=2e-4,
    )


@pytest.mark.parametrize(
    "kind", ("brute_force", "streaming", "sharded", "bucketed_exact",
             "scann_exact")
)
@pytest.mark.parametrize("num_exclusions", (1, 4))
def test_query_with_exclusions_matches_oracle(kind, num_exclusions):
    rng = np.random.RandomState(7 + num_exclusions)
    num_candidates, num_queries, k = 300, 8, 10
    candidates = rng.normal(size=(num_candidates, DIM)).astype(np.float32)
    queries = rng.normal(size=(num_queries, DIM)).astype(np.float32)
    identifiers = np.arange(num_candidates, dtype=np.int64) + 5

    index = _make_index(kind, k)
    index.index(jnp.asarray(candidates), jnp.asarray(identifiers))
    base_scores, base_ids = index(jnp.asarray(queries))
    # Exclude each row's top results — the hardest case.
    exclusions = np.asarray(base_ids)[:, :num_exclusions]

    scores, ids = index.query_with_exclusions(
        jnp.asarray(queries), jnp.asarray(exclusions)
    )
    expected = _oracle(
        queries, candidates, identifiers, k, exclusions=exclusions
    )
    np.testing.assert_array_equal(np.asarray(ids), expected)


STRING_GRID = list(
    itertools.product(
        ("brute_force", "streaming", "sharded", "bucketed_exact",
         "scann_exact"),
        (1, 5),                  # k
        (200, 512),              # num_candidates
    )
)


@pytest.mark.parametrize("kind,k,num_candidates", STRING_GRID)
def test_index_with_string_identifiers_matches_oracle(
    kind, k, num_candidates
):
    """The reference's oracle grid runs `indices_dtype=str`
    (factorized_top_k_test.py:36,185-193); string ids here live
    host-side with device row positions, decoded on fetch."""
    rng = np.random.RandomState(k * 100 + num_candidates)
    candidates = rng.normal(size=(num_candidates, DIM)).astype(np.float32)
    queries = rng.normal(size=(5, DIM)).astype(np.float32)
    identifiers = np.asarray(
        [f"item-{i * 3 + 11}" for i in range(num_candidates)]
    )

    index = _make_index(kind, k)
    index.index(jnp.asarray(candidates), identifiers)
    scores, ids = index(jnp.asarray(queries))
    assert isinstance(ids, np.ndarray) and ids.dtype.kind == "U"

    expected = _oracle(queries, candidates, identifiers, k)
    np.testing.assert_array_equal(ids, expected)


@pytest.mark.parametrize(
    "kind", ("brute_force", "streaming", "sharded", "bucketed_exact",
             "scann_exact")
)
def test_string_exclusions_match_oracle(kind):
    rng = np.random.RandomState(23)
    num_candidates, k = 300, 10
    candidates = rng.normal(size=(num_candidates, DIM)).astype(np.float32)
    queries = rng.normal(size=(6, DIM)).astype(np.float32)
    identifiers = np.asarray([f"m{i}" for i in range(num_candidates)])

    index = _make_index(kind, k)
    index.index(jnp.asarray(candidates), identifiers)
    _, base_ids = index(jnp.asarray(queries))
    exclusions = np.asarray(base_ids)[:, :3]

    scores, ids = index.query_with_exclusions(
        jnp.asarray(queries), exclusions
    )
    expected = _oracle(
        queries, candidates, identifiers, k, exclusions=exclusions
    )
    np.testing.assert_array_equal(np.asarray(ids), expected)


def test_string_ids_from_dataset_and_streamed_query():
    """(string ids, embeddings) dataset batches: eager concat build and
    Streaming's host-streamed query path both decode."""
    rng = np.random.RandomState(5)
    candidates = rng.normal(size=(700, DIM)).astype(np.float32)
    queries = rng.normal(size=(4, DIM)).astype(np.float32)
    names = np.asarray([f"movie/{i}" for i in range(700)])
    batches = [
        (names[i:i + 128], jnp.asarray(candidates[i:i + 128]))
        for i in range(0, 700, 128)
    ]
    expected = _oracle(queries, candidates, names, 15)

    bf = factorized_top_k.BruteForce(k=15).index_from_dataset(batches)
    _, ids = bf(jnp.asarray(queries))
    np.testing.assert_array_equal(np.asarray(ids), expected)

    st = factorized_top_k.Streaming(k=15)
    st.index_from_dataset(lambda: iter(batches))
    _, ids = st(jnp.asarray(queries))
    np.testing.assert_array_equal(np.asarray(ids), expected)


def test_scann_string_ids_export_roundtrip(tmp_path):
    """String-identified ScaNN: query → export → load → query returns
    the same strings (the id table persists as identifiers.json)."""
    from recommenders_tpu.utils import export as export_lib

    rng = np.random.RandomState(9)
    candidates = rng.normal(size=(512, DIM)).astype(np.float32)
    queries = rng.normal(size=(4, DIM)).astype(np.float32)
    names = np.asarray([f"doc:{i:04d}" for i in range(512)])

    index = approximate.ScaNN(
        k=10, num_leaves=1, num_leaves_to_search=1
    ).index(jnp.asarray(candidates), names)
    scores, ids = index(jnp.asarray(queries))
    expected = _oracle(queries, candidates, names, 10)
    np.testing.assert_array_equal(np.asarray(ids), expected)

    path = str(tmp_path / "scann_str")
    export_lib.export_index(path, index, jnp.asarray(queries), k=10)
    serve = export_lib.load_index(path)
    s2, ids2 = serve(jnp.asarray(queries))
    assert ids2.dtype.kind == "U"
    np.testing.assert_array_equal(ids2, np.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(s2), np.asarray(scores), rtol=1e-5
    )


def test_streaming_host_mode_in_grid():
    """Host-streamed Streaming (dataset mode) against the same oracle."""
    rng = np.random.RandomState(3)
    candidates = rng.normal(size=(700, DIM)).astype(np.float32)
    queries = rng.normal(size=(6, DIM)).astype(np.float32)
    index = factorized_top_k.Streaming(k=25)
    index.index_from_dataset(
        lambda: (candidates[i:i + 128] for i in range(0, 700, 128))
    )
    _, ids = index(jnp.asarray(queries))
    expected = _oracle(
        queries, candidates, np.arange(700, dtype=np.int32), 25
    )
    np.testing.assert_array_equal(np.asarray(ids), expected)


def test_streamed_dataset_string_exclusions_first_call():
    """query_with_exclusions with STRING exclusions as the very first
    query on a host-streamed dataset index: the string id table is
    only discovered during the stream, so the query must run (decode
    suppressed) before exclusions encode."""
    rng = np.random.RandomState(11)
    candidates = rng.normal(size=(500, DIM)).astype(np.float32)
    queries = rng.normal(size=(4, DIM)).astype(np.float32)
    names = np.asarray([f"n{i}" for i in range(500)])
    batches = [
        (names[i:i + 128], jnp.asarray(candidates[i:i + 128]))
        for i in range(0, 500, 128)
    ]
    st = factorized_top_k.Streaming(k=10)
    st.index_from_dataset(lambda: iter(batches))
    # Exclusions = the true top-2 per row, computed independently.
    top2 = _oracle(queries, candidates, names, 2)
    scores, ids = st.query_with_exclusions(jnp.asarray(queries), top2)
    expected = _oracle(queries, candidates, names, 10, exclusions=top2)
    np.testing.assert_array_equal(np.asarray(ids), expected)
