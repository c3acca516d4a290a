"""Oracle tests for the retrieval index layers.

Mirrors the reference's combinatorial oracle strategy
(`layers/factorized_top_k_test.py:31-66,85-165`): every index layer is
validated against `np.argsort` ground truth over a grid of k, query count,
corpus size and exclusion settings.
"""

import itertools

import numpy as np
import pytest

import jax.numpy as jnp

from recommenders_tpu.layers import factorized_top_k


def _ground_truth(scores, k):
    """Top-k (scores, indices) by full sort, ties broken by index."""
    order = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, order, axis=1), order


def _make_data(num_queries, num_candidates, dim=16, seed=0):
    rng = np.random.RandomState(seed)
    queries = rng.normal(size=(num_queries, dim)).astype(np.float32)
    candidates = rng.normal(size=(num_candidates, dim)).astype(np.float32)
    return queries, candidates


GRID = list(
    itertools.product(
        [1, 5, 10],  # k
        [3, 16],  # num_queries
        [100, 1024, 1200],  # num_candidates
    )
)


@pytest.mark.parametrize("k,num_queries,num_candidates", GRID)
def test_brute_force_matches_numpy(k, num_queries, num_candidates):
    queries, candidates = _make_data(num_queries, num_candidates)
    index = factorized_top_k.BruteForce(k=k).index(jnp.asarray(candidates))
    scores, ids = index(jnp.asarray(queries))

    exp_scores, exp_ids = _ground_truth(queries @ candidates.T, k)
    np.testing.assert_allclose(np.asarray(scores), exp_scores, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(ids), exp_ids)


@pytest.mark.parametrize("k,num_queries,num_candidates", GRID)
def test_streaming_on_device_matches_numpy(k, num_queries, num_candidates):
    queries, candidates = _make_data(num_queries, num_candidates, seed=1)
    index = factorized_top_k.Streaming(k=k, chunk_size=256).index(
        jnp.asarray(candidates)
    )
    scores, ids = index(jnp.asarray(queries))

    exp_scores, _ = _ground_truth(queries @ candidates.T, k)
    np.testing.assert_allclose(np.asarray(scores), exp_scores, rtol=1e-4)
    # Ids must score identically to ground truth (tie-robust check).
    got_scores = np.take_along_axis(
        queries @ candidates.T, np.asarray(ids), axis=1
    )
    np.testing.assert_allclose(got_scores, exp_scores, rtol=1e-4)


def test_streaming_host_batches_matches_numpy():
    queries, candidates = _make_data(8, 1000, seed=2)
    batches = [candidates[i : i + 128] for i in range(0, 1000, 128)]

    index = factorized_top_k.Streaming(k=10).index_from_dataset(
        lambda: iter(batches)
    )
    scores, ids = index(jnp.asarray(queries))

    exp_scores, exp_ids = _ground_truth(queries @ candidates.T, 10)
    np.testing.assert_allclose(np.asarray(scores), exp_scores, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(ids), exp_ids)


def test_streaming_host_batches_with_identifiers():
    queries, candidates = _make_data(4, 512, seed=3)
    identifiers = np.arange(512)[::-1].copy()  # Reversed ids.
    batches = [
        (identifiers[i : i + 64], candidates[i : i + 64])
        for i in range(0, 512, 64)
    ]

    index = factorized_top_k.Streaming(k=7).index_from_dataset(
        lambda: iter(batches)
    )
    scores, ids = index(jnp.asarray(queries))

    exp_scores, exp_idx = _ground_truth(queries @ candidates.T, 7)
    np.testing.assert_allclose(np.asarray(scores), exp_scores, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(ids), identifiers[exp_idx])


def test_brute_force_with_custom_identifiers():
    queries, candidates = _make_data(5, 200, seed=4)
    identifiers = (np.arange(200) * 3 + 7).astype(np.int64)
    index = factorized_top_k.BruteForce(k=5).index(
        jnp.asarray(candidates), jnp.asarray(identifiers)
    )
    _, ids = index(jnp.asarray(queries))
    _, exp_idx = _ground_truth(queries @ candidates.T, 5)
    np.testing.assert_array_equal(np.asarray(ids), identifiers[exp_idx])


@pytest.mark.parametrize(
    "layer_fn",
    [
        lambda k: factorized_top_k.BruteForce(k=k),
        lambda k: factorized_top_k.Streaming(k=k, chunk_size=128),
    ],
)
def test_query_with_exclusions(layer_fn):
    queries, candidates = _make_data(6, 300, seed=5)
    k = 8
    index = layer_fn(k).index(jnp.asarray(candidates))

    # Exclude each query's top-2 results.
    base_scores, base_ids = index(jnp.asarray(queries), k=2)
    exclusions = np.asarray(base_ids)

    scores, ids = index.query_with_exclusions(
        jnp.asarray(queries), exclusions=jnp.asarray(exclusions)
    )
    assert scores.shape == (6, k)

    full = queries @ candidates.T
    for i in range(6):
        masked = full[i].copy()
        masked[exclusions[i]] = -np.inf
        exp_ids = np.argsort(-masked, kind="stable")[:k]
        got = set(np.asarray(ids)[i].tolist())
        assert got == set(exp_ids.tolist())
        # Excluded ids must not appear.
        assert not (got & set(exclusions[i].tolist()))


def test_index_from_dataset_plain_and_tuples():
    queries, candidates = _make_data(3, 256, seed=6)
    plain = [jnp.asarray(candidates[i : i + 64]) for i in range(0, 256, 64)]
    index = factorized_top_k.BruteForce(k=4).index_from_dataset(plain)
    scores, _ = index(jnp.asarray(queries))
    exp_scores, _ = _ground_truth(queries @ candidates.T, 4)
    np.testing.assert_allclose(np.asarray(scores), exp_scores, rtol=1e-4)


def test_query_before_index_raises():
    with pytest.raises(ValueError, match="index"):
        factorized_top_k.BruteForce(k=5)(jnp.zeros((2, 4)))
    with pytest.raises(ValueError, match="index"):
        factorized_top_k.Streaming(k=5)(jnp.zeros((2, 4)))


def test_query_fn_applied():
    queries, candidates = _make_data(4, 128, seed=7)
    proj = np.eye(16, dtype=np.float32) * 2.0
    index = factorized_top_k.BruteForce(
        query_fn=lambda q: q @ jnp.asarray(proj), k=3
    ).index(jnp.asarray(candidates))
    scores, _ = index(jnp.asarray(queries))
    exp_scores, _ = _ground_truth((queries @ proj) @ candidates.T, 3)
    np.testing.assert_allclose(np.asarray(scores), exp_scores, rtol=1e-4)
