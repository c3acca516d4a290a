"""ScaNN streamed partitioned build vs the one-shot device build.

With a full-corpus training sample the streamed build must reproduce
the one-shot `_index_device` build EXACTLY (same centroids, same
packing, same per-row quantization — every stage is row-local or
seed-deterministic), so query results are asserted bitwise equal.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from recommenders_tpu.layers import approximate


def _clustered(n, d, q, seed=0, clusters=16, noise=0.3):
    rng = np.random.RandomState(seed)
    centers = rng.normal(size=(clusters, d)).astype(np.float32)
    corpus = centers[rng.randint(0, clusters, n)] + noise * rng.normal(
        size=(n, d)
    ).astype(np.float32)
    queries = centers[rng.randint(0, clusters, q)] + noise * rng.normal(
        size=(q, d)
    ).astype(np.float32)
    return jnp.asarray(queries), jnp.asarray(corpus)


def _params(n, **kw):
    base = dict(
        k=20, num_leaves=32, num_leaves_to_search=8,
        training_iterations=4, seed=0, query_batch=64,
        kmeans_sample_size=n,  # full sample → bitwise build parity
    )
    base.update(kw)
    return base


def _batches(corpus, batch):
    def factory():
        for i in range(0, corpus.shape[0], batch):
            yield corpus[i:i + batch]

    return factory


@pytest.mark.parametrize("quantize", [False, "int8", "int4"])
def test_streamed_build_matches_one_shot(quantize):
    n = 3000
    queries, corpus = _clustered(n, 128, 16)
    one_shot = approximate.ScaNN(**_params(n, quantize=quantize))
    one_shot.index(corpus)
    streamed = approximate.ScaNN(**_params(n, quantize=quantize))
    streamed.index_streamed(_batches(corpus, 700), num_rows=n)

    np.testing.assert_array_equal(
        np.asarray(one_shot._centroids), np.asarray(streamed._centroids)
    )
    np.testing.assert_array_equal(
        np.asarray(one_shot._leaf_embs), np.asarray(streamed._leaf_embs)
    )
    np.testing.assert_array_equal(
        np.asarray(one_shot._leaf_rows), np.asarray(streamed._leaf_rows)
    )
    if quantize:
        np.testing.assert_array_equal(
            np.asarray(one_shot._leaf_scales),
            np.asarray(streamed._leaf_scales),
        )
    ws, wi = one_shot(queries)
    gs, gi = streamed(queries)
    np.testing.assert_array_equal(np.asarray(wi), np.asarray(gi))
    np.testing.assert_array_equal(np.asarray(ws), np.asarray(gs))


def test_streamed_identifiers_and_rows_as_ids():
    n = 2000
    queries, corpus = _clustered(n, 128, 8, seed=1)
    ids = jnp.asarray(np.arange(n, dtype=np.int32) * 5 + 2)
    with_ids = approximate.ScaNN(**_params(n, quantize="int8"))
    with_ids.index_streamed(_batches(corpus, 512), n, identifiers=ids)
    rows_as_ids = approximate.ScaNN(**_params(n, quantize="int8"))
    rows_as_ids.index_streamed(_batches(corpus, 512), n)
    _, gi = with_ids(queries)
    _, ri = rows_as_ids(queries)
    np.testing.assert_array_equal(
        np.asarray(gi), np.asarray(ri) * 5 + 2
    )


def test_streamed_bucketed_scoring_path():
    n = 2000
    queries, corpus = _clustered(n, 128, 8, seed=2)
    index = approximate.ScaNN(
        **_params(n, quantize="int8", scoring_buckets=128)
    )
    index.index_streamed(_batches(corpus, 512), n)
    assert index._flat_ids is None  # rows double as ids
    scores, ids = index(queries, k=10)
    assert scores.shape == (8, 10)
    assert int(jnp.max(ids)) < n


def test_streamed_rejects_soar_reorder_and_bad_counts():
    n = 1000
    _, corpus = _clustered(n, 128, 4, seed=3)
    with pytest.raises(ValueError, match="soar"):
        approximate.ScaNN(
            **_params(n, soar_lambda=1.0)
        ).index_streamed(_batches(corpus, 500), n)
    with pytest.raises(ValueError, match="reorder"):
        approximate.ScaNN(
            **_params(n, num_reordering_candidates=40)
        ).index_streamed(_batches(corpus, 500), n)
    with pytest.raises(ValueError, match="num_rows"):
        approximate.ScaNN(**_params(n)).index_streamed(
            _batches(corpus, 500), n + 7
        )
