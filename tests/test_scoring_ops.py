"""Fused scoring kernel tests (CPU, Pallas interpret mode).

The bucketed kernel is validated against a pure-jnp oracle with identical
bucket semantics, and both against numpy brute force for recall bounds —
mirroring the reference's oracle-vs-numpy strategy for top-k layers
(`tensorflow_recommenders/layers/factorized_top_k_test.py:85-165`).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from recommenders_tpu.ops import scoring


def _data(n, d, q, seed=0):
    rng = np.random.RandomState(seed)
    corpus = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(q, d)).astype(np.float32)
    return jnp.asarray(queries), jnp.asarray(corpus)


def test_exact_top_k_matches_numpy():
    queries, corpus = _data(500, 128, 32)
    k = 10
    vals, ids = scoring.exact_top_k(queries, corpus, k)
    ref_scores = np.asarray(queries) @ np.asarray(corpus).T
    ref_ids = np.argsort(-ref_scores, axis=1)[:, :k]
    np.testing.assert_array_equal(np.asarray(ids), ref_ids)
    np.testing.assert_allclose(
        np.asarray(vals),
        np.take_along_axis(ref_scores, ref_ids, axis=1),
        rtol=1e-5,
    )


@pytest.mark.parametrize("n", [1024, 1000])  # Exact and padded corpora.
@pytest.mark.parametrize("q", [16, 20])  # Tile-aligned and ragged queries.
def test_bucketed_kernel_matches_oracle(n, q):
    queries, corpus = _data(n, 128, q)
    k, buckets, chunk = 10, 256, 512
    vals, ids = scoring.bucketed_top_k(
        queries, corpus, k, buckets=buckets, chunk=chunk, interpret=True
    )
    ref_vals, ref_ids = scoring.bucketed_top_k_reference(
        queries, corpus, k, buckets=buckets
    )
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(ref_vals), rtol=1e-5, atol=1e-5
    )


def test_bucketed_scores_are_exact_for_returned_ids():
    """Bucketing may drop candidates but never distorts a returned score."""
    queries, corpus = _data(2048, 128, 16)
    vals, ids = scoring.bucketed_top_k(
        queries, corpus, 20, buckets=512, chunk=512, interpret=True
    )
    full = np.asarray(queries) @ np.asarray(corpus).T
    np.testing.assert_allclose(
        np.asarray(vals),
        np.take_along_axis(full, np.asarray(ids), axis=1),
        rtol=1e-5,
        atol=1e-5,
    )


def test_bucketed_recall_tracks_bucket_count():
    """Recall@k improves with more buckets and beats the birthday bound."""
    queries, corpus = _data(8192, 128, 32, seed=1)
    k = 50
    _, exact_ids = scoring.exact_top_k(queries, corpus, k)
    exact_ids = np.asarray(exact_ids)

    recalls = {}
    for buckets in (512, 2048):
        _, ids = scoring.bucketed_top_k(
            queries, corpus, k, buckets=buckets, chunk=2048, interpret=True
        )
        ids = np.asarray(ids)
        recalls[buckets] = np.mean(
            [
                len(np.intersect1d(exact_ids[i], ids[i])) / k
                for i in range(ids.shape[0])
            ]
        )
    assert recalls[2048] >= recalls[512]
    # Expected recall ≈ 1 - k/(2B): B=2048 → ~0.988. Allow slack.
    assert recalls[2048] > 0.95, recalls
    assert recalls[512] > 0.85, recalls


def test_padding_rows_never_returned():
    queries, corpus = _data(700, 128, 8)  # Padded up to 1024 internally.
    _, ids = scoring.bucketed_top_k(
        queries, corpus, 700, buckets=1024, chunk=1024, interpret=True
    )
    assert np.asarray(ids).max() < 700


def test_shape_validation():
    queries, corpus = _data(512, 128, 8)
    with pytest.raises(ValueError, match="multiple of buckets"):
        scoring.bucketed_scores(queries, corpus, buckets=512, chunk=256)
    bad_q, bad_c = _data(512, 100, 8)
    with pytest.raises(ValueError, match="embedding dim"):
        scoring.bucketed_scores(bad_q, bad_c, buckets=256, chunk=512)


def test_quantized_bucketed_kernel_matches_oracle():
    from recommenders_tpu.ops import quantization

    queries, corpus = _data(1000, 128, 16, seed=6)
    scales, codes = quantization.quantize_rows_device(corpus, 0.2)
    k = 10
    vals, ids = scoring.bucketed_top_k(
        queries, codes, k, buckets=512, chunk=512, interpret=True,
        scales=scales,
    )
    rvals, rids = scoring.bucketed_top_k_reference(
        queries, codes, k, buckets=512, scales=scales
    )
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(rids))
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(rvals), rtol=1e-4, atol=1e-4
    )
    # Dequantized scores approximate the exact dot products.
    exact = np.asarray(queries) @ np.asarray(corpus).T
    got = np.take_along_axis(exact, np.asarray(ids), axis=1)
    np.testing.assert_allclose(np.asarray(vals), got, rtol=0.1, atol=0.5)


def test_bucketed_layer_quantized_recall():
    from recommenders_tpu.layers import factorized_top_k as ftk

    queries, corpus = _data(4000, 128, 32, seed=7)
    exact = np.asarray(queries) @ np.asarray(corpus).T
    exact_ids = np.argsort(-exact, axis=1)[:, :10]
    index = ftk.Bucketed(k=10, buckets=1024, quantize=True).index(corpus)
    _, ids = index(queries)
    overlap = np.mean(
        [
            len(np.intersect1d(exact_ids[i], np.asarray(ids)[i])) / 10
            for i in range(32)
        ]
    )
    assert overlap > 0.9, overlap
    with pytest.raises(ValueError, match="corpus_dtype"):
        ftk.Bucketed(quantize=True, corpus_dtype=jnp.bfloat16)
