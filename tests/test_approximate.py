"""ScaNN-equivalent approximate index tests.

Mirrors the reference's strategy of making ScaNN exact for oracle testing
(num_leaves=1, `tensorflow_recommenders/layers/factorized_top_k_test.py:
249-258`), plus recall/quantization/reorder behavior checks.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from recommenders_tpu.layers import approximate
from recommenders_tpu.ops import scoring


def _data(n, d, q, seed=0):
    rng = np.random.RandomState(seed)
    return (
        rng.normal(size=(q, d)).astype(np.float32),
        rng.normal(size=(n, d)).astype(np.float32),
    )


def test_single_leaf_is_exact():
    queries, corpus = _data(500, 32, 16)
    index = approximate.ScaNN(k=10, num_leaves=1, num_leaves_to_search=1)
    index.index(jnp.asarray(corpus))
    scores, ids = index(jnp.asarray(queries))
    ref = corpus @ queries.T
    ref_ids = np.argsort(-corpus @ queries.T, axis=0)[:10].T
    np.testing.assert_array_equal(np.asarray(ids), ref_ids)
    full = queries @ corpus.T
    np.testing.assert_allclose(
        np.asarray(scores),
        np.take_along_axis(full, ref_ids, axis=1),
        rtol=1e-4,
        atol=1e-4,
    )


def test_partitioned_recall_beats_probe_fraction():
    """Probing 8/64 leaves must recall far more than 12.5% of true top-k
    (k-means clusters aligned queries with their neighbors)."""
    rng = np.random.RandomState(0)
    # Clustered corpus so partitioning is meaningful.
    centers = rng.normal(scale=4.0, size=(32, 32)).astype(np.float32)
    corpus = (
        centers[rng.randint(0, 32, 4000)]
        + rng.normal(size=(4000, 32)).astype(np.float32)
    )
    queries = (
        centers[rng.randint(0, 32, 64)]
        + rng.normal(size=(64, 32)).astype(np.float32)
    )
    k = 10
    _, exact_ids = scoring.exact_top_k(
        jnp.asarray(queries), jnp.asarray(corpus), k
    )
    index = approximate.ScaNN(
        k=k, num_leaves=64, num_leaves_to_search=8, training_iterations=5
    )
    index.index(jnp.asarray(corpus))
    _, ids = index(jnp.asarray(queries))
    recall = np.mean(
        [
            len(np.intersect1d(np.asarray(exact_ids)[i], np.asarray(ids)[i]))
            / k
            for i in range(queries.shape[0])
        ]
    )
    assert recall > 0.8, recall


def test_quantized_with_reorder_recovers_exact_scores():
    queries, corpus = _data(2000, 64, 32, seed=1)
    index = approximate.ScaNN(
        k=10,
        num_leaves=1,
        num_leaves_to_search=1,
        quantize=True,
        num_reordering_candidates=50,
    )
    index.index(jnp.asarray(corpus))
    scores, ids = index(jnp.asarray(queries))
    full = queries @ corpus.T
    # Reordered scores are exact dot products of whatever was returned.
    np.testing.assert_allclose(
        np.asarray(scores),
        np.take_along_axis(full, np.asarray(ids), axis=1),
        rtol=1e-4,
        atol=1e-4,
    )
    # And with a 5x shortlist over a single leaf, ids match exact top-k.
    ref_ids = np.argsort(-full, axis=1)[:, :10]
    match = np.mean(np.asarray(ids) == ref_ids)
    assert match > 0.95, match


def test_quantization_error_is_small():
    queries, corpus = _data(1000, 64, 16, seed=2)
    exact = approximate.ScaNN(k=10, num_leaves=1, num_leaves_to_search=1)
    exact.index(jnp.asarray(corpus))
    quant = approximate.ScaNN(
        k=10, num_leaves=1, num_leaves_to_search=1, quantize=True
    )
    quant.index(jnp.asarray(corpus))
    es, eids = exact(jnp.asarray(queries))
    qs, qids = quant(jnp.asarray(queries))
    overlap = np.mean(
        [
            len(np.intersect1d(np.asarray(eids)[i], np.asarray(qids)[i]))
            / 10
            for i in range(16)
        ]
    )
    assert overlap > 0.9, overlap
    np.testing.assert_allclose(
        np.asarray(qs), np.asarray(es), rtol=0.05, atol=0.5
    )


def test_custom_identifiers_and_exclusions():
    queries, corpus = _data(300, 32, 8, seed=3)
    identifiers = (np.arange(300, dtype=np.int64) * 7 + 3)
    index = approximate.ScaNN(k=5, num_leaves=1, num_leaves_to_search=1)
    index.index(jnp.asarray(corpus), jnp.asarray(identifiers))
    scores, ids = index(jnp.asarray(queries))
    assert set(np.asarray(ids).ravel()) <= set(identifiers)

    exclusions = np.asarray(ids)[:, :2]
    ex_scores, ex_ids = index.query_with_exclusions(
        jnp.asarray(queries), jnp.asarray(exclusions), k=5
    )
    for i in range(8):
        assert not set(np.asarray(ex_ids)[i]) & set(exclusions[i])


def test_index_from_dataset_batches():
    queries, corpus = _data(512, 32, 4, seed=4)
    batches = [
        (
            jnp.arange(i, i + 128, dtype=jnp.int32),
            jnp.asarray(corpus[i:i + 128]),
        )
        for i in range(0, 512, 128)
    ]
    index = approximate.ScaNN(k=10, num_leaves=1, num_leaves_to_search=1)
    index.index_from_dataset(batches)
    _, ids = index(jnp.asarray(queries))
    ref_ids = np.argsort(-(queries @ corpus.T), axis=1)[:, :10]
    np.testing.assert_array_equal(np.asarray(ids), ref_ids)


def test_is_exact_and_unbuilt_error():
    index = approximate.ScaNN()
    assert not index.is_exact()
    with pytest.raises(ValueError, match="index"):
        index(jnp.zeros((2, 8)))


def test_query_chunking_matches_unchunked():
    queries, corpus = _data(2000, 64, 50, seed=5)
    kwargs = dict(k=10, num_leaves=20, num_leaves_to_search=5, seed=3)
    chunked = approximate.ScaNN(query_batch=16, **kwargs)
    whole = approximate.ScaNN(query_batch=512, **kwargs)
    chunked.index(jnp.asarray(corpus))
    whole.index(jnp.asarray(corpus))
    cs, ci = chunked(jnp.asarray(queries))
    ws, wi = whole(jnp.asarray(queries))
    np.testing.assert_array_equal(np.asarray(ci), np.asarray(wi))
    np.testing.assert_allclose(
        np.asarray(cs), np.asarray(ws), rtol=1e-5, atol=1e-5
    )


def test_pack_assign_device_places_all_rows_uniquely():
    rng = np.random.RandomState(7)
    corpus = rng.normal(size=(3000, 16)).astype(np.float32)
    centroids = approximate.kmeans(corpus, 24, iterations=4)
    choices = approximate._topr_assign_device(
        jnp.asarray(corpus), jnp.asarray(centroids), 8, 1024
    )
    capacity = approximate._round_up(int(np.ceil(1.3 * 3000 / 24)), 128)
    leaf_of, slot_of, unplaced = approximate._pack_assign_device(
        np.asarray(choices), 24, capacity
    )
    leaf_of, slot_of = np.asarray(leaf_of), np.asarray(slot_of)
    assert int(unplaced) == 0
    assert (leaf_of < 24).all() and (slot_of < capacity).all()
    # Every row landed in a distinct (leaf, slot) cell.
    cells = leaf_of.astype(np.int64) * capacity + slot_of
    assert len(np.unique(cells)) == 3000
    # Rows were placed in one of their R candidate leaves.
    assert (leaf_of[:, None] == np.asarray(choices)).any(axis=1).all()


def test_pack_assign_device_spills_on_tight_capacity():
    # 256 rows, 2 leaves, capacity 128: a skewed assignment must spill
    # overflow to the other leaf, filling both exactly.
    rng = np.random.RandomState(1)
    corpus = np.concatenate(
        [
            rng.normal(loc=5.0, size=(200, 8)),
            rng.normal(loc=-5.0, size=(56, 8)),
        ]
    ).astype(np.float32)
    centroids = np.stack(
        [corpus[:200].mean(0), corpus[200:].mean(0)]
    ).astype(np.float32)
    choices = approximate._topr_assign_device(
        jnp.asarray(corpus), jnp.asarray(centroids), 2, 1024
    )
    leaf_of, slot_of, unplaced = approximate._pack_assign_device(
        np.asarray(choices), 2, 128
    )
    assert int(unplaced) == 0
    counts = np.bincount(np.asarray(leaf_of), minlength=2)
    assert counts.tolist() == [128, 128]


def test_quantize_rows_device_matches_host():
    rng = np.random.RandomState(3)
    v = rng.normal(size=(64, 32)).astype(np.float32)
    for thresh in (None, 0.2):
        hs, hq = approximate._quantize_rows(v, thresh)
        ds, dq = approximate._quantize_rows_device(jnp.asarray(v), thresh)
        np.testing.assert_allclose(
            np.asarray(ds), hs, rtol=1e-5, atol=1e-7
        )
        # Compare dequantized values (rounding ties may flip a code by
        # one count between numpy and XLA float paths).
        np.testing.assert_allclose(
            np.asarray(dq) * np.asarray(ds)[:, None],
            hq * hs[:, None],
            atol=float(np.max(hs)) * 1.01,
        )


def test_device_build_recall_matches_host_build():
    rng = np.random.RandomState(5)
    centers = rng.normal(scale=4.0, size=(32, 32)).astype(np.float32)
    corpus = (
        centers[rng.randint(0, 32, 4000)]
        + rng.normal(size=(4000, 32)).astype(np.float32)
    )
    queries = (
        centers[rng.randint(0, 32, 64)]
        + rng.normal(size=(64, 32)).astype(np.float32)
    )
    k = 10
    _, exact_ids = scoring.exact_top_k(
        jnp.asarray(queries), jnp.asarray(corpus), k
    )

    def recall(index):
        _, ids = index(jnp.asarray(queries))
        return np.mean(
            [
                len(np.intersect1d(
                    np.asarray(exact_ids)[i], np.asarray(ids)[i]
                )) / k
                for i in range(queries.shape[0])
            ]
        )

    kwargs = dict(
        k=k, num_leaves=64, num_leaves_to_search=8,
        training_iterations=5, quantize=True, seed=2,
    )
    host = approximate.ScaNN(**kwargs).index(corpus)  # numpy → host path
    dev = approximate.ScaNN(**kwargs).index(jnp.asarray(corpus))
    r_host, r_dev = recall(host), recall(dev)
    assert r_dev > 0.8, r_dev
    assert abs(r_dev - r_host) < 0.1, (r_host, r_dev)


def test_device_build_with_kmeans_sample():
    queries, corpus = _data(2000, 32, 16, seed=9)
    index = approximate.ScaNN(
        k=10, num_leaves=16, num_leaves_to_search=16,
        kmeans_sample_size=500,
    ).index(jnp.asarray(corpus))
    # Probing every leaf must be exact regardless of centroid quality.
    _, ids = index(jnp.asarray(queries))
    ref_ids = np.argsort(-(queries @ corpus.T), axis=1)[:, :10]
    np.testing.assert_array_equal(np.asarray(ids), ref_ids)


def test_pack_assign_device_fallback_fills_global_capacity():
    # All rows nearest to leaf 0, capacity forces distribution across
    # every leaf: the fallback round must still place all rows.
    rng = np.random.RandomState(11)
    corpus = rng.normal(loc=3.0, scale=0.1, size=(512, 8)).astype(
        np.float32
    )
    centroids = np.concatenate(
        [corpus[:1], rng.normal(size=(7, 8))]
    ).astype(np.float32)
    choices = approximate._topr_assign_device(
        jnp.asarray(corpus), jnp.asarray(centroids), 2, 1024
    )
    leaf_of, slot_of, unplaced = approximate._pack_assign_device(
        np.asarray(choices), 8, 64
    )
    assert int(unplaced) == 0
    counts = np.bincount(np.asarray(leaf_of), minlength=8)
    assert counts.sum() == 512 and counts.max() <= 64
    cells = np.asarray(leaf_of).astype(np.int64) * 64 + np.asarray(
        slot_of
    )
    assert len(np.unique(cells)) == 512


def test_pack_assign_device_reports_true_shortage():
    choices = jnp.zeros((100, 1), jnp.int32)
    _, _, unplaced = approximate._pack_assign_device(choices, 1, 64)
    assert int(unplaced) == 36


def test_bf16_leaves_match_f32_recall():
    """bf16 leaf storage: exact ids when all leaves are probed (ties
    aside), scores within bf16 precision of the f32 path."""
    queries, corpus = _data(2000, 64, 32, seed=13)
    f32 = approximate.ScaNN(
        k=10, num_leaves=16, num_leaves_to_search=16,
        training_iterations=3,
    ).index(jnp.asarray(corpus))
    bf16 = approximate.ScaNN(
        k=10, num_leaves=16, num_leaves_to_search=16,
        training_iterations=3, leaf_dtype=jnp.bfloat16,
    ).index(jnp.asarray(corpus))
    assert bf16._leaf_embs.dtype == jnp.bfloat16
    s32, i32 = f32(jnp.asarray(queries))
    s16, i16 = bf16(jnp.asarray(queries))
    # bf16 rounding may flip near-ties; demand near-total agreement.
    assert np.mean(np.asarray(i16) == np.asarray(i32)) > 0.95
    np.testing.assert_allclose(
        np.asarray(s16), np.asarray(s32), rtol=2e-2, atol=5e-2
    )


def test_bf16_reorder_matches_f32_ids():
    """bf16 reorder corpus: same ids as f32 reorder up to bf16 near-ties,
    scores within bf16 precision of exact dots."""
    queries, corpus = _data(3000, 64, 32, seed=14)
    kwargs = dict(
        k=10, num_leaves=16, num_leaves_to_search=8, quantize=True,
        num_reordering_candidates=60, training_iterations=3,
    )
    f32 = approximate.ScaNN(**kwargs).index(jnp.asarray(corpus))
    bf16 = approximate.ScaNN(
        reorder_dtype=jnp.bfloat16, **kwargs
    ).index(jnp.asarray(corpus))
    assert bf16._corpus.dtype == jnp.bfloat16
    _, i32 = f32(jnp.asarray(queries))
    s16, i16 = bf16(jnp.asarray(queries))
    assert np.mean(np.asarray(i16) == np.asarray(i32)) > 0.9
    full = queries @ corpus.T
    approx = np.take_along_axis(full, np.asarray(i16), axis=1)
    np.testing.assert_allclose(
        np.asarray(s16), approx, rtol=2e-2, atol=8e-2
    )


def test_host_build_honors_leaf_and_reorder_dtypes():
    queries, corpus = _data(500, 32, 8, seed=15)
    index = approximate.ScaNN(
        k=5, num_leaves=4, num_leaves_to_search=4,
        leaf_dtype=jnp.bfloat16, reorder_dtype=jnp.bfloat16,
        num_reordering_candidates=20, training_iterations=2,
    ).index(corpus)  # numpy input → host build path
    assert index._leaf_embs.dtype == jnp.bfloat16
    assert index._corpus.dtype == jnp.bfloat16
    _, ids = index(jnp.asarray(queries))
    ref_ids = np.argsort(-(queries @ corpus.T), axis=1)[:, :5]
    assert np.mean(np.asarray(ids) == ref_ids) > 0.9


def test_dtype_validation():
    with pytest.raises(ValueError, match="leaf_dtype"):
        approximate.ScaNN(leaf_dtype=jnp.int8)
    with pytest.raises(ValueError, match="reorder_dtype"):
        approximate.ScaNN(reorder_dtype=jnp.float16)
    with pytest.raises(ValueError, match="quantize"):
        approximate.ScaNN(quantize=True, leaf_dtype=jnp.bfloat16)


def _clustered(n, q, d=32, num_centers=64, seed=0):
    rng = np.random.RandomState(seed)
    centers = rng.normal(scale=4.0, size=(num_centers, d)).astype(
        np.float32
    )
    corpus = (
        centers[rng.randint(0, num_centers, n)]
        + rng.normal(size=(n, d)).astype(np.float32)
    )
    queries = (
        centers[rng.randint(0, num_centers, q)]
        + rng.normal(size=(q, d)).astype(np.float32)
    )
    return queries, corpus


def test_soar_improves_recall_at_fixed_probes():
    """SOAR double assignment must lift recall at the same probe count
    (the whole point of the spilled copies), with no duplicate ids."""
    queries, corpus = _clustered(8000, 128)
    k = 10
    _, exact_ids = scoring.exact_top_k(
        jnp.asarray(queries), jnp.asarray(corpus), k
    )
    exact_ids = np.asarray(exact_ids)

    def recall(ids):
        return np.mean([
            len(np.intersect1d(exact_ids[i], np.asarray(ids)[i])) / k
            for i in range(queries.shape[0])
        ])

    recalls = {}
    for lam in (None, 1.5):
        index = approximate.ScaNN(
            k=k, num_leaves=64, num_leaves_to_search=2,
            training_iterations=5, soar_lambda=lam,
        ).index(jnp.asarray(corpus))
        _, ids = index(jnp.asarray(queries))
        ids_np = np.asarray(ids)
        assert all(
            len(set(r.tolist())) == len(r) for r in ids_np
        ), "duplicate ids in SOAR results"
        recalls[lam] = recall(ids)
    assert recalls[1.5] > recalls[None], recalls


def test_soar_exact_when_all_leaves_probed():
    """With every leaf probed, SOAR + dedup must return the exact top-k
    (the duplicate copies collapse to one hit per row)."""
    queries, corpus = _data(1000, 32, 16, seed=17)
    index = approximate.ScaNN(
        k=10, num_leaves=8, num_leaves_to_search=8, soar_lambda=1.0,
        training_iterations=3,
    ).index(jnp.asarray(corpus))
    _, ids = index(jnp.asarray(queries))
    ref_ids = np.argsort(-(queries @ corpus.T), axis=1)[:, :10]
    np.testing.assert_array_equal(np.asarray(ids), ref_ids)


def test_soar_with_quantize_and_reorder():
    queries, corpus = _clustered(4000, 64, seed=3)
    index = approximate.ScaNN(
        k=10, num_leaves=64, num_leaves_to_search=8, soar_lambda=1.5,
        quantize=True, num_reordering_candidates=40,
        training_iterations=5,
    ).index(jnp.asarray(corpus))
    scores, ids = index(jnp.asarray(queries))
    ids_np = np.asarray(ids)
    assert all(len(set(r.tolist())) == len(r) for r in ids_np)
    # Reordered scores are exact dots of whatever was returned.
    full = queries @ corpus.T
    np.testing.assert_allclose(
        np.asarray(scores),
        np.take_along_axis(full, ids_np, axis=1),
        rtol=1e-4, atol=1e-4,
    )


def test_soar_validation():
    with pytest.raises(ValueError, match="soar_lambda"):
        approximate.ScaNN(soar_lambda=-1.0)


def test_bucketed_scoring_near_exact_when_all_probed():
    """scoring_buckets path: with all leaves probed and many more
    buckets than k, the per-bucket argmax loses only rare collisions
    among the true top-k (same trade as the `Bucketed` full scan)."""
    queries, corpus = _data(800, 128, 16, seed=19)
    index = approximate.ScaNN(
        k=10, num_leaves=4, num_leaves_to_search=4,
        scoring_buckets=1024, training_iterations=3,
    ).index(jnp.asarray(corpus))
    scores, ids = index(jnp.asarray(queries))
    full = queries @ corpus.T
    ref_ids = np.argsort(-full, axis=1)[:, :10]
    assert np.mean(np.asarray(ids) == ref_ids) > 0.9
    # Returned scores are true dot products of the returned ids.
    np.testing.assert_allclose(
        np.asarray(scores),
        np.take_along_axis(full, np.asarray(ids), axis=1),
        rtol=1e-4, atol=1e-4,
    )


def test_probe_tile_recall_close_to_per_query():
    """Tile-coherent probing with a per-query probe floor must not
    collapse recall relative to per-query probing."""
    queries, corpus = _clustered(20000, 128, d=128, seed=7)
    k = 10
    _, exact_ids = scoring.exact_top_k(
        jnp.asarray(queries), jnp.asarray(corpus), k
    )
    exact_ids = np.asarray(exact_ids)

    def recall(ids):
        return np.mean([
            len(np.intersect1d(exact_ids[i], np.asarray(ids)[i])) / k
            for i in range(queries.shape[0])
        ])

    per_query = approximate.ScaNN(
        k=k, num_leaves=64, num_leaves_to_search=8,
        scoring_buckets=1024, training_iterations=5,
    ).index(jnp.asarray(corpus))
    tiled = approximate.ScaNN(
        k=k, num_leaves=64, num_leaves_to_search=32,
        scoring_buckets=1024, probe_tile=8, training_iterations=5,
    ).index(jnp.asarray(corpus))
    _, ids_pq = per_query(jnp.asarray(queries))
    _, ids_t = tiled(jnp.asarray(queries))
    r_pq, r_t = recall(ids_pq), recall(ids_t)
    assert r_t > r_pq - 0.03, (r_pq, r_t)


def test_bucketed_with_soar_and_reorder():
    queries, corpus = _clustered(10000, 64, d=128, seed=9)
    index = approximate.ScaNN(
        k=10, num_leaves=64, num_leaves_to_search=16,
        scoring_buckets=1024, probe_tile=8, soar_lambda=1.5,
        quantize=True, num_reordering_candidates=40,
        training_iterations=5,
    ).index(jnp.asarray(corpus))
    scores, ids = index(jnp.asarray(queries))
    ids_np = np.asarray(ids)
    assert all(len(set(r.tolist())) == len(r) for r in ids_np)
    full = queries @ corpus.T
    np.testing.assert_allclose(
        np.asarray(scores),
        np.take_along_axis(full, ids_np, axis=1),
        rtol=1e-4, atol=1e-4,
    )


def test_bucketed_odd_query_count_pads():
    queries, corpus = _clustered(6000, 77, d=128, num_centers=16, seed=20)
    index = approximate.ScaNN(
        k=5, num_leaves=16, num_leaves_to_search=8,
        scoring_buckets=512, probe_tile=4, training_iterations=4,
    ).index(jnp.asarray(corpus))
    scores, ids = index(jnp.asarray(queries))
    assert ids.shape == (77, 5)
    _, exact_ids = scoring.exact_top_k(
        jnp.asarray(queries), jnp.asarray(corpus), 5
    )
    exact_ids = np.asarray(exact_ids)
    rec = np.mean([
        len(np.intersect1d(exact_ids[i], np.asarray(ids)[i])) / 5
        for i in range(77)
    ])
    # Shape is the point (77 pads to 80 and slices back); recall just
    # needs to be sane for 2 personal probes of 16 leaves.
    assert rec > 0.75, rec


def test_scoring_buckets_validation():
    with pytest.raises(ValueError, match="scoring_buckets"):
        approximate.ScaNN(scoring_buckets=200)
    with pytest.raises(ValueError, match="probe_tile"):
        approximate.ScaNN(probe_tile=0)
    with pytest.raises(ValueError, match="probe_tile"):
        approximate.ScaNN(probe_tile=8)


def test_kmeans_balance_reduces_leaf_skew():
    """Split-reseed balancing (`kmeans_balance_fraction`) must cut the
    max leaf load on skewed data while keeping probed recall sane —
    the 100M capacity-spill fix (docs/PARITY.md round 4)."""
    rng = np.random.RandomState(0)
    # Heavy skew: 80% of mass in 2 of 16 latent blobs.
    centers = rng.normal(size=(16, 64)).astype(np.float32)
    blob = np.where(
        rng.uniform(size=4096) < 0.8, rng.randint(0, 2, 4096),
        rng.randint(0, 16, 4096),
    )
    corpus = centers[blob] + 0.2 * rng.normal(size=(4096, 64)).astype(
        np.float32
    )
    queries = corpus[rng.randint(0, 4096, 32)]

    def build(balance):
        idx = approximate.ScaNN(
            k=10, num_leaves=32, num_leaves_to_search=12,
            training_iterations=12, seed=0,
            kmeans_balance_fraction=balance,
        ).index(jnp.asarray(corpus))
        loads = np.asarray(idx._leaf_valid).sum(axis=1)
        return idx, loads

    plain, plain_loads = build(0.0)
    bal, bal_loads = build(0.25)
    assert bal_loads.max() < plain_loads.max(), (
        bal_loads.max(), plain_loads.max())
    _, exact = scoring.exact_top_k(
        jnp.asarray(queries), jnp.asarray(corpus), 10
    )
    _, got = bal(jnp.asarray(queries))
    rec = np.mean([
        len(np.intersect1d(np.asarray(exact)[i], np.asarray(got)[i])) / 10
        for i in range(32)
    ])
    assert rec > 0.85, rec
