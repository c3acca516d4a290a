"""Mesh-sharded approximate serving (parallel.ann) on the 8-device mesh.

Equality discipline: the sharded layers must reproduce single-device
execution of the same index semantics exactly (up to score-tie order),
mirroring the repo's sharded-vs-unsharded bit-equality convention.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recommenders_tpu.layers import approximate, factorized_top_k
from recommenders_tpu.ops import scoring, topk as topk_ops
from recommenders_tpu.parallel import ann as ann_lib
from recommenders_tpu.parallel import mesh as mesh_lib


def _clustered(n, d, q, seed=0, clusters=32, noise=0.3):
    rng = np.random.RandomState(seed)
    centers = rng.normal(size=(clusters, d)).astype(np.float32)
    a = rng.randint(0, clusters, n)
    corpus = centers[a] + noise * rng.normal(size=(n, d)).astype(
        np.float32
    )
    queries = centers[rng.randint(0, clusters, q)] + noise * rng.normal(
        size=(q, d)
    ).astype(np.float32)
    return jnp.asarray(queries), jnp.asarray(corpus)


def _assert_topk_equal(got, want, context="", rtol=0.0):
    """Score equality (exact for quantized paths, whose bf16 dot is
    deterministic; `rtol` for f32 paths where XLA may reassociate the
    matmul differently across compilation contexts); id equality except
    inside score ties."""
    gs, gi = np.asarray(got[0]), np.asarray(got[1])
    ws, wi = np.asarray(want[0]), np.asarray(want[1])
    np.testing.assert_allclose(gs, ws, rtol=rtol, atol=0, err_msg=context)
    if rtol:
        # Near-ties under rtol can swap boundary ids; require the id
        # SETS to agree almost everywhere instead of positionally.
        overlap = np.mean([
            len(set(gi[r]) & set(wi[r])) / gi.shape[1]
            for r in range(gi.shape[0])
        ])
        assert overlap > 0.98, (context, overlap)
        return
    mismatch = gi != wi
    if mismatch.any():
        rows, cols = np.nonzero(mismatch)
        for r, c in zip(rows, cols):
            # A differing id is acceptable only when its score ties
            # with a neighbour (top-k order among ties is unspecified).
            tied = np.isin(gs[r, c], ws[r][wi[r] != gi[r, c]]).item() or (
                (ws[r] == ws[r, c]).sum() > 1
            )
            assert tied, (context, r, c, gi[r, c], wi[r, c], gs[r, c])
        # Tie-permuted rows still carry identical id SETS.
        for r in set(rows):
            assert set(gi[r]) == set(wi[r]), (context, r)


def _sharded_bucketed_oracle(index, queries, k):
    """Single-device replay of ShardedBucketed's exact semantics."""
    s = index._mesh.shape[index._axis]
    rps = index._rows_per_shard
    n = index._num_candidates
    cands = np.asarray(jax.device_get(index._candidates))
    scales = (
        None if index._scales is None
        else np.asarray(jax.device_get(index._scales))
    )
    packed4 = index._quantize == "int4"
    all_scores, all_rows = [], []
    for sh in range(s):
        c = jnp.asarray(cands[sh])
        sc = None if scales is None else jnp.asarray(scales[sh])
        q = queries
        if index._corpus_dtype is not None:
            q = q.astype(index._corpus_dtype)
        vs, rs = scoring.bucketed_top_k_reference(
            q.astype(jnp.float32),
            c if index._quantize else c.astype(jnp.float32),
            k,
            buckets=index._buckets,
            scales=sc,
            packed4=packed4,
            valid_rows=int(np.clip(n - sh * rps, 0, rps)),
        )
        all_scores.append(vs)
        all_rows.append(rs + sh * rps)
    scores = jnp.concatenate(all_scores, axis=1)
    rows = jnp.concatenate(all_rows, axis=1)
    k = min(k, scores.shape[1])
    ts, idx = jax.lax.top_k(scores, k)
    return ts, jnp.take_along_axis(rows, idx, axis=1)


@pytest.mark.parametrize("quantize", [False, "int8", "int4"])
@pytest.mark.parametrize("n", [4096, 3000])  # aligned and ragged
def test_sharded_bucketed_matches_single_device_semantics(quantize, n):
    queries, corpus = _clustered(n, 128, 16, seed=0)
    chunk = 512 if quantize != "int4" else 1024
    index = ann_lib.ShardedBucketed(
        k=20, buckets=512, chunk=chunk, quantize=quantize
    ).index(corpus)
    got = index(queries)
    want = _sharded_bucketed_oracle(index, queries, 20)
    assert int(np.asarray(got[1]).max()) < n  # no padding rows leak
    _assert_topk_equal(
        got, want, f"quantize={quantize} n={n}",
        rtol=1e-5 if quantize is False else 0.0,
    )


def test_sharded_bucketed_scores_are_exact_dots():
    queries, corpus = _clustered(2048, 128, 8, seed=1)
    index = ann_lib.ShardedBucketed(k=10, buckets=512, chunk=512).index(
        corpus
    )
    scores, rows = index(queries)
    exact = np.asarray(queries @ corpus.T)
    got = np.take_along_axis(exact, np.asarray(rows), axis=1)
    np.testing.assert_allclose(np.asarray(scores), got, rtol=1e-5)


def test_sharded_bucketed_recall_vs_brute_force():
    queries, corpus = _clustered(4096, 128, 16, seed=2)
    bf = factorized_top_k.BruteForce(k=10).index(corpus)
    sb = ann_lib.ShardedBucketed(k=10, buckets=512, chunk=512).index(
        corpus
    )
    _, want = bf(queries)
    _, got = sb(queries)
    overlap = np.mean([
        len(set(np.asarray(got)[r]) & set(np.asarray(want)[r])) / 10
        for r in range(16)
    ])
    # Effective width is devices x buckets; collisions ~ never at this k.
    assert overlap > 0.95, overlap


def test_sharded_bucketed_identifiers_and_explicit_mesh():
    mesh = mesh_lib.create_mesh(shape=(2, 4))
    queries, corpus = _clustered(1536, 128, 8, seed=3)
    ids = jnp.asarray(np.arange(1536, dtype=np.int64) * 7 + 3)
    index = ann_lib.ShardedBucketed(
        k=10, buckets=512, chunk=512, mesh=mesh,
        axis=mesh_lib.MODEL_AXIS,
    ).index(corpus, ids)
    _, got = index(queries)
    assert set(np.asarray(got).ravel()) <= set(np.asarray(ids))


def _scann_params(**kw):
    base = dict(
        k=20, num_leaves=64, num_leaves_to_search=16,
        training_iterations=4, seed=0, query_batch=64,
    )
    base.update(kw)
    return base


@pytest.mark.parametrize(
    "quantize,soar",
    [(False, None), ("int8", None), ("int4", None), ("int8", 1.2)],
)
def test_sharded_scann_matches_single_device(quantize, soar):
    queries, corpus = _clustered(4096, 128, 16, seed=4)
    params = _scann_params(quantize=quantize, soar_lambda=soar)
    single = approximate.ScaNN(**params).index(corpus)
    want = single(queries)
    sharded = ann_lib.ShardedScaNN(
        approximate.ScaNN(**params)
    ).index(corpus)
    got = sharded(queries)
    _assert_topk_equal(got, want, f"quantize={quantize} soar={soar}")


def test_sharded_scann_frees_single_device_leaf_blocks():
    queries, corpus = _clustered(1024, 128, 8, seed=5)
    inner = approximate.ScaNN(**_scann_params())
    sharded = ann_lib.ShardedScaNN(inner).index(corpus)
    assert inner._leaf_embs is None  # superseded by the sharded copies
    scores, ids = sharded(queries, k=5)
    assert scores.shape == (8, 5)


def test_sharded_scann_rejects_unsupported_configs():
    with pytest.raises(ValueError, match="ScaNN"):
        ann_lib.ShardedScaNN(factorized_top_k.BruteForce())
    # 60 leaves cannot split 8 ways.
    queries, corpus = _clustered(512, 128, 4, seed=6)
    with pytest.raises(ValueError, match="divide"):
        ann_lib.ShardedScaNN(
            approximate.ScaNN(**_scann_params(num_leaves=60))
        ).index(corpus)


def test_sharded_bucketed_query_with_exclusions():
    queries, corpus = _clustered(2048, 128, 8, seed=7)
    index = ann_lib.ShardedBucketed(k=10, buckets=512, chunk=512).index(
        corpus
    )
    _, ids = index(queries)
    exclusions = ids[:, :3]
    _, ex_ids = index.query_with_exclusions(queries, exclusions)
    for i in range(8):
        assert not set(np.asarray(ex_ids)[i]) & set(
            np.asarray(exclusions)[i]
        )


# ---------------------------------------------------------------------------
# Streamed SHARDED builds: the corpus never materializes on one device.
# ---------------------------------------------------------------------------


def _batches(corpus, batch):
    """Zero-arg factory of host (NumPy) row blocks — the at-scale feed."""
    host = np.asarray(corpus)

    def factory():
        for i in range(0, host.shape[0], batch):
            yield host[i:i + batch]

    return factory


def _assert_sharded_over(arr, mesh, axis):
    """Every addressable shard sits on a distinct device and holds
    exactly 1/S of the leading dim — the corpus was never whole on any
    single device."""
    s = mesh.shape[axis]
    shards = arr.addressable_shards
    assert len(shards) == s
    assert len({sh.device for sh in shards}) == s
    for sh in shards:
        assert sh.data.shape[0] == arr.shape[0] // s, (
            sh.data.shape, arr.shape)


@pytest.mark.parametrize("quantize", [False, "int8", "int4"])
@pytest.mark.parametrize("n", [4096, 3000])  # aligned and ragged
def test_sharded_bucketed_streamed_matches_eager(quantize, n):
    """index_streamed == index, with batches that straddle shard row
    boundaries (batch 704 vs rows-per-shard 512/1024)."""
    queries, corpus = _clustered(n, 128, 16, seed=8)
    chunk = 512 if quantize != "int4" else 1024
    kw = dict(k=20, buckets=512, chunk=chunk, quantize=quantize)
    eager = ann_lib.ShardedBucketed(**kw).index(corpus)
    want = eager(queries)
    streamed = ann_lib.ShardedBucketed(**kw).index_streamed(
        _batches(corpus, 704), n
    )
    _assert_sharded_over(streamed._candidates, streamed._mesh,
                         streamed._axis)
    got = streamed(queries)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))


def test_sharded_bucketed_streamed_identifiers_and_counts():
    queries, corpus = _clustered(1536, 128, 8, seed=9)
    ids = jnp.asarray(np.arange(1536, dtype=np.int64) * 7 + 3)
    index = ann_lib.ShardedBucketed(
        k=10, buckets=512, chunk=512
    ).index_streamed(_batches(corpus, 512), 1536, ids)
    _, got = index(queries)
    assert set(np.asarray(got).ravel()) <= set(np.asarray(ids))
    with pytest.raises(ValueError, match="num_rows"):
        ann_lib.ShardedBucketed(
            k=10, buckets=512, chunk=512
        ).index_streamed(_batches(corpus, 512), 2000)


@pytest.mark.parametrize("quantize", [False, "int8", "int4"])
def test_sharded_scann_streamed_matches_single_device(quantize):
    """Sharded streamed build == single-device streamed build (same
    sample, same centroids, same packing), queried at parity."""
    queries, corpus = _clustered(4096, 128, 16, seed=10)
    params = _scann_params(quantize=quantize)
    single = approximate.ScaNN(**params).index_streamed(
        _batches(corpus, 768), 4096
    )
    want = single(queries)
    sharded = ann_lib.ShardedScaNN(
        approximate.ScaNN(**params)
    ).index_streamed(_batches(corpus, 768), 4096)
    for arr in (sharded._leaf_embs, sharded._leaf_rows,
                sharded._leaf_valid):
        _assert_sharded_over(arr, sharded._mesh, sharded._axis)
    got = sharded(queries)
    _assert_topk_equal(
        got, want, f"streamed quantize={quantize}",
        rtol=1e-5 if quantize is False else 0.0,
    )


def test_sharded_scann_streamed_identifiers():
    queries, corpus = _clustered(2048, 128, 8, seed=11)
    ids = np.arange(2048, dtype=np.int32) * 3 + 1
    sharded = ann_lib.ShardedScaNN(
        approximate.ScaNN(**_scann_params(quantize="int8"))
    ).index_streamed(_batches(corpus, 512), 2048, ids)
    _, got = sharded(queries)
    assert set(np.asarray(got).ravel()) <= set(ids)
    single = approximate.ScaNN(
        **_scann_params(quantize="int8")
    ).index_streamed(_batches(corpus, 512), 2048, jnp.asarray(ids))
    _, want = single(queries)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sharded_scann_streamed_rejects_soar():
    with pytest.raises(ValueError, match="soar"):
        ann_lib.ShardedScaNN(
            approximate.ScaNN(**_scann_params(soar_lambda=1.2))
        ).index_streamed(_batches(np.zeros((512, 128), np.float32), 128),
                         512)


# ---------------------------------------------------------------------------
# Production ScaNN configurations, sharded: bucketed fold + exact reorder.
# ---------------------------------------------------------------------------


def test_sharded_scann_reorder_matches_single_device():
    """The row-sharded exact reorder reproduces the single-device
    cascade bit for bit (each shortlist row is re-scored by exactly one
    shard with the same einsum shape, pmax-combined)."""
    queries, corpus = _clustered(4096, 128, 16, seed=12)
    params = _scann_params(
        quantize="int4", num_reordering_candidates=60
    )
    single = approximate.ScaNN(**params).index(corpus)
    want = single(queries)
    sharded = ann_lib.ShardedScaNN(
        approximate.ScaNN(**params)
    ).index(corpus)
    got = sharded(queries)
    _assert_topk_equal(got, want, "sharded reorder")
    # Reorder scores are exact dots of the returned ids.
    exact = np.asarray(queries @ corpus.T)
    picked = np.take_along_axis(exact, np.asarray(got[1]), axis=1)
    np.testing.assert_allclose(np.asarray(got[0]), picked, rtol=1e-5)


def test_sharded_scann_reorder_with_soar():
    queries, corpus = _clustered(2048, 128, 8, seed=13)
    params = _scann_params(
        quantize="int8", num_reordering_candidates=40, soar_lambda=1.2
    )
    single = approximate.ScaNN(**params).index(corpus)
    want = single(queries)
    got = ann_lib.ShardedScaNN(
        approximate.ScaNN(**params)
    ).index(corpus)(queries)
    _assert_topk_equal(got, want, "sharded reorder+soar")


@pytest.mark.parametrize("tile", [1, 4])
def test_sharded_scann_bucketed_single_shard_parity(tile):
    """On a 1-device mesh the per-shard bucketed fold IS the unsharded
    kernel (no foreign probes); scores must match the single-device
    scoring_buckets path exactly (ids up to in-bucket ties)."""
    queries, corpus = _clustered(2048, 128, 16, seed=14)
    params = _scann_params(
        quantize="int8", scoring_buckets=128, probe_tile=tile
    )
    single = approximate.ScaNN(**params).index(corpus)
    want = single(queries)
    mesh1 = mesh_lib.create_mesh(
        shape=(1,), axis_names=(mesh_lib.MODEL_AXIS,),
        devices=jax.devices()[:1],
    )
    got = ann_lib.ShardedScaNN(
        approximate.ScaNN(**params), mesh=mesh1
    ).index(corpus)(queries)
    _assert_topk_equal(got, want, f"bucketed 1-shard tile={tile}")


@pytest.mark.parametrize("tile", [1, 4])
@pytest.mark.parametrize("quantize", ["int8", "int4"])
def test_sharded_scann_bucketed_8way(quantize, tile):
    """8-way sharded bucketed fold: returned scores are exact dots of
    the returned rows, and recall never drops below the unsharded
    bucketed path's (each shard folds into its own bucket state)."""
    queries, corpus = _clustered(4096, 128, 16, seed=15)
    params = _scann_params(
        quantize=quantize, scoring_buckets=128, probe_tile=tile
    )
    sharded = ann_lib.ShardedScaNN(
        approximate.ScaNN(**params)
    ).index(corpus)
    k = 20
    gs, gi = sharded(queries)
    # Scores are the quantized-dot scores of real rows: recompute from
    # the quantized corpus representation via the unsharded layer's
    # own scoring of those exact rows — here we settle for exactness
    # against brute-force on ids (recall) plus monotone scores.
    assert np.all(np.diff(np.asarray(gs), axis=1) <= 0)
    assert int(np.asarray(gi).max()) < 4096
    single = approximate.ScaNN(**params).index(corpus)
    _, si = single(queries)
    bf = factorized_top_k.BruteForce(k=k).index(corpus)
    _, want = bf(queries)
    def recall(ids):
        ids = np.asarray(ids)
        return np.mean([
            len(set(ids[r]) & set(np.asarray(want)[r])) / k
            for r in range(ids.shape[0])
        ])
    assert recall(gi) >= recall(si) - 1e-9, (recall(gi), recall(si))


def test_sharded_scann_bucketed_reorder_cascade():
    """The production cascade — int4 probe scan, bucketed fold, exact
    reorder — sharded end to end; reorder restores exact top scores."""
    queries, corpus = _clustered(4096, 128, 16, seed=16)
    params = _scann_params(
        quantize="int4", scoring_buckets=128, probe_tile=4,
        num_reordering_candidates=60,
    )
    got = ann_lib.ShardedScaNN(
        approximate.ScaNN(**params)
    ).index(corpus)(queries)
    exact = np.asarray(queries @ corpus.T)
    picked = np.take_along_axis(exact, np.asarray(got[1]), axis=1)
    np.testing.assert_allclose(np.asarray(got[0]), picked, rtol=1e-5)
    bf = factorized_top_k.BruteForce(k=20).index(corpus)
    _, want = bf(queries)
    overlap = np.mean([
        len(set(np.asarray(got[1])[r]) & set(np.asarray(want)[r])) / 20
        for r in range(16)
    ])
    assert overlap > 0.8, overlap


def test_sharded_scann_streamed_with_reorder():
    """The streamed sharded build supports reorder (the single-device
    streamed build cannot — the corpus wouldn't fit one device): the
    reorder corpus row-shards during the scatter pass."""
    queries, corpus = _clustered(4096, 128, 16, seed=17)
    params = _scann_params(
        quantize="int4", num_reordering_candidates=60,
        kmeans_sample_size=4096,
    )
    sharded = ann_lib.ShardedScaNN(
        approximate.ScaNN(**params)
    ).index_streamed(_batches(corpus, 768), 4096)
    _assert_sharded_over(sharded._corpus, sharded._mesh, sharded._axis)
    scores, rows = sharded(queries)
    exact = np.asarray(queries @ corpus.T)
    picked = np.take_along_axis(exact, np.asarray(rows), axis=1)
    np.testing.assert_allclose(np.asarray(scores), picked, rtol=1e-5)
    bf = factorized_top_k.BruteForce(k=20).index(corpus)
    _, want = bf(queries)
    overlap = np.mean([
        len(set(np.asarray(rows)[r]) & set(np.asarray(want)[r])) / 20
        for r in range(16)
    ])
    assert overlap > 0.85, overlap


def test_eager_index_delegates_oversized_host_corpus(monkeypatch):
    """A host corpus past the single-device build budget must route
    through the streamed build (no one-device materialization) and
    produce the streamed result; SOAR refuses with a pointer."""
    monkeypatch.setattr(
        ann_lib, "SINGLE_DEVICE_BUILD_BUDGET_BYTES", 1 << 20
    )
    queries, corpus = _clustered(4096, 128, 16, seed=23)
    host = np.asarray(corpus)  # 2 MB f32 > patched 1 MB budget

    eager = ann_lib.ShardedBucketed(k=20, buckets=512, chunk=512).index(
        host
    )
    streamed = ann_lib.ShardedBucketed(
        k=20, buckets=512, chunk=512
    ).index_streamed(ann_lib._batched(host), 4096)
    _assert_topk_equal(
        eager(queries), streamed(queries), "bucketed delegation",
        rtol=1e-5,
    )

    params = _scann_params(quantize="int8", kmeans_sample_size=4096)
    eager_s = ann_lib.ShardedScaNN(
        approximate.ScaNN(**params)
    ).index(host)
    streamed_s = ann_lib.ShardedScaNN(
        approximate.ScaNN(**params)
    ).index_streamed(ann_lib._batched(host), 4096)
    _assert_topk_equal(
        eager_s(queries), streamed_s(queries), "scann delegation"
    )

    soar = approximate.ScaNN(**dict(params, soar_lambda=1.0))
    with pytest.raises(ValueError, match="single-device build budget"):
        ann_lib.ShardedScaNN(soar).index(host)

    # Device-resident corpora keep the eager path (placement already
    # happened at the caller's hands).
    dev = ann_lib.ShardedBucketed(k=20, buckets=512, chunk=512).index(
        corpus
    )
    assert dev._rows_per_shard > 0


def test_sharded_string_identifiers_decode():
    """String ids on the sharded surfaces: results decode host-side."""
    queries, corpus = _clustered(1024, 128, 8, seed=31)
    names = np.asarray([f"sku-{i:05d}" for i in range(1024)])

    idx = ann_lib.ShardedBucketed(k=10, buckets=256, chunk=512).index(
        corpus, names
    )
    _, ids = idx(queries)
    assert isinstance(ids, np.ndarray) and ids.dtype.kind == "U"
    _, rows = ann_lib.ShardedBucketed(
        k=10, buckets=256, chunk=512
    ).index(corpus)(queries)
    np.testing.assert_array_equal(ids, names[np.asarray(rows)])

    sc = ann_lib.ShardedScaNN(
        approximate.ScaNN(**_scann_params())
    ).index(corpus, names)
    _, ids = sc(queries)
    assert ids.dtype.kind == "U"
    _, rows = ann_lib.ShardedScaNN(
        approximate.ScaNN(**_scann_params())
    ).index(corpus)(queries)
    np.testing.assert_array_equal(ids, names[np.asarray(rows)])
