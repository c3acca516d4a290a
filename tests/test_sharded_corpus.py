"""Distributed (mesh-sharded) corpus top-k tests on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recommenders_tpu import metrics as metrics_lib
from recommenders_tpu.layers import factorized_top_k
from recommenders_tpu.parallel import corpus as corpus_lib
from recommenders_tpu.parallel import mesh as mesh_lib


def _data(n, d, q, seed=0):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.normal(size=(q, d)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(n, d)).astype(np.float32)),
    )


@pytest.mark.parametrize("n", [4096, 3000])  # Power-of-two and ragged.
def test_sharded_matches_single_device_brute_force(n):
    queries, corpus = _data(n, 64, 32)
    k = 50
    sharded = corpus_lib.ShardedBruteForce(k=k).index(corpus)
    local = factorized_top_k.BruteForce(k=k).index(corpus)
    s_scores, s_ids = sharded(queries)
    l_scores, l_ids = local(queries)
    np.testing.assert_array_equal(np.asarray(s_ids), np.asarray(l_ids))
    np.testing.assert_allclose(
        np.asarray(s_scores), np.asarray(l_scores), rtol=1e-5
    )


def test_sharded_with_identifiers_and_exclusions():
    queries, corpus = _data(2048, 32, 16, seed=1)
    identifiers = jnp.asarray(np.arange(2048, dtype=np.int64) * 3 + 1)
    index = corpus_lib.ShardedBruteForce(k=10).index(corpus, identifiers)
    scores, ids = index(queries)
    assert set(np.asarray(ids).ravel()) <= set(np.asarray(identifiers))

    exclusions = ids[:, :3]
    ex_scores, ex_ids = index.query_with_exclusions(queries, exclusions)
    for i in range(16):
        assert not set(np.asarray(ex_ids)[i]) & set(
            np.asarray(exclusions)[i]
        )
    # Remaining results equal positions 3.. of the unexcluded query.
    np.testing.assert_array_equal(
        np.asarray(ex_ids)[:, :7], np.asarray(ids)[:, 3:10]
    )


def test_explicit_mesh_axis():
    mesh = mesh_lib.create_mesh(shape=(2, 4))
    queries, corpus = _data(1024, 32, 8, seed=2)
    index = corpus_lib.ShardedBruteForce(
        k=10, mesh=mesh, axis=mesh_lib.MODEL_AXIS
    ).index(corpus)
    ref = factorized_top_k.BruteForce(k=10).index(corpus)
    np.testing.assert_array_equal(
        np.asarray(index(queries)[1]), np.asarray(ref(queries)[1])
    )


def test_factorized_topk_metric_over_sharded_corpus():
    """Corpus-level eval streams through the sharded index unchanged."""
    queries, corpus = _data(4096, 32, 64, seed=3)
    true_rows = np.random.RandomState(4).randint(0, 4096, 64)
    true_embs = corpus[true_rows]

    metric_sharded = metrics_lib.FactorizedTopK(
        candidates=corpus_lib.ShardedBruteForce(k=100).index(corpus),
        ks=(1, 10, 100),
    )
    metric_local = metrics_lib.FactorizedTopK(
        candidates=factorized_top_k.BruteForce(k=100).index(corpus),
        ks=(1, 10, 100),
    )
    s1 = metric_sharded.update(metric_sharded.init(), queries, true_embs)
    s2 = metric_local.update(metric_local.init(), queries, true_embs)
    r1 = {k: float(v) for k, v in metric_sharded.result(s1).items()}
    r2 = {k: float(v) for k, v in metric_local.result(s2).items()}
    assert r1 == r2
