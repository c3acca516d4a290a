"""Tests for the functional streaming metrics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recommenders_tpu import metrics


def test_mean_streaming():
    m = metrics.Mean()
    state = m.init()
    state = m.update(state, jnp.asarray([1.0, 2.0, 3.0]))
    state = m.update(state, jnp.asarray([4.0]))
    assert float(m.result(state)) == pytest.approx(2.5)


def test_mean_weighted():
    m = metrics.Mean()
    state = m.init()
    state = m.update(
        state, jnp.asarray([1.0, 2.0]), sample_weight=jnp.asarray([1.0, 3.0])
    )
    assert float(m.result(state)) == pytest.approx((1 + 6) / 4)


def test_rmse():
    m = metrics.RootMeanSquaredError()
    state = m.init()
    state = m.update(state, jnp.asarray([1.0, 2.0]), jnp.asarray([2.0, 4.0]))
    assert float(m.result(state)) == pytest.approx(np.sqrt((1 + 4) / 2))


def test_binary_accuracy():
    m = metrics.BinaryAccuracy()
    state = m.init()
    state = m.update(
        state, jnp.asarray([1.0, 0.0, 1.0]), jnp.asarray([0.9, 0.4, 0.3])
    )
    assert float(m.result(state)) == pytest.approx(2 / 3)


def test_categorical_accuracy():
    m = metrics.CategoricalAccuracy()
    state = m.init()
    labels = jnp.asarray([[0.0, 1.0], [1.0, 0.0]])
    preds = jnp.asarray([[0.1, 0.9], [0.2, 0.8]])
    state = m.update(state, labels, preds)
    assert float(m.result(state)) == pytest.approx(0.5)


def test_topk_categorical_accuracy():
    m = metrics.TopKCategoricalAccuracy(k=2)
    state = m.init()
    labels = jnp.asarray([[0, 0, 1.0], [1.0, 0, 0]])
    preds = jnp.asarray([[0.5, 0.3, 0.4], [0.1, 0.5, 0.4]])
    state = m.update(state, labels, preds)
    # Row 0: target scores 0.4, one higher (0.5) -> in top 2.
    # Row 1: target 0.1, two higher -> not in top 2.
    assert float(m.result(state)) == pytest.approx(0.5)


def test_auc_roc_against_sklearn_formula():
    # Exact AUC via rank statistic on separable-ish data.
    rng = np.random.RandomState(0)
    labels = rng.randint(0, 2, size=1000).astype(np.float32)
    preds = np.clip(
        labels * 0.3 + rng.uniform(size=1000) * 0.7, 0, 1
    ).astype(np.float32)

    m = metrics.AUC(num_thresholds=1000)
    state = m.init()
    state = m.update(state, jnp.asarray(labels), jnp.asarray(preds))
    got = float(m.result(state))

    # Mann-Whitney U / rank-based exact ROC AUC.
    pos = preds[labels == 1]
    neg = preds[labels == 0]
    exact = (
        (pos[:, None] > neg[None, :]).sum()
        + 0.5 * (pos[:, None] == neg[None, :]).sum()
    ) / (len(pos) * len(neg))
    assert got == pytest.approx(exact, abs=5e-3)


def test_metric_update_inside_jit():
    m = metrics.Mean()

    @jax.jit
    def step(state, values):
        return m.update(state, values)

    state = m.init()
    state = step(state, jnp.asarray([2.0, 4.0]))
    assert float(m.result(state)) == pytest.approx(3.0)


def test_merge_states():
    m = metrics.Mean()
    s1 = m.update(m.init(), jnp.asarray([1.0]))
    s2 = m.update(m.init(), jnp.asarray([3.0]))
    merged = metrics.merge_states(s1, s2)
    assert float(m.result(merged)) == pytest.approx(2.0)


def test_auc_pr_curve():
    """PR-AUC for a perfect classifier is 1.0; for a random one ~0.5."""
    import jax.numpy as jnp
    from recommenders_tpu import metrics as metrics_lib

    m = metrics_lib.AUC(curve="PR")
    labels = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    perfect = jnp.asarray([0.9, 0.8, 0.2, 0.1])
    state = m.update(m.init(), labels, perfect)
    np.testing.assert_allclose(float(m.result(state)), 1.0, atol=0.02)

    rng = np.random.RandomState(0)
    labels = jnp.asarray(rng.randint(0, 2, 4000), jnp.float32)
    random_preds = jnp.asarray(rng.uniform(size=4000), jnp.float32)
    state = m.update(m.init(), labels, random_preds)
    # For random scores, PR-AUC ≈ positive rate (~0.5 here).
    assert 0.4 < float(m.result(state)) < 0.6


def test_auc_unknown_curve_raises():
    from recommenders_tpu import metrics as metrics_lib

    m = metrics_lib.AUC(curve="bogus")
    state = m.update(m.init(), np.asarray([1.0]), np.asarray([0.5]))
    with pytest.raises(ValueError, match="curve"):
        m.result(state)


def test_offline_evaluate_precision_recall_with_exclusions():
    """data.evaluate: hand-checked precision/recall@k with train
    exclusion (reference examples/movielens.py:26)."""
    from recommenders_tpu import data as data_lib

    # 2 users x 4 movies; user embeddings pick movies by dot product.
    user_emb = np.asarray([[1.0, 0.0], [0.0, 1.0]], np.float32)
    movie_emb = np.asarray(
        [[0.9, 0.0], [0.8, 0.0], [0.0, 0.9], [0.0, 0.8]], np.float32
    )
    # Test watches: user0 -> movie1, user1 -> movie3.
    results = data_lib.evaluate(
        user_emb,
        movie_emb,
        test_user_ids=np.asarray([0, 1]),
        test_movie_ids=np.asarray([1, 3]),
        # Train watches exclude each user's top-scoring movie.
        train_user_ids=np.asarray([0, 1]),
        train_movie_ids=np.asarray([0, 2]),
        k=1,
    )
    # With the top movie excluded, the test watch ranks first for both.
    assert results["precision_at_1"] == 1.0
    assert results["recall_at_1"] == 1.0

    without_exclusion = data_lib.evaluate(
        user_emb,
        movie_emb,
        test_user_ids=np.asarray([0, 1]),
        test_movie_ids=np.asarray([1, 3]),
        k=1,
    )
    # Without exclusion the (train) top movie crowds out the test watch.
    assert without_exclusion["precision_at_1"] == 0.0
