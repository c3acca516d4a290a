"""Listwise loss + NDCG metric tests with hand-computed numerics
(the reference's test style, SURVEY.md §4) and gradient-sanity checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recommenders_tpu import metrics as metrics_lib
from recommenders_tpu.tasks import listwise


def test_softmax_listwise_closed_form():
    # One list: labels [1, 0], scores [0, 0] → CE(p=[1,0], softmax=[.5,.5])
    # = -log(0.5).
    loss = listwise.softmax_listwise(
        jnp.asarray([[1.0, 0.0]]), jnp.asarray([[0.0, 0.0]])
    )
    np.testing.assert_allclose(float(loss), np.log(2.0), rtol=1e-6)


def test_pairwise_logistic_closed_form():
    # One valid pair (label 1 > label 0), score diff = 2 →
    # log(1 + exp(-2)).
    loss = listwise.pairwise_logistic(
        jnp.asarray([[1.0, 0.0]]), jnp.asarray([[2.0, 0.0]])
    )
    np.testing.assert_allclose(
        float(loss), np.log1p(np.exp(-2.0)), rtol=1e-6
    )


def test_list_mle_closed_form():
    # Labels [2, 1], scores [a, b]: -[a - lse(a,b) + b - b] with π = (0, 1).
    a, b = 1.0, 0.5
    expected = -(a - np.logaddexp(a, b)) / 2.0  # Mean over 2 positions.
    loss = listwise.list_mle(
        jnp.asarray([[2.0, 1.0]]), jnp.asarray([[a, b]])
    )
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)


def test_list_mle_mask_equals_shorter_list():
    labels = jnp.asarray([[3.0, 1.0, 0.0]])
    scores = jnp.asarray([[0.3, -0.2, 9.9]])
    mask = jnp.asarray([[True, True, False]])
    masked = listwise.list_mle(labels, scores, mask=mask)
    short = listwise.list_mle(labels[:, :2], scores[:, :2])
    np.testing.assert_allclose(float(masked), float(short), rtol=1e-5)


def test_approx_ndcg_perfect_vs_inverted():
    labels = jnp.asarray([[3.0, 2.0, 1.0, 0.0]])
    good = listwise.approx_ndcg(labels, jnp.asarray([[4.0, 3.0, 2.0, 1.0]]))
    bad = listwise.approx_ndcg(labels, jnp.asarray([[1.0, 2.0, 3.0, 4.0]]))
    assert float(good) < float(bad)  # Loss = -NDCG: lower is better.
    np.testing.assert_allclose(float(good), -1.0, atol=0.05)


@pytest.mark.parametrize(
    "loss_fn",
    [
        listwise.softmax_listwise,
        listwise.pairwise_logistic,
        listwise.list_mle,
        listwise.approx_ndcg,
    ],
)
def test_gradients_point_the_right_way(loss_fn):
    """One gradient step on scores must decrease every listwise loss."""
    rng = np.random.RandomState(0)
    labels = jnp.asarray(rng.randint(0, 4, size=(8, 6)), jnp.float32)
    scores = jnp.asarray(rng.normal(size=(8, 6)), jnp.float32)
    g = jax.grad(lambda s: loss_fn(labels, s))(scores)
    stepped = scores - 0.5 * g
    assert float(loss_fn(labels, stepped)) < float(loss_fn(labels, scores))


def test_losses_work_with_ranking_task():
    from recommenders_tpu import tasks as tasks_lib

    task = tasks_lib.Ranking(loss_fn=listwise.list_mle)
    out = task(
        jnp.asarray([[2.0, 1.0, 0.0]]), jnp.asarray([[0.5, 0.1, -0.2]])
    )
    assert np.isfinite(float(out.loss))


# --- NDCG metric ----------------------------------------------------------


def test_ndcg_perfect_ranking_is_one():
    m = metrics_lib.NDCG()
    labels = jnp.asarray([[3.0, 2.0, 0.0]])
    preds = jnp.asarray([[9.0, 5.0, 1.0]])
    state = m.update(m.init(), labels, preds)
    np.testing.assert_allclose(float(m.result(state)), 1.0, rtol=1e-6)


def test_ndcg_hand_computed():
    # Labels [3, 1], predictions rank them inverted.
    # DCG = (2^1-1)/log2(2) + (2^3-1)/log2(3); IDCG = 7/log2(2)+1/log2(3).
    labels = jnp.asarray([[3.0, 1.0]])
    preds = jnp.asarray([[0.1, 0.9]])
    dcg = 1.0 / 1.0 + 7.0 / np.log2(3.0)
    idcg = 7.0 / 1.0 + 1.0 / np.log2(3.0)
    m = metrics_lib.NDCG()
    state = m.update(m.init(), labels, preds)
    np.testing.assert_allclose(float(m.result(state)), dcg / idcg, rtol=1e-6)


def test_ndcg_at_k_cutoff():
    labels = jnp.asarray([[0.0, 3.0, 2.0, 1.0]])
    preds = jnp.asarray([[4.0, 3.0, 2.0, 1.0]])  # Best item ranked 2nd.
    full = metrics_lib.NDCG()
    at1 = metrics_lib.NDCG(k=1)
    s_full = full.update(full.init(), labels, preds)
    s_at1 = at1.update(at1.init(), labels, preds)
    # @1 the retrieved item has gain 0 → NDCG@1 = 0; full NDCG > 0.
    np.testing.assert_allclose(float(at1.result(s_at1)), 0.0, atol=1e-6)
    assert float(full.result(s_full)) > 0.5


def test_ndcg_streaming_mean():
    m = metrics_lib.NDCG()
    labels = jnp.asarray([[1.0, 0.0]])
    perfect = jnp.asarray([[2.0, 1.0]])
    inverted = jnp.asarray([[1.0, 2.0]])
    state = m.init()
    state = m.update(state, labels, perfect)
    state = m.update(state, labels, inverted)
    # Mean of 1.0 and 1/log2(3).
    expected = (1.0 + 1.0 / np.log2(3.0)) / 2.0
    np.testing.assert_allclose(float(m.result(state)), expected, rtol=1e-6)


def test_listwise_pipeline_with_sample_listwise():
    """End-to-end: sample_listwise → listwise loss over scored lists."""
    from recommenders_tpu import data as data_lib

    ds = data_lib.synthetic_movielens(
        num_users=50, num_movies=100, num_interactions=5000, seed=0
    )
    lists = data_lib.sample_listwise(
        ds.user_ids,
        ds.movie_ids,
        ds.ratings,
        num_list_per_user=2,
        num_examples_per_list=5,
        seed=1,
    )
    assert lists["movie_id"].shape[1] == 5
    scores = jnp.asarray(
        np.random.RandomState(0).normal(size=lists["rating"].shape),
        jnp.float32,
    )
    loss = listwise.list_mle(jnp.asarray(lists["rating"]), scores)
    assert np.isfinite(float(loss))


# --- LambdaRank -----------------------------------------------------------


def test_ndcg_lambda_weights_hand_computed():
    # Two items, labels [1, 0], scores rank them correctly: ranks [1, 2].
    labels = jnp.asarray([[1.0, 0.0]])
    scores = jnp.asarray([[2.0, 1.0]])
    w = listwise.ndcg_lambda_weights(labels, scores)
    # gains [1, 0]; discounts [1, 1/log2(3)]; maxDCG = 1.
    expected = abs(1.0 - 0.0) * abs(1.0 - 1.0 / np.log2(3.0)) / 1.0
    np.testing.assert_allclose(float(w[0, 0, 1]), expected, rtol=1e-6)
    np.testing.assert_allclose(float(w[0, 1, 0]), expected, rtol=1e-6)
    # Same-label pairs carry zero weight.
    np.testing.assert_allclose(float(w[0, 0, 0]), 0.0)


def test_lambdarank_upweights_high_impact_pairs():
    """Misranking the top item must cost more than misranking the tail."""
    # Item 0 is highly relevant; items placed far apart in rank.
    labels = jnp.asarray([[3.0, 0.0, 0.0, 0.0]])
    top_wrong = jnp.asarray([[0.0, 3.0, 2.0, 1.0]])  # Best item last.
    tail_wrong = jnp.asarray([[3.0, 0.5, 2.0, 1.0]])  # Mid items swapped.
    lw_top = float(listwise.lambdarank(labels, top_wrong))
    lw_tail = float(listwise.lambdarank(labels, tail_wrong))
    assert lw_top > lw_tail


def test_lambdarank_gradient_improves_loss_and_ndcg():
    from recommenders_tpu import metrics as metrics_lib

    rng = np.random.RandomState(0)
    labels = jnp.asarray(rng.randint(0, 4, size=(8, 6)), jnp.float32)
    scores = jnp.asarray(rng.normal(size=(8, 6)), jnp.float32)
    m = metrics_lib.NDCG()
    before = float(m.result(m.update(m.init(), labels, scores)))
    for _ in range(20):
        g = jax.grad(lambda s: listwise.lambdarank(labels, s))(scores)
        scores = scores - 0.5 * g
    after = float(m.result(m.update(m.init(), labels, scores)))
    assert after > before, (before, after)


def test_lambdarank_works_with_ranking_task():
    from recommenders_tpu import tasks as tasks_lib

    task = tasks_lib.Ranking(loss_fn=listwise.lambdarank)
    out = task(
        jnp.asarray([[2.0, 1.0, 0.0]]), jnp.asarray([[0.1, 0.5, -0.2]])
    )
    assert np.isfinite(float(out.loss))


def test_dcg_lambda_weights_are_unnormalized_ndcg():
    rng = np.random.RandomState(12)
    labels = rng.randint(0, 4, size=(3, 6)).astype(np.float32)
    scores = rng.normal(size=(3, 6)).astype(np.float32)
    ndcg_w = listwise.ndcg_lambda_weights(labels, scores)
    dcg_w = listwise.dcg_lambda_weights(labels, scores)
    gains = np.power(2.0, labels) - 1.0
    positions = np.arange(1, 7, dtype=np.float32)
    max_dcg = np.sum(
        np.sort(gains, axis=1)[:, ::-1] / np.log2(1.0 + positions),
        axis=1,
    )
    np.testing.assert_allclose(
        np.asarray(dcg_w),
        np.asarray(ndcg_w) * max_dcg[:, None, None],
        rtol=1e-5,
    )
    # Unnormalized weights scale with list gain magnitude.
    assert np.asarray(dcg_w).max() > 0
