"""Golden-numeric tests for the Retrieval task.

Mirrors the reference's test strategy (`tasks/retrieval_test.py`): the loss
is checked against closed-form softmax cross-entropy computed in numpy,
including extra negatives, sample weights, temperature, maxsim scoring,
hard-negative mining and accidental-hit removal.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from recommenders_tpu import tasks


def _np_softmax_ce_sum(labels, logits, weights=None):
    logits = logits.astype(np.float64)
    logits = logits - logits.max(axis=1, keepdims=True)
    log_probs = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))
    per_example = -(labels * log_probs).sum(axis=1)
    if weights is not None:
        per_example = per_example * weights
    return per_example.sum()


def test_basic_loss_matches_closed_form():
    rng = np.random.RandomState(0)
    q = rng.normal(size=(4, 8)).astype(np.float32)
    c = rng.normal(size=(4, 8)).astype(np.float32)

    task = tasks.Retrieval()
    out = task(jnp.asarray(q), jnp.asarray(c))

    scores = q @ c.T
    expected = _np_softmax_ce_sum(np.eye(4), scores)
    np.testing.assert_allclose(float(out.loss), expected, rtol=1e-5)
    assert out.logits.shape == (4, 4)
    assert out.labels.shape == (4, 4)


def test_extra_negatives():
    rng = np.random.RandomState(1)
    q = rng.normal(size=(3, 8)).astype(np.float32)
    c = rng.normal(size=(7, 8)).astype(np.float32)  # 4 extra negatives

    out = tasks.Retrieval()(jnp.asarray(q), jnp.asarray(c))
    expected = _np_softmax_ce_sum(np.eye(3, 7), q @ c.T)
    np.testing.assert_allclose(float(out.loss), expected, rtol=1e-5)


def test_sample_weights():
    rng = np.random.RandomState(2)
    q = rng.normal(size=(4, 8)).astype(np.float32)
    c = rng.normal(size=(4, 8)).astype(np.float32)
    w = np.asarray([0.5, 2.0, 0.0, 1.0], np.float32)

    out = tasks.Retrieval()(
        jnp.asarray(q), jnp.asarray(c), sample_weight=jnp.asarray(w)
    )
    expected = _np_softmax_ce_sum(np.eye(4), q @ c.T, w)
    np.testing.assert_allclose(float(out.loss), expected, rtol=1e-5)


def test_temperature():
    rng = np.random.RandomState(3)
    q = rng.normal(size=(4, 8)).astype(np.float32)
    c = rng.normal(size=(4, 8)).astype(np.float32)

    out = tasks.Retrieval(temperature=0.1)(jnp.asarray(q), jnp.asarray(c))
    expected = _np_softmax_ce_sum(np.eye(4), (q @ c.T) / 0.1)
    np.testing.assert_allclose(float(out.loss), expected, rtol=1e-4)


def test_maxsim_multihead_queries():
    rng = np.random.RandomState(4)
    q = rng.normal(size=(3, 2, 8)).astype(np.float32)  # 2 heads
    c = rng.normal(size=(3, 8)).astype(np.float32)

    out = tasks.Retrieval()(jnp.asarray(q), jnp.asarray(c))
    scores = np.einsum("qne,ce->qnc", q, c).max(axis=1)
    expected = _np_softmax_ce_sum(np.eye(3), scores)
    np.testing.assert_allclose(float(out.loss), expected, rtol=1e-5)


def test_hard_negative_mining_reduces_to_positive_plus_top_negatives():
    # With 1 hard negative, each row's loss uses only the positive and the
    # single largest negative logit.
    rng = np.random.RandomState(5)
    q = rng.normal(size=(4, 8)).astype(np.float32)
    c = rng.normal(size=(4, 8)).astype(np.float32)

    out = tasks.Retrieval(num_hard_negatives=1)(
        jnp.asarray(q), jnp.asarray(c)
    )

    scores = (q @ c.T).astype(np.float64)
    expected = 0.0
    for i in range(4):
        pos = scores[i, i]
        negs = np.delete(scores[i], i)
        top_neg = negs.max()
        row = np.asarray([pos, top_neg])
        row = row - row.max()
        expected += -(row[0] - np.log(np.exp(row).sum()))
    np.testing.assert_allclose(float(out.loss), expected, rtol=1e-5)


def test_remove_accidental_hits_excludes_duplicates():
    rng = np.random.RandomState(6)
    q = rng.normal(size=(3, 8)).astype(np.float32)
    c = rng.normal(size=(3, 8)).astype(np.float32)
    # Candidate 2 shares an id with candidate 0.
    ids = np.asarray([11, 22, 11])

    out = tasks.Retrieval(remove_accidental_hits=True)(
        jnp.asarray(q), jnp.asarray(c), candidate_ids=jnp.asarray(ids)
    )

    scores = (q @ c.T).astype(np.float64)
    # Row 0: candidate 2 masked; row 2: candidate 0 masked.
    masked = scores.copy()
    min_float = np.finfo(np.float32).min / 100.0
    masked[0, 2] += min_float
    masked[2, 0] += min_float
    expected = _np_softmax_ce_sum(np.eye(3), masked)
    np.testing.assert_allclose(float(out.loss), expected, rtol=1e-5)


def test_remove_accidental_hits_requires_ids():
    q = jnp.zeros((2, 4))
    c = jnp.zeros((2, 4))
    with pytest.raises(ValueError, match="candidate ids"):
        tasks.Retrieval(remove_accidental_hits=True)(q, c)


def test_sampling_probability_correction_applied():
    rng = np.random.RandomState(7)
    q = rng.normal(size=(3, 8)).astype(np.float32)
    c = rng.normal(size=(3, 8)).astype(np.float32)
    p = np.asarray([0.2, 0.5, 1.0], np.float32)

    out = tasks.Retrieval()(
        jnp.asarray(q),
        jnp.asarray(c),
        candidate_sampling_probability=jnp.asarray(p),
    )
    corrected = q @ c.T - np.log(np.clip(p, 1e-6, 1.0))[None, :]
    expected = _np_softmax_ce_sum(np.eye(3), corrected)
    np.testing.assert_allclose(float(out.loss), expected, rtol=1e-5)


def test_score_mask():
    rng = np.random.RandomState(8)
    q = rng.normal(size=(2, 4)).astype(np.float32)
    c = rng.normal(size=(2, 4)).astype(np.float32)
    mask = np.asarray([[True, False], [True, True]])

    out = tasks.Retrieval()(
        jnp.asarray(q), jnp.asarray(c), score_mask=jnp.asarray(mask)
    )
    scores = (q @ c.T).astype(np.float64)
    min_float = np.finfo(np.float32).min / 100.0
    scores[0, 1] = min_float
    expected = _np_softmax_ce_sum(np.eye(2), scores)
    np.testing.assert_allclose(float(out.loss), expected, rtol=1e-5)


def test_loss_is_differentiable():
    import jax

    rng = np.random.RandomState(9)
    q = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))

    task = tasks.Retrieval(temperature=0.5, num_hard_negatives=2)
    grads = jax.grad(lambda q_, c_: task(q_, c_).loss, argnums=(0, 1))(q, c)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in grads)


def test_combined_options_weights_hard_negatives_extra_candidates():
    """All task knobs at once against a step-by-step numpy oracle:
    extra candidates + temperature + hard-negative mining + weights."""
    import jax.numpy as jnp
    from recommenders_tpu import tasks as tasks_lib

    rng = np.random.RandomState(0)
    q = rng.normal(size=(3, 4)).astype(np.float32)
    c = rng.normal(size=(5, 4)).astype(np.float32)  # 2 extra negatives.
    w = np.asarray([1.0, 0.5, 2.0], np.float32)
    temperature, num_hard = 0.3, 2

    task = tasks_lib.Retrieval(
        temperature=temperature, num_hard_negatives=num_hard
    )
    out = task(
        jnp.asarray(q), jnp.asarray(c), sample_weight=jnp.asarray(w)
    )

    scores = (q @ c.T) / temperature
    total = 0.0
    for i in range(3):
        row = scores[i].copy()
        pos = row[i]
        negs = np.delete(row, i)
        top_negs = np.sort(negs)[::-1][:num_hard]
        logits = np.concatenate([[pos], top_negs])
        # Positive may not be the max; softmax CE over kept logits.
        ce = -(pos - np.log(np.exp(logits).sum()))
        total += w[i] * ce
    np.testing.assert_allclose(float(out.loss), total, rtol=1e-4)


def test_score_dtype_bf16_close_to_f32():
    """bf16 scoring inputs with f32 accumulation track the f32 loss."""
    import numpy as np

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))
    f32 = tasks.Retrieval()(q, c)
    b16 = tasks.Retrieval(score_dtype=jnp.bfloat16)(q, c)
    assert b16.scores.dtype == jnp.float32  # f32 accumulation.
    np.testing.assert_allclose(
        float(b16.loss), float(f32.loss), rtol=2e-2
    )
