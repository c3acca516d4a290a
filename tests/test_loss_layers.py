"""Unit tests for loss-shaping ops, with numpy oracles.

Test strategy mirrors the reference's `layers/loss_test.py`: hand-checkable
cases plus property tests against numpy ground truth.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from recommenders_tpu.layers import loss as loss_layers


def test_take_along_rows():
    data = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    idx = jnp.asarray([[0, 3], [1, 1], [2, 0]])
    out = loss_layers.take_along_rows(data, idx)
    np.testing.assert_array_equal(
        np.asarray(out), [[0.0, 3.0], [5.0, 5.0], [10.0, 8.0]]
    )


@pytest.mark.parametrize("num_hard_negatives", [1, 2, 5, 20])
def test_hard_negative_mining_matches_numpy(num_hard_negatives):
    rng = np.random.RandomState(42)
    batch, num_candidates = 6, 10
    logits = rng.normal(size=(batch, num_candidates)).astype(np.float32)
    labels = np.eye(batch, num_candidates, dtype=np.float32)

    out_logits, out_labels = loss_layers.hard_negative_mining(
        jnp.asarray(logits), jnp.asarray(labels), num_hard_negatives
    )
    out_logits, out_labels = np.asarray(out_logits), np.asarray(out_labels)

    num_kept = min(num_hard_negatives + 1, num_candidates)
    assert out_logits.shape == (batch, num_kept)
    assert out_labels.shape == (batch, num_kept)

    for i in range(batch):
        # The positive must be present exactly once.
        assert out_labels[i].sum() == 1.0
        pos_col = np.argmax(labels[i])
        pos_logit = logits[i, pos_col]
        assert pos_logit in out_logits[i]
        # Kept negatives must be the largest negatives.
        neg_logits = np.delete(logits[i], pos_col)
        expected_negs = np.sort(neg_logits)[::-1][: num_kept - 1]
        got_negs = np.sort(
            out_logits[i][out_labels[i] == 0.0]
        )[::-1]
        np.testing.assert_allclose(got_negs, expected_negs, rtol=1e-6)


def test_remove_accidental_hits():
    labels = jnp.asarray(np.eye(3, 4, dtype=np.float32))
    logits = jnp.asarray(
        np.arange(12, dtype=np.float32).reshape(3, 4)
    )
    # Candidate 3 duplicates candidate 0's id; candidate 2 duplicates 1's.
    candidate_ids = jnp.asarray([7, 9, 9, 7])

    out = np.asarray(
        loss_layers.remove_accidental_hits(labels, logits, candidate_ids)
    )

    # Row 0: positive is candidate 0 (id 7); candidate 3 shares id 7 ->
    # masked. Positive itself must NOT be masked.
    assert out[0, 0] == pytest.approx(0.0)
    assert out[0, 3] < loss_layers.MIN_FLOAT / 2
    assert out[0, 1] == pytest.approx(1.0)
    assert out[0, 2] == pytest.approx(2.0)
    # Row 1: positive is candidate 1 (id 9); candidate 2 shares id 9.
    assert out[1, 1] == pytest.approx(5.0)
    assert out[1, 2] < loss_layers.MIN_FLOAT / 2
    # Row 2: positive is candidate 2 (id 9); candidate 1 shares id 9.
    assert out[2, 2] == pytest.approx(10.0)
    assert out[2, 1] < loss_layers.MIN_FLOAT / 2


def test_sampling_probability_correction():
    logits = jnp.zeros((2, 3), jnp.float32)
    probs = jnp.asarray([0.5, 1.0, 1e-9], jnp.float32)
    out = np.asarray(
        loss_layers.sampling_probability_correction(logits, probs)
    )
    np.testing.assert_allclose(out[0, 0], -np.log(0.5), rtol=1e-6)
    np.testing.assert_allclose(out[0, 1], 0.0, atol=1e-6)
    # Probability clipped at 1e-6.
    np.testing.assert_allclose(out[0, 2], -np.log(1e-6), rtol=1e-5)
