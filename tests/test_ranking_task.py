"""Golden-numeric tests for the Ranking task (mirrors tasks/ranking_test.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from recommenders_tpu import tasks


def test_bce_matches_numpy():
    labels = np.asarray([1.0, 0.0, 1.0, 0.0], np.float32)
    preds = np.asarray([0.9, 0.2, 0.6, 0.4], np.float32)

    out = tasks.Ranking()(jnp.asarray(labels), jnp.asarray(preds))

    p = np.clip(preds, 1e-7, 1 - 1e-7)
    expected = np.mean(-(labels * np.log(p) + (1 - labels) * np.log(1 - p)))
    np.testing.assert_allclose(float(out.loss), expected, rtol=1e-5)


def test_bce_with_weights():
    labels = np.asarray([1.0, 0.0], np.float32)
    preds = np.asarray([0.8, 0.3], np.float32)
    w = np.asarray([2.0, 0.5], np.float32)

    out = tasks.Ranking()(
        jnp.asarray(labels), jnp.asarray(preds), sample_weight=jnp.asarray(w)
    )
    p = np.clip(preds, 1e-7, 1 - 1e-7)
    per = -(labels * np.log(p) + (1 - labels) * np.log(1 - p))
    expected = np.mean(per * w)
    np.testing.assert_allclose(float(out.loss), expected, rtol=1e-5)


def test_bce_from_logits():
    labels = np.asarray([1.0, 0.0, 1.0], np.float32)
    logits = np.asarray([2.0, -1.0, 0.5], np.float32)

    loss = tasks.ranking.binary_crossentropy(
        jnp.asarray(labels), jnp.asarray(logits), from_logits=True
    )
    p = 1 / (1 + np.exp(-logits))
    expected = np.mean(-(labels * np.log(p) + (1 - labels) * np.log(1 - p)))
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)


def test_mse_loss():
    labels = np.asarray([3.0, 4.0], np.float32)
    preds = np.asarray([2.5, 4.5], np.float32)
    task = tasks.Ranking(loss_fn=tasks.mean_squared_error)
    out = task(jnp.asarray(labels), jnp.asarray(preds))
    np.testing.assert_allclose(float(out.loss), 0.25, rtol=1e-6)


def test_differentiable():
    import jax

    labels = jnp.asarray([1.0, 0.0], jnp.float32)
    preds = jnp.asarray([0.7, 0.3], jnp.float32)
    g = jax.grad(lambda p: tasks.Ranking()(labels, p).loss)(preds)
    assert np.all(np.isfinite(np.asarray(g)))
