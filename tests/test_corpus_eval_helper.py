"""Corpus-level evaluation helper tests (reference: in-fit factorized
metrics + `examples/movielens.py:evaluate` exclusion semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from recommenders_tpu import data as data_lib
from recommenders_tpu import models as models_lib
from recommenders_tpu.models import retrieval as retrieval_model


@pytest.fixture(scope="module")
def trained():
    ds = data_lib.synthetic_movielens(
        num_users=150, num_movies=250, num_interactions=15_000,
        num_clusters=6, seed=0,
    )
    train, test = ds.split(0.8)
    model = models_lib.TwoTowerRetrieval(
        query_tower=lambda: models_lib.EmbeddingTower(150, 32),
        candidate_tower=lambda: models_lib.EmbeddingTower(250, 32),
    )
    trainer = models_lib.Trainer(model, optax.adagrad(0.3))
    sample = next(data_lib.batched(train.as_dict(), 256)())
    state = trainer.init(jax.random.PRNGKey(0), sample)
    state, _ = trainer.fit(
        state,
        data_lib.batched(train.as_dict(), 256, shuffle=True),
        epochs=4,
        verbose=False,
    )
    return trainer, state, train, test


def test_corpus_metrics_beat_random(trained):
    trainer, state, train, test = trained
    candidate_batch = {
        "movie_id": np.arange(250, dtype=np.int32)
    }
    results = retrieval_model.evaluate_with_corpus_metrics(
        trainer,
        state,
        data_lib.batched(test.as_dict(), 512),
        candidate_batch,
        ks=(10, 100),
    )
    # Random top-100/250 = 0.4; the trained model must clearly beat it.
    assert results[
        "factorized_top_k/top_100_categorical_accuracy"
    ] > 0.55, results
    assert (
        results["factorized_top_k/top_10_categorical_accuracy"]
        <= results["factorized_top_k/top_100_categorical_accuracy"]
    )


def test_exclusions_lower_or_equal_accuracy(trained):
    trainer, state, train, test = trained
    candidate_batch = {"movie_id": np.arange(250, dtype=np.int32)}
    test_d = test.as_dict()
    # Exclude the TRUE candidate itself: accuracy must collapse to ~0.
    def batches():
        for batch in data_lib.batched(test_d, 512)():
            batch = dict(batch)
            batch["exclude"] = batch["movie_id"][:, None]
            yield batch

    excluded = retrieval_model.evaluate_with_corpus_metrics(
        trainer, state, batches, candidate_batch, ks=(10,),
        exclusions_key="exclude",
    )
    assert excluded[
        "factorized_top_k/top_10_categorical_accuracy"
    ] < 0.01, excluded


def test_jit_corpus_eval_step_matches_python_loop(trained):
    """The single-dispatch jitted eval step (make_corpus_eval_step) must
    produce the same accuracies as the Python-loop helper."""
    from recommenders_tpu.layers import factorized_top_k as ftk
    from recommenders_tpu.metrics import (
        factorized_top_k as ftk_metric,
    )

    trainer, state, train, test = trained
    model = trainer.model
    candidate_batch = {"movie_id": np.arange(250, dtype=np.int32)}
    corpus = model.apply(
        {"params": state.params}, candidate_batch,
        method="candidate_embeddings",
    )
    index = ftk.BruteForce(k=100).index(corpus)
    metric = ftk_metric.FactorizedTopK(candidates=index, ks=(10, 100))

    step = retrieval_model.make_corpus_eval_step(model, metric)
    mstate = metric.init()
    for batch in data_lib.batched(test.as_dict(), 512)():
        mstate = step(state.params, mstate, batch, corpus)
    jit_results = {
        name: float(v) for name, v in metric.result(mstate).items()
    }

    loop_results = retrieval_model.evaluate_with_corpus_metrics(
        trainer, state, data_lib.batched(test.as_dict(), 512),
        candidate_batch, ks=(10, 100),
    )
    for name in jit_results:
        np.testing.assert_allclose(
            jit_results[name], loop_results[name], rtol=1e-6
        )
