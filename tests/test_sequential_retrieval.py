"""Sequential retrieval family tests: encoders, prebuilt two-tower and
multitask models (mirrors the reference's sequential_retrieval / multitask
tutorial behavior on synthetic data)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from recommenders_tpu import data as data_lib
from recommenders_tpu import models as models_lib
from recommenders_tpu.embedding.config import PAD_ID
from recommenders_tpu.layers import sequential as sequential_lib


# --- Encoders ------------------------------------------------------------


def test_gru_padding_positions_do_not_change_state():
    enc = sequential_lib.GRUEncoder(units=8)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=(4, 6, 5)), jnp.float32)
    mask_full = jnp.ones((4, 6), bool)
    # Same data, but last 3 positions masked; should equal encoding of the
    # first 3 positions alone.
    mask_half = jnp.asarray([[True] * 3 + [False] * 3] * 4)
    params = enc.init(jax.random.PRNGKey(0), x, mask_full)
    out_half = enc.apply(params, x, mask_half)
    out_prefix = enc.apply(params, x[:, :3], jnp.ones((4, 3), bool))
    np.testing.assert_allclose(
        np.asarray(out_half), np.asarray(out_prefix), rtol=1e-5, atol=1e-6
    )


def test_gru_order_sensitivity():
    """A recurrent encoder must distinguish sequence orderings."""
    enc = sequential_lib.GRUEncoder(units=8)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.normal(size=(1, 5, 4)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)
    fwd = enc.apply(params, x)
    rev = enc.apply(params, x[:, ::-1])
    assert not np.allclose(np.asarray(fwd), np.asarray(rev), atol=1e-4)


def test_attention_masked_positions_are_ignored():
    enc = sequential_lib.SelfAttentionEncoder(num_heads=2)
    rng = np.random.RandomState(2)
    x = np.asarray(rng.normal(size=(2, 6, 8)), np.float32)
    mask = np.asarray([[True] * 4 + [False] * 2] * 2)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask))
    out1 = enc.apply(params, jnp.asarray(x), jnp.asarray(mask))
    x2 = x.copy()
    x2[:, 4:] = 99.0  # Garbage in masked positions must not matter.
    out2 = enc.apply(params, jnp.asarray(x2), jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out2), rtol=1e-4, atol=1e-4
    )


# --- Sequential two-tower retrieval --------------------------------------


def _sequence_data(num_items=60, n=6000, length=5, seed=0):
    """Next-item data with a learnable rule: next = last item + 1 (mod V),
    with ragged histories (padded) so masking matters."""
    rng = np.random.RandomState(seed)
    histories = np.full((n, length), PAD_ID, np.int32)
    labels = np.empty((n,), np.int32)
    for i in range(n):
        hist_len = rng.randint(1, length + 1)
        seq = rng.randint(0, num_items, size=hist_len)
        histories[i, :hist_len] = seq
        labels[i] = (seq[-1] + 1) % num_items
    return {"history": histories, "next_movie": labels}


@pytest.mark.parametrize("encoder", ["gru", "attention"])
def test_sequential_retrieval_learns_next_item(encoder):
    num_items = 60
    data = _sequence_data(num_items=num_items)
    model = models_lib.TwoTowerRetrieval(
        query_tower=lambda: models_lib.SequenceTower(
            vocab_size=num_items, embedding_dim=32, encoder=encoder
        ),
        candidate_tower=lambda: models_lib.EmbeddingTower(num_items, 32),
        query_key="history",
        candidate_key="next_movie",
        batch_metric_ks=(1, 10),
    )
    trainer = models_lib.Trainer(model, optax.adam(5e-3))
    sample = next(data_lib.batched(data, 256)())
    state = trainer.init(jax.random.PRNGKey(0), sample)
    dataset = data_lib.batched(data, 256, shuffle=True, seed=1)
    state, history = trainer.fit(state, dataset, epochs=6, verbose=False)
    final = history["epochs"][-1]
    losses = [e["loss"] for e in history["epochs"]]
    assert losses[-1] < losses[0] * 0.7, losses
    # Rule is deterministic given the last item: far above chance (1/256).
    assert final["batch_top_10_categorical_accuracy"] > 0.3, final


def test_two_tower_options_accidental_hits_and_temperature():
    ds = data_lib.synthetic_movielens(
        num_users=100, num_movies=200, num_interactions=5000, seed=1
    )
    data = ds.as_dict()
    model = models_lib.TwoTowerRetrieval(
        query_tower=lambda: models_lib.EmbeddingTower(100, 16),
        candidate_tower=lambda: models_lib.EmbeddingTower(200, 16),
        query_key="user_id",
        candidate_key="movie_id",
        temperature=0.1,
        remove_accidental_hits=True,
    )
    trainer = models_lib.Trainer(model, optax.adagrad(0.1))
    sample = next(data_lib.batched(data, 128)())
    state = trainer.init(jax.random.PRNGKey(0), sample)
    state, loss = trainer.train_step(state, sample)
    assert np.isfinite(float(loss))


# --- Multitask ------------------------------------------------------------


def test_multitask_joint_beats_rating_only_start():
    ds = data_lib.synthetic_movielens(
        num_users=200, num_movies=300, num_interactions=20_000, seed=2
    )
    train, test = ds.split(0.8)
    data = dict(train.as_dict())
    data["user_rating"] = data.pop("rating")
    model = models_lib.Multitask(
        query_tower=lambda: models_lib.EmbeddingTower(200, 32),
        candidate_tower=lambda: models_lib.EmbeddingTower(300, 32),
        retrieval_weight=1.0,
        rating_weight=1.0,
    )
    trainer = models_lib.Trainer(model, optax.adagrad(0.1))
    sample = next(data_lib.batched(data, 256)())
    state = trainer.init(jax.random.PRNGKey(0), sample)
    dataset = data_lib.batched(data, 256, shuffle=True)
    state, history = trainer.fit(state, dataset, epochs=3, verbose=False)
    final = history["epochs"][-1]
    # Tutorial target is RMSE ≈ 1.11 on real MovieLens; synthetic ratings
    # have noise σ=0.8, so a fitted model should approach that.
    assert final["rating_rmse"] < 1.2, final
    assert final["batch_top_10_categorical_accuracy"] > 0.05, final

    test_data = dict(test.as_dict())
    test_data["user_rating"] = test_data.pop("rating")
    results = trainer.evaluate(state, data_lib.batched(test_data, 256))
    assert results["rating_rmse"] < 1.3, results


def test_multitask_zero_weight_disables_task():
    """rating_weight=0 must leave the rating head untrained (tutorial's
    retrieval-only configuration)."""
    ds = data_lib.synthetic_movielens(
        num_users=50, num_movies=80, num_interactions=2000, seed=3
    )
    data = dict(ds.as_dict())
    data["user_rating"] = data.pop("rating")
    model = models_lib.Multitask(
        query_tower=lambda: models_lib.EmbeddingTower(50, 8),
        candidate_tower=lambda: models_lib.EmbeddingTower(80, 8),
        retrieval_weight=1.0,
        rating_weight=0.0,
    )
    trainer = models_lib.Trainer(model, optax.sgd(0.1))
    sample = next(data_lib.batched(data, 128)())
    state = trainer.init(jax.random.PRNGKey(0), sample)
    before = jax.tree_util.tree_map(
        np.asarray, state.params["_rating"]
    )
    state, _ = trainer.train_step(state, sample)
    after = jax.tree_util.tree_map(np.asarray, state.params["_rating"])
    for b, a in zip(
        jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)
    ):
        np.testing.assert_array_equal(b, a)


def test_trainer_supports_dropout_rngs():
    """Stochastic layers work in the jitted step (rng threads per step)."""
    import flax.linen as nn

    class DropTower(nn.Module):
        vocab: int

        @nn.compact
        def __call__(self, ids):
            x = nn.Embed(self.vocab, 16)(ids)
            # Deterministic only outside training; Trainer passes the
            # "dropout" rng stream during train steps.
            return nn.Dropout(rate=0.5, deterministic=False)(x)

    model = models_lib.TwoTowerRetrieval(
        query_tower=lambda: DropTower(50),
        candidate_tower=lambda: models_lib.EmbeddingTower(60, 16),
        query_key="user_id",
        candidate_key="movie_id",
    )
    trainer = models_lib.Trainer(model, optax.sgd(0.1))
    rng = np.random.RandomState(0)
    batch = {
        "user_id": rng.randint(0, 50, 32).astype(np.int32),
        "movie_id": rng.randint(0, 60, 32).astype(np.int32),
    }
    state = trainer.init(jax.random.PRNGKey(0), batch)
    state, l1 = trainer.train_step(state, batch)
    state, l2 = trainer.train_step(state, batch)
    # Fresh dropout masks each step: identical batches, different losses.
    assert float(l1) != float(l2)


def test_sampled_extra_negatives():
    model = models_lib.TwoTowerRetrieval(
        query_tower=lambda: models_lib.EmbeddingTower(50, 16),
        candidate_tower=lambda: models_lib.EmbeddingTower(500, 16),
        query_key="user_id",
        candidate_key="movie_id",
        num_extra_negatives=64,
        candidate_vocab_size=500,
        remove_accidental_hits=True,
    )
    trainer = models_lib.Trainer(model, optax.adagrad(0.1))
    rng = np.random.RandomState(1)
    batch = {
        "user_id": rng.randint(0, 50, 32).astype(np.int32),
        "movie_id": rng.randint(0, 500, 32).astype(np.int32),
    }
    state = trainer.init(jax.random.PRNGKey(0), batch)
    state, loss = trainer.train_step(state, batch)
    assert np.isfinite(float(loss))
    # Logits widen to batch + extras during training.
    variables = {"params": state.params}
    out_loss, aux = model.apply(
        variables, batch, training=True, method="compute_loss",
        rngs={"sampling": jax.random.PRNGKey(3)},
    )
    assert aux["retrieval"].scores.shape == (32, 32 + 64)
    # Eval path samples nothing.
    _, eval_aux = model.apply(
        variables, batch, training=False, method="compute_loss"
    )
    assert eval_aux["retrieval"].scores.shape == (32, 32)
