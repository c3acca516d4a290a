"""End-to-end integration tests: tiny fit/evaluate of retrieval, ranking,
and joint multitask models (mirrors the reference's `models/base_test.py`).
"""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

import recommenders_tpu as rtpu
from recommenders_tpu import data as data_lib
from recommenders_tpu import metrics as metrics_lib
from recommenders_tpu import models as models_lib
from recommenders_tpu import tasks as tasks_lib
from recommenders_tpu.layers import factorized_top_k


class TwoTowerModel(models_lib.Model):
    num_users: int
    num_movies: int
    dim: int = 32

    def setup(self):
        self.user_emb = nn.Embed(self.num_users, self.dim)
        self.movie_emb = nn.Embed(self.num_movies, self.dim)
        self.task = tasks_lib.Retrieval()

    def compute_loss(self, batch, training=False):
        q = self.user_emb(batch["user_id"])
        c = self.movie_emb(batch["movie_id"])
        out = self.task(q, c)
        return out.loss, {"logits": out.logits, "labels": out.labels}

    def metrics(self):
        return {"batch_accuracy": metrics_lib.CategoricalAccuracy()}

    def update_metrics(self, states, batch, aux):
        m = metrics_lib.CategoricalAccuracy()
        return {
            "batch_accuracy": m.update(
                states["batch_accuracy"], aux["labels"], aux["logits"]
            )
        }


class RatingModel(models_lib.Model):
    num_users: int
    num_movies: int
    dim: int = 32

    def setup(self):
        self.user_emb = nn.Embed(self.num_users, self.dim)
        self.movie_emb = nn.Embed(self.num_movies, self.dim)
        self.mlp = rtpu.layers.blocks.MLP(units=[32, 1])
        self.task = tasks_lib.Ranking(loss_fn=tasks_lib.mean_squared_error)

    def _predict(self, batch):
        x = jnp.concatenate(
            [
                self.user_emb(batch["user_id"]),
                self.movie_emb(batch["movie_id"]),
            ],
            axis=-1,
        )
        return self.mlp(x)[:, 0]

    def compute_loss(self, batch, training=False):
        pred = self._predict(batch)
        out = self.task(batch["rating"], pred)
        return out.loss, {"labels": out.labels, "predictions": out.predictions}

    def metrics(self):
        return {"rmse": metrics_lib.RootMeanSquaredError()}

    def update_metrics(self, states, batch, aux):
        m = metrics_lib.RootMeanSquaredError()
        return {
            "rmse": m.update(
                states["rmse"], aux["labels"], aux["predictions"]
            )
        }


class JointModel(models_lib.Model):
    """Multitask: retrieval + rating with shared towers."""

    num_users: int
    num_movies: int
    dim: int = 32
    retrieval_weight: float = 1.0
    rating_weight: float = 1.0

    def setup(self):
        self.user_emb = nn.Embed(self.num_users, self.dim)
        self.movie_emb = nn.Embed(self.num_movies, self.dim)
        self.rating_head = rtpu.layers.blocks.MLP(units=[16, 1])
        self.retrieval_task = tasks_lib.Retrieval()
        self.rating_task = tasks_lib.Ranking(
            loss_fn=tasks_lib.mean_squared_error
        )

    def compute_loss(self, batch, training=False):
        q = self.user_emb(batch["user_id"])
        c = self.movie_emb(batch["movie_id"])
        retrieval_out = self.retrieval_task(q, c)
        pred = self.rating_head(jnp.concatenate([q, c], axis=-1))[:, 0]
        rating_out = self.rating_task(batch["rating"], pred)
        loss = (
            self.retrieval_weight * retrieval_out.loss
            + self.rating_weight * rating_out.loss
        )
        return loss, {}


@pytest.fixture(scope="module")
def ml_data():
    ds = data_lib.synthetic_movielens(
        num_users=200,
        num_movies=400,
        num_interactions=20_000,
        num_clusters=8,
        seed=0,
    )
    return ds.split(0.8)


def test_two_tower_learns(ml_data):
    train, test = ml_data
    model = TwoTowerModel(
        num_users=train.num_users, num_movies=train.num_movies
    )
    trainer = models_lib.Trainer(model, optax.adagrad(0.3))
    sample = next(data_lib.batched(train.as_dict(), 256)())
    state = trainer.init(jax.random.PRNGKey(0), sample)

    dataset = data_lib.batched(
        train.as_dict(), 256, shuffle=True, seed=1
    )
    state, history = trainer.fit(state, dataset, epochs=5, verbose=False)

    losses = [e["loss"] for e in history["epochs"]]
    assert losses[-1] < losses[0] * 0.9, losses
    # Random batch accuracy would be 1/256 ~ 0.004.
    assert history["epochs"][-1]["batch_accuracy"] > 0.03

    # Corpus-level eval: the model must clearly beat the random baseline.
    movie_table = np.asarray(state.params["movie_emb"]["embedding"])
    user_table = np.asarray(state.params["user_emb"]["embedding"])
    index = factorized_top_k.BruteForce(k=100).index(
        jnp.asarray(movie_table)
    )
    metric = metrics_lib.FactorizedTopK(candidates=index, ks=(10, 100))
    mstate = metric.init()
    test_d = test.as_dict()
    mstate = metric.update(
        mstate,
        jnp.asarray(user_table[test_d["user_id"][:2000]]),
        jnp.asarray(movie_table[test_d["movie_id"][:2000]]),
    )
    results = metric.result(mstate)
    top100 = float(
        results["factorized_top_k/top_100_categorical_accuracy"]
    )
    # Random baseline would be 100/400 = 0.25.
    assert top100 > 0.4, results


def test_rating_model_trains_and_evaluates(ml_data):
    train, test = ml_data
    model = RatingModel(
        num_users=train.num_users, num_movies=train.num_movies
    )
    trainer = models_lib.Trainer(model, optax.adam(1e-2))
    sample = next(data_lib.batched(train.as_dict(), 256)())
    state = trainer.init(jax.random.PRNGKey(0), sample)

    dataset = data_lib.batched(train.as_dict(), 256, shuffle=True)
    state, history = trainer.fit(state, dataset, epochs=3, verbose=False)
    assert (
        history["epochs"][-1]["rmse"] < history["epochs"][0]["rmse"]
    )

    eval_results = trainer.evaluate(
        state, data_lib.batched(test.as_dict(), 256)
    )
    # Synthetic ratings have std ~1; a fitted model should beat 1.2 RMSE.
    assert eval_results["rmse"] < 1.2
    assert "loss" in eval_results and "total_loss" in eval_results


def test_joint_multitask_trains(ml_data):
    train, _ = ml_data
    model = JointModel(
        num_users=train.num_users,
        num_movies=train.num_movies,
        retrieval_weight=1.0,
        rating_weight=0.5,
    )
    trainer = models_lib.Trainer(model, optax.adagrad(0.1))
    sample = next(data_lib.batched(train.as_dict(), 128)())
    state = trainer.init(jax.random.PRNGKey(0), sample)
    dataset = data_lib.batched(train.as_dict(), 128, shuffle=True)
    state, history = trainer.fit(state, dataset, epochs=2, verbose=False)
    losses = [e["loss"] for e in history["epochs"]]
    assert losses[-1] < losses[0]


class RegularizedModel(models_lib.Model):
    def setup(self):
        self.emb = nn.Embed(10, 4)
        self.task = tasks_lib.Ranking(loss_fn=tasks_lib.mean_squared_error)

    def compute_loss(self, batch, training=False):
        pred = jnp.sum(self.emb(batch["x"]), axis=-1)
        return self.task(batch["y"], pred).loss

    def regularization_loss(self):
        # L2 on the embedding table, like keras kernel_regularizer.
        return 0.01 * jnp.sum(jnp.square(self.emb.embedding))


def test_regularization_loss_reported_and_applied():
    model = RegularizedModel()
    trainer = models_lib.Trainer(model, optax.sgd(0.1))
    batch = {
        "x": np.asarray([1, 2, 3], np.int32),
        "y": np.asarray([1.0, 2.0, 3.0], np.float32),
    }
    state = trainer.init(jax.random.PRNGKey(0), batch)
    state, _ = trainer.train_step(state, batch)
    results = trainer.metric_results(state)
    assert results["regularization_loss"] > 0.0
    np.testing.assert_allclose(
        results["total_loss"],
        results["loss"] + results["regularization_loss"],
        rtol=1e-5,
    )


def test_data_parallel_equals_expected_devices():
    # Sanity: the trainer's default mesh spans all 8 virtual CPU devices.
    trainer = models_lib.Trainer(
        TwoTowerModel(num_users=8, num_movies=8), optax.sgd(0.1)
    )
    assert trainer.mesh.devices.size == jax.device_count()


def test_fit_with_validation_data(ml_data):
    train, test = ml_data
    model = RatingModel(
        num_users=train.num_users, num_movies=train.num_movies
    )
    trainer = models_lib.Trainer(model, optax.adam(1e-2))
    sample = next(data_lib.batched(train.as_dict(), 256)())
    state = trainer.init(jax.random.PRNGKey(0), sample)
    state, history = trainer.fit(
        state,
        data_lib.batched(train.as_dict(), 256, shuffle=True),
        epochs=2,
        verbose=False,
        validation_data=data_lib.batched(test.as_dict(), 256),
    )
    final = history["epochs"][-1]
    assert "val_rmse" in final and "val_loss" in final
    assert np.isfinite(final["val_rmse"])
    # Validation metrics come from the held-out split, train from train.
    assert final["val_rmse"] != final["rmse"]
