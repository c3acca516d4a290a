"""Cross-shard negative pooling: SPMD training must equal single-device
training on the full global batch (the point of the pooled softmax)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from recommenders_tpu import models as models_lib
from recommenders_tpu.parallel import mesh as mesh_lib
from recommenders_tpu.parallel import retrieval_step
from recommenders_tpu.tasks import retrieval as retrieval_task


def _model():
    return models_lib.TwoTowerRetrieval(
        query_tower=lambda: models_lib.EmbeddingTower(100, 16),
        candidate_tower=lambda: models_lib.EmbeddingTower(200, 16),
    )


def _batch(n=64, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "user_id": rng.randint(0, 100, n).astype(np.int32),
        "movie_id": rng.randint(0, 200, n).astype(np.int32),
    }


def test_pooled_loss_equals_single_device():
    """Sum-reduced in-batch CE over pooled candidates == full-batch CE."""
    mesh = mesh_lib.create_mesh(shape=(8, 1))
    model = _model()
    batch = _batch()
    params = model.init(
        jax.random.PRNGKey(0), batch, method="compute_loss"
    )["params"]

    # Single-device oracle: full batch at once.
    oracle_loss, _ = model.apply(
        {"params": params}, batch, method="compute_loss"
    )

    opt = optax.sgd(0.0)  # lr 0: isolates the loss value.
    step = retrieval_step.make_pooled_negatives_train_step(
        model, opt, mesh
    )
    sharded_batch = mesh_lib.shard_batch(batch, mesh)
    _, _, pooled_loss = step(params, opt.init(params), sharded_batch)
    np.testing.assert_allclose(
        float(pooled_loss), float(oracle_loss), rtol=1e-5
    )


def test_pooled_gradients_match_single_device():
    mesh = mesh_lib.create_mesh(shape=(8, 1))
    model = _model()
    batch = _batch(seed=1)
    params = model.init(
        jax.random.PRNGKey(1), batch, method="compute_loss"
    )["params"]

    def oracle_loss(params):
        loss, _ = model.apply(
            {"params": params}, batch, method="compute_loss"
        )
        return loss

    oracle_grads = jax.grad(oracle_loss)(params)
    # Computed BEFORE the step: the step donates its params argument.
    expected = jax.tree_util.tree_map(
        lambda p, g: np.asarray(p) - np.asarray(g), params, oracle_grads
    )

    # One SGD step with lr 1.0: params' = params - grads.
    opt = optax.sgd(1.0)
    opt_state = opt.init(params)
    step = retrieval_step.make_pooled_negatives_train_step(
        model, opt, mesh
    )
    new_params, _, _ = step(
        params, opt_state, mesh_lib.shard_batch(batch, mesh)
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(new_params),
        jax.tree_util.tree_leaves(expected),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_pooled_trainer_learns():
    from recommenders_tpu import data as data_lib

    ds = data_lib.synthetic_movielens(
        num_users=100, num_movies=200, num_interactions=10_000,
        num_clusters=5, seed=2,
    )
    mesh = mesh_lib.create_mesh(shape=(8, 1))
    trainer = retrieval_step.PooledNegativesTrainer(
        _model(), optax.adagrad(0.3), mesh=mesh
    )
    sample = next(data_lib.batched(ds.as_dict(), 256)())
    state = trainer.init(jax.random.PRNGKey(0), sample)
    losses = []
    for batch in data_lib.batched(ds.as_dict(), 256, shuffle=True)():
        state, loss = trainer.train_step(state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, (losses[0], losses[-1])


def test_pooled_trainer_evaluate_without_track_stats():
    """Regression: evaluate()/fit(validation_data=...) must work on any
    Trainer with track_stats=False (PooledNegativesTrainer forces it);
    previously the eval step crashed with KeyError 'loss' on the empty
    loss-state dict."""
    from recommenders_tpu import data as data_lib

    mesh = mesh_lib.create_mesh(shape=(8, 1))
    trainer = retrieval_step.PooledNegativesTrainer(
        _model(), optax.adagrad(0.1), mesh=mesh
    )
    assert trainer.track_stats is False
    batches = lambda: iter([_batch(seed=3), _batch(seed=4)])
    state = trainer.init(jax.random.PRNGKey(0), _batch(seed=3))
    results = trainer.evaluate(state, batches)
    assert set(results) == {"total_loss"}
    assert np.isfinite(results["total_loss"])
    # And through fit's validation_data path.
    state, history = trainer.fit(
        state, batches, epochs=1, verbose=False,
        validation_data=batches,
    )
    assert np.isfinite(history["epochs"][0]["val_total_loss"])


def test_cross_replica_concat_roll_ordering():
    """Own shard's rows come first after the concat (identity labels)."""
    mesh = mesh_lib.create_mesh(shape=(4, 2))
    x = jnp.arange(8, dtype=jnp.float32).reshape(8, 1)

    from jax.sharding import PartitionSpec as P

    def fn(x):
        pooled = retrieval_task.cross_replica_concat(x, "data")
        return pooled

    out = jax.jit(
        jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=P("data"),
            out_specs=P("data"),
            check_vma=False,
        )
    )(x)
    # Shard 0 holds rows [0,1]; its pooled output starts with [0,1].
    np.testing.assert_allclose(np.asarray(out)[0, 0], 0.0)
    # Shard 1 (global rows 2..3 of output) starts with its own rows [2,3].
    np.testing.assert_allclose(np.asarray(out)[8, 0], 2.0)
