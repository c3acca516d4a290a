"""Hybrid (dense-optax + embedding-engine) trainer tests.

Oracle: with SGD on both sides, the hybrid step must exactly equal full
dense autodiff with SGD over everything — the CPU/TPU-equivalence
guarantee for the production DLRM split."""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from recommenders_tpu import tasks as tasks_lib
from recommenders_tpu.embedding import config as cfg
from recommenders_tpu.embedding import embedding as embedding_lib
from recommenders_tpu.embedding import engine as engine_lib
from recommenders_tpu.models import hybrid as hybrid_lib
from recommenders_tpu.parallel import mesh as mesh_lib


class DenseHead(nn.Module):
    @nn.compact
    def __call__(self, batch, acts):
        x = jnp.concatenate([acts["user_id"], acts["item_id"]], axis=-1)
        pred = nn.Dense(1, name="head")(x)[:, 0]
        loss = jnp.mean(jnp.square(pred - batch["label"]))
        return loss, pred


def _setup(lr=0.1):
    configs = (
        cfg.FeatureConfig(
            table=cfg.TableConfig(
                50, 8, name="user",
                optimizer=cfg.OptimizerSpec(kind="sgd", learning_rate=lr),
            ),
            name="user_id",
        ),
        cfg.FeatureConfig(
            table=cfg.TableConfig(
                40, 8, name="item",
                optimizer=cfg.OptimizerSpec(kind="sgd", learning_rate=lr),
            ),
            name="item_id",
        ),
    )
    engine = engine_lib.EmbeddingEngine(configs)
    return configs, engine


def _batch(seed=0, n=16):
    rng = np.random.RandomState(seed)
    return {
        "user_id": jnp.asarray(rng.randint(0, 50, n), jnp.int32),
        "item_id": jnp.asarray(rng.randint(0, 40, n), jnp.int32),
        "label": jnp.asarray(rng.normal(size=n), jnp.float32),
    }


def test_hybrid_matches_full_dense_autodiff():
    configs, engine = _setup(lr=0.1)
    trainer = hybrid_lib.HybridTrainer(
        DenseHead(), engine, optax.sgd(0.1)
    )
    batch = _batch()
    state = trainer.init(jax.random.PRNGKey(0), batch)
    tables0 = jax.tree_util.tree_map(np.asarray, state.engine_state.tables)
    params0 = jax.tree_util.tree_map(np.asarray, state.params)

    new_state, loss, pred = trainer.train_step(state, batch)

    # Dense oracle: same loss through autodiff over tables AND head.
    fconfigs = {fc.name: fc for fc in configs}
    head = DenseHead()

    def oracle_loss(all_params):
        acts = {
            name: embedding_lib.lookup_feature(
                all_params["tables"][fconfigs[name].table.name],
                fconfigs[name],
                batch[name],
            )
            for name in ("user_id", "item_id")
        }
        loss, _ = head.apply({"params": all_params["head"]}, batch, acts)
        return loss

    all_params = {"tables": tables0, "head": params0}
    grads = jax.grad(oracle_loss)(
        jax.tree_util.tree_map(jnp.asarray, all_params)
    )
    for name in ("user", "item"):
        expected = tables0[name] - 0.1 * np.asarray(
            grads["tables"][name]
        )
        np.testing.assert_allclose(
            np.asarray(new_state.engine_state.tables[name]),
            expected,
            rtol=1e-5,
            atol=1e-7,
        )
    expected_head = jax.tree_util.tree_map(
        lambda p, g: np.asarray(p) - 0.1 * np.asarray(g),
        params0,
        grads["head"],
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(new_state.params),
        jax.tree_util.tree_leaves(expected_head),
    ):
        np.testing.assert_allclose(
            np.asarray(a), b, rtol=1e-5, atol=1e-7
        )


def test_hybrid_learns():
    _, engine = _setup(lr=0.5)
    trainer = hybrid_lib.HybridTrainer(
        DenseHead(), engine, optax.adam(1e-2)
    )
    batch = _batch(seed=1, n=64)
    state = trainer.init(jax.random.PRNGKey(0), batch)
    losses = []
    for _ in range(60):
        state, loss, _ = trainer.train_step(state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.3, (losses[0], losses[-1])


def test_hybrid_pipelined_applies_all_updates():
    _, engine = _setup(lr=0.1)
    trainer = hybrid_lib.HybridTrainer(
        DenseHead(), engine, optax.sgd(0.1), pipelined=True
    )
    batch = _batch(seed=2)
    state = trainer.init(jax.random.PRNGKey(0), batch)
    t0 = np.asarray(state.engine_state.tables["user"])

    # First step: engine untouched (update is pending).
    state, _, _ = trainer.train_step(state, batch)
    np.testing.assert_array_equal(
        np.asarray(state.engine_state.tables["user"]), t0
    )
    # Second step applies the first step's update.
    state, _, _ = trainer.train_step(state, _batch(seed=3))
    assert not np.allclose(
        np.asarray(state.engine_state.tables["user"]), t0
    )
    # Finalize applies the last pending one.
    assert state.pending is not None
    state = trainer.finalize(state)
    assert state.pending is None
    assert int(state.engine_state.step) == 2


def test_hybrid_with_retrieval_task_and_sharded_engine():
    mesh = mesh_lib.create_mesh(shape=(2, 4))
    configs = (
        cfg.FeatureConfig(
            table=cfg.TableConfig(200, 16, name="u"), name="user_id"
        ),
        cfg.FeatureConfig(
            table=cfg.TableConfig(300, 16, name="i"), name="item_id"
        ),
    )
    engine = engine_lib.EmbeddingEngine(configs, mesh=mesh)

    class RetrievalHead(nn.Module):
        @nn.compact
        def __call__(self, batch, acts):
            task = tasks_lib.Retrieval()
            q = nn.Dense(16)(acts["user_id"])
            c = nn.Dense(16)(acts["item_id"])
            return task(q, c).loss

    trainer = hybrid_lib.HybridTrainer(
        RetrievalHead(), engine, optax.adagrad(0.1)
    )
    rng = np.random.RandomState(4)
    batch = {
        "user_id": jnp.asarray(rng.randint(0, 200, 32), jnp.int32),
        "item_id": jnp.asarray(rng.randint(0, 300, 32), jnp.int32),
    }
    state = trainer.init(jax.random.PRNGKey(0), batch)
    losses = []
    for _ in range(5):
        state, loss, _ = trainer.train_step(state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    # Trailing None is normalized away after the jit round-trip.
    assert state.engine_state.tables["u"].sharding.spec[0] == "model"
