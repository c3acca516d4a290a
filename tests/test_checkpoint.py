"""Checkpoint/resume tests: sharded TrainState round-trips through orbax.

Covers the reference's checkpoint guarantees (SURVEY.md §5): optimizer
slot state round-trips, sharded embedding tables restore with their
shardings, and training resumes bit-exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from recommenders_tpu import models as models_lib
from recommenders_tpu.embedding import config as config_lib
from recommenders_tpu.layers import blocks
from recommenders_tpu.models import ranking as ranking_model
from recommenders_tpu.parallel import mesh as mesh_lib
from recommenders_tpu.utils import checkpoint as ckpt_lib


def _model():
    table = config_lib.TableConfig(vocabulary_size=300, dim=8, name="item")
    return ranking_model.Ranking(
        feature_configs=(
            config_lib.FeatureConfig(table=table, name="item_id"),
        ),
        bottom_stack=lambda: blocks.MLP(units=(16, 8), final_activation="relu"),
        top_stack=lambda: blocks.MLP(units=(8, 1), final_activation="sigmoid"),
        size_threshold=0,  # Shard the table: exercises sharded restore.
    )


def _batch(seed=0, n=64):
    rng = np.random.RandomState(seed)
    return {
        "dense_features": rng.normal(size=(n, 4)).astype(np.float32),
        "item_id": rng.randint(0, 300, size=n).astype(np.int32),
        "clicked": rng.randint(0, 2, size=n).astype(np.float32),
    }


@pytest.fixture
def trainer():
    mesh = mesh_lib.create_mesh(shape=(4, 2))
    return models_lib.Trainer(_model(), optax.adagrad(0.05), mesh=mesh)


def _states_equal(a, b):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_save_restore_roundtrip(tmp_path, trainer):
    state = trainer.init(jax.random.PRNGKey(0), _batch())
    state, _ = trainer.train_step(state, _batch(1))

    path = str(tmp_path / "ckpt")
    ckpt_lib.save(path, state)
    restored = ckpt_lib.restore(path, template=state)
    _states_equal(state, restored)

    # Restored tables keep their mesh sharding.
    orig = state.params["embedding"]["sharded_embedding"]["item"]
    rest = restored.params["embedding"]["sharded_embedding"]["item"]
    assert rest.sharding == orig.sharding


def test_resume_training_is_bit_exact(tmp_path, trainer):
    state = trainer.init(jax.random.PRNGKey(0), _batch())
    state, _ = trainer.train_step(state, _batch(1))

    path = str(tmp_path / "ckpt")
    ckpt_lib.save(path, state)

    # Branch A: continue directly. Branch B: restore then continue.
    cont, loss_a = trainer.train_step(state, _batch(2))
    restored = ckpt_lib.restore(path, template=state)
    resumed, loss_b = trainer.train_step(restored, _batch(2))

    np.testing.assert_array_equal(np.asarray(loss_a), np.asarray(loss_b))
    _states_equal(cont.params, resumed.params)
    _states_equal(cont.opt_state, resumed.opt_state)


def test_manager_retention_and_latest(tmp_path, trainer):
    state = trainer.init(jax.random.PRNGKey(0), _batch())
    with ckpt_lib.CheckpointManager(
        str(tmp_path / "run"), max_to_keep=2
    ) as mgr:
        for step in (1, 2, 3):
            state, _ = trainer.train_step(state, _batch(step))
            assert mgr.save(step, state)
        assert mgr.latest_step() == 3
        assert mgr.all_steps() == [2, 3]  # max_to_keep=2 dropped step 1.
        restored = mgr.restore(template=state)
        _states_equal(state, restored)


def test_restore_missing_raises(tmp_path, trainer):
    state = trainer.init(jax.random.PRNGKey(0), _batch())
    with ckpt_lib.CheckpointManager(str(tmp_path / "empty")) as mgr:
        with pytest.raises(FileNotFoundError):
            mgr.restore(template=state)


def test_cross_topology_restore(tmp_path):
    """A checkpoint saved from one mesh restores onto another (the
    reference's CPU/TPU layout-compatibility guarantee, by construction)."""
    mesh_a = mesh_lib.create_mesh(shape=(4, 2))
    trainer_a = models_lib.Trainer(_model(), optax.adagrad(0.05), mesh=mesh_a)
    state = trainer_a.init(jax.random.PRNGKey(0), _batch())
    state, _ = trainer_a.train_step(state, _batch(1))
    path = str(tmp_path / "ckpt")
    ckpt_lib.save(path, state)

    mesh_b = mesh_lib.create_mesh(shape=(2, 4))
    trainer_b = models_lib.Trainer(_model(), optax.adagrad(0.05), mesh=mesh_b)
    target = trainer_b.init(jax.random.PRNGKey(1), _batch())
    restored = ckpt_lib.restore(path, template=target)
    _states_equal(state.params, restored.params)
    # Values came from mesh A; shardings follow mesh B's template.
    rest = restored.params["embedding"]["sharded_embedding"]["item"]
    assert rest.sharding.mesh.shape == {"data": 2, "model": 4}


def test_manager_save_interval_policy(tmp_path, trainer):
    """save_interval_steps skips intermediate steps (orbax should_save)."""
    state = trainer.init(jax.random.PRNGKey(0), _batch())
    with ckpt_lib.CheckpointManager(
        str(tmp_path / "interval"), save_interval_steps=5
    ) as mgr:
        saved = [step for step in range(11) if mgr.save(step, state)]
    # Only multiples of the interval persist.
    assert saved == [0, 5, 10], saved
