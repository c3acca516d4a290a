"""Prebuilt Ranking (DLRM/DCN) model tests.

Mirrors the reference's `experimental/models/ranking_test.py:62-174`: a
sweep over interaction type × concat_dense × size_threshold on synthetic
structured data, asserting the model trains (loss decreases) and reports
its metric groups.
"""

import numpy as np
import pytest

import jax
import optax

from recommenders_tpu import data as data_lib
from recommenders_tpu import models as models_lib
from recommenders_tpu.embedding import config as config_lib
from recommenders_tpu.layers import blocks
from recommenders_tpu.models import ranking as ranking_model


EMBED_DIM = 8


def make_feature_configs():
    user_table = config_lib.TableConfig(
        vocabulary_size=100, dim=EMBED_DIM, name="user"
    )
    item_table = config_lib.TableConfig(
        vocabulary_size=30, dim=EMBED_DIM, name="item"
    )
    return (
        config_lib.FeatureConfig(table=user_table, name="user_id"),
        config_lib.FeatureConfig(table=item_table, name="item_id"),
        # Shares the item table (reference: table sharing across features).
        config_lib.FeatureConfig(table=item_table, name="last_item_id"),
    )


def synthetic_ctr(num_examples=2048, num_dense=4, seed=0):
    """Clicks correlated with a dense feature and a sparse id parity."""
    rng = np.random.RandomState(seed)
    dense = rng.normal(size=(num_examples, num_dense)).astype(np.float32)
    user_id = rng.randint(0, 100, size=num_examples).astype(np.int32)
    item_id = rng.randint(0, 30, size=num_examples).astype(np.int32)
    last_item_id = rng.randint(0, 30, size=num_examples).astype(np.int32)
    logit = 1.5 * dense[:, 0] + 1.0 * ((item_id % 2) - 0.5)
    clicked = (
        rng.uniform(size=num_examples) < 1.0 / (1.0 + np.exp(-logit))
    ).astype(np.float32)
    return {
        "dense_features": dense,
        "user_id": user_id,
        "item_id": item_id,
        "last_item_id": last_item_id,
        "clicked": clicked,
    }


def small_bottom():
    return blocks.MLP(units=(16, EMBED_DIM), final_activation="relu")


def small_top():
    return blocks.MLP(units=(16, 1), final_activation="sigmoid")


def build_model(interaction="dot", concat_dense=True, size_threshold=50):
    if interaction == "dot":
        factory = ranking_model.default_interaction
        takes_list = True
    elif interaction == "cross":
        factory = ranking_model.cross_interaction()
        takes_list = False
    elif interaction == "multi_layer_dcn":
        factory = ranking_model.multi_layer_dcn_interaction(
            num_layers=2, projection_dim=4
        )
        takes_list = False
    else:
        raise ValueError(interaction)
    return ranking_model.Ranking(
        feature_configs=make_feature_configs(),
        bottom_stack=small_bottom,
        feature_interaction=factory,
        top_stack=small_top,
        interaction_takes_list=takes_list,
        concat_dense=concat_dense,
        size_threshold=size_threshold,
    )


@pytest.mark.parametrize("interaction", ["dot", "cross", "multi_layer_dcn"])
@pytest.mark.parametrize("concat_dense", [True, False])
def test_ranking_model_trains(interaction, concat_dense):
    data = synthetic_ctr()
    model = build_model(interaction=interaction, concat_dense=concat_dense)
    trainer = models_lib.Trainer(model, optax.adagrad(0.05))
    sample = next(data_lib.batched(data, 256)())
    state = trainer.init(jax.random.PRNGKey(0), sample)
    dataset = data_lib.batched(data, 256, shuffle=True, seed=1)
    state, history = trainer.fit(state, dataset, epochs=5, verbose=False)

    losses = [e["loss"] for e in history["epochs"]]
    assert losses[-1] < losses[0], losses
    final = history["epochs"][-1]
    for key in ("auc", "accuracy", "label_mean", "prediction_mean"):
        assert key in final, sorted(final)
    # Clicks are predictable from the features; with the dense re-concat
    # AUC must beat chance within a few epochs. Without it the dense
    # signal only reaches the head through dot products with embeddings,
    # which needs far more steps — there (as in the reference's sweep,
    # experimental/models/ranking_test.py:113-174) trainability (the loss
    # assertion above) is the contract.
    if concat_dense:
        assert final["auc"] > 0.6, final


@pytest.mark.parametrize("size_threshold", [None, 0, 50])
def test_size_threshold_routes_tables(size_threshold):
    """size_threshold controls the sharded/replicated split
    (reference: partial_tpu_embedding.py:60-76)."""
    data = synthetic_ctr(num_examples=512)
    model = build_model(size_threshold=size_threshold)
    trainer = models_lib.Trainer(model, optax.adagrad(0.05))
    sample = next(data_lib.batched(data, 128)())
    state = trainer.init(jax.random.PRNGKey(0), sample)

    emb_params = state.params["embedding"]
    if size_threshold is None:
        assert "sharded_embedding" not in emb_params
        assert set(emb_params["dense_embedding"]) == {"user", "item"}
    elif size_threshold == 0:
        assert "dense_embedding" not in emb_params
        assert set(emb_params["sharded_embedding"]) == {"user", "item"}
    else:
        # user vocab 100 > 50 → sharded; item vocab 30 ≤ 50 → replicated.
        assert set(emb_params["sharded_embedding"]) == {"user"}
        assert set(emb_params["dense_embedding"]) == {"item"}

    state, _ = trainer.train_step(state, sample)
    assert np.isfinite(trainer.metric_results(state)["loss"])


def test_sample_weights_respected():
    data = synthetic_ctr(num_examples=512)
    data["sample_weight"] = np.ones_like(data["clicked"])
    model = build_model()
    trainer = models_lib.Trainer(model, optax.adagrad(0.05))
    sample = next(data_lib.batched(data, 128)())
    state = trainer.init(jax.random.PRNGKey(0), sample)
    state, loss = trainer.train_step(state, sample)
    assert np.isfinite(float(loss))


def test_embedding_param_labels_partition():
    model = build_model()
    data = synthetic_ctr(num_examples=256)
    sample = next(data_lib.batched(data, 128)())
    variables = model.init(
        jax.random.PRNGKey(0), sample, training=True, method="compute_loss"
    )
    import flax.linen as nn

    params = nn.meta.unbox(variables["params"])
    labels = ranking_model.embedding_param_labels(params)
    flat = jax.tree_util.tree_leaves(labels)
    assert "embedding" in flat and "dense" in flat

    # Composite optimizer over the partition runs end-to-end.
    optimizer = optax.multi_transform(
        {"embedding": optax.adagrad(0.05), "dense": optax.adam(1e-3)},
        ranking_model.embedding_param_labels,
    )
    trainer = models_lib.Trainer(model, optimizer)
    state = trainer.init(jax.random.PRNGKey(0), sample)
    state, loss = trainer.train_step(state, sample)
    assert np.isfinite(float(loss))
