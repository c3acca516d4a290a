"""Prebuilt DLRM/DCN ranking model with sharded embeddings.

Counterpart of the reference's `tfrs.experimental.models.Ranking` usage:
declare feature/table configs, pick an interaction, train on a synthetic
CTR task, report AUC — with big tables sharded over the mesh's model
axis and small ones replicated (PartialEmbedding routing).
"""

import numpy as np

import jax
import optax

from recommenders_tpu import data, models, optimizers
from recommenders_tpu.embedding import config as cfg
from recommenders_tpu.layers import blocks
from recommenders_tpu.models import ranking as ranking_model


def synthetic_ctr(n=50_000, num_dense=8, seed=0):
    rng = np.random.RandomState(seed)
    dense = rng.normal(size=(n, num_dense)).astype(np.float32)
    user = rng.randint(0, 50_000, n).astype(np.int32)
    item = rng.randint(0, 2_000, n).astype(np.int32)
    logit = 1.5 * dense[:, 0] + ((item % 2) - 0.5)
    clicked = (
        rng.uniform(size=n) < 1.0 / (1.0 + np.exp(-logit))
    ).astype(np.float32)
    return {
        "dense_features": dense,
        "user_id": user,
        "item_id": item,
        "clicked": clicked,
    }


def make_optimizer(kind: str):
    """`adagrad`, or the reference's production split: ClippyAdagrad on
    the embedding tables + Adam on the dense stacks (CompositeOptimizer +
    ClippyAdagrad, experimental/optimizers/*)."""
    if kind == "adagrad":
        return optax.adagrad(0.05)
    return optax.multi_transform(
        {
            "embedding": optimizers.clippy_adagrad(learning_rate=0.05),
            "dense": optax.adam(1e-3),
        },
        ranking_model.embedding_param_labels,
    )


def main(epochs: int = 2, interaction: str = "multi_layer_dcn",
         optimizer: str = "adagrad"):
    user_table = cfg.TableConfig(50_000, 16, name="user")
    item_table = cfg.TableConfig(2_000, 16, name="item")
    feature_configs = (
        cfg.FeatureConfig(table=user_table, name="user_id"),
        cfg.FeatureConfig(table=item_table, name="item_id"),
    )
    if interaction == "dot":
        factory, takes_list = ranking_model.default_interaction, True
    else:
        factory = ranking_model.multi_layer_dcn_interaction()
        takes_list = False

    model = models.Ranking(
        feature_configs=feature_configs,
        bottom_stack=lambda: blocks.MLP(
            units=(64, 16), final_activation="relu"
        ),
        feature_interaction=factory,
        interaction_takes_list=takes_list,
        top_stack=lambda: blocks.MLP(
            units=(64, 1), final_activation="sigmoid"
        ),
        size_threshold=10_000,  # user table sharded, item replicated.
    )
    trainer = models.Trainer(model, make_optimizer(optimizer))
    ctr = synthetic_ctr()
    batcher = data.batched(ctr, 4096, shuffle=True)
    state = trainer.init(jax.random.PRNGKey(0), next(batcher()))
    state, history = trainer.fit(state, batcher, epochs=epochs)
    print(
        f"{optimizer:>14}: final AUC {history['epochs'][-1]['auc']:.4f}"
    )
    return history


if __name__ == "__main__":
    main()
    main(optimizer="clippy_composite")
