"""Deeper retrieval models: stacking dense layers on the towers.

Counterpart of `docs/examples/deep_recommenders.ipynb`: starting from
the embedding-only two-tower retrieval model, add hidden layers to both
towers and compare corpus-level top-k accuracy. The reference reports
top-100 ≈ 0.27 for 1-layer and ≈ 0.29 for 2-layer towers on real
ML-100K (BASELINE.md); on synthetic interactions the absolute numbers
differ but the comparison methodology is the same — and, as the
reference notebook stresses, deeper is NOT automatically better:
with plain ids and enough epochs the embedding-only model is already
near its ceiling, so depth pays off only with richer features (see
examples/context_features.py).
"""

import jax
import numpy as np
import optax

from recommenders_tpu import data, metrics, models


def train_and_eval(train, test, mlp_units, epochs=3):
    model = models.TwoTowerRetrieval(
        query_tower=lambda: models.EmbeddingTower(
            train.num_users, 64, mlp_units=mlp_units
        ),
        candidate_tower=lambda: models.EmbeddingTower(
            train.num_movies, 64, mlp_units=mlp_units
        ),
        query_key="user_id",
        candidate_key="movie_id",
    )
    trainer = models.Trainer(model, optax.adagrad(0.1))
    batcher = data.batched(
        train.as_dict(), 4096, shuffle=True, seed=42
    )
    state = trainer.init(jax.random.PRNGKey(42), next(iter(batcher())))
    state, _ = trainer.fit(state, batcher, epochs=epochs, verbose=False)

    candidates = model.apply(
        {"params": state.params},
        {"movie_id": np.arange(train.num_movies, dtype=np.int32)},
        method="candidate_embeddings",
    )
    from recommenders_tpu.layers import factorized_top_k

    index = factorized_top_k.BruteForce(k=100).index(candidates)
    metric = metrics.FactorizedTopK(candidates=index, ks=(10, 100))
    queries = model.apply(
        {"params": state.params},
        {"user_id": test.user_ids[:4096]},
        method="query_embeddings",
    )
    mstate = metric.update(
        metric.init(), queries, candidates[test.movie_ids[:4096]]
    )
    return {
        name: float(v) for name, v in metric.result(mstate).items()
    }


def main():
    train, test = data.synthetic_movielens(
        num_interactions=60_000
    ).split(0.8)
    layer_configs = {
        "embedding-only": (),
        "1 hidden layer": (64, 32),
    }
    results = {}
    for name, units in layer_configs.items():
        results[name] = train_and_eval(train, test, units)
        print(
            f"{name:16s} top-10 "
            f"{results[name]['factorized_top_k/top_10_categorical_accuracy']:.4f}"
            f"  top-100 "
            f"{results[name]['factorized_top_k/top_100_categorical_accuracy']:.4f}"
        )
    return results


if __name__ == "__main__":
    main()
