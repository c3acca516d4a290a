"""Multitask: joint retrieval + rating with shared towers.

Counterpart of `docs/examples/multitask.ipynb`: sweep loss weights across
rating-only, retrieval-only, and joint configurations (the tutorial's
reported target is rating RMSE ≈ 1.11 on real MovieLens).
"""

import jax
import optax

from recommenders_tpu import data, models


def run(retrieval_weight: float, rating_weight: float, epochs: int = 2):
    train, test = data.synthetic_movielens(num_interactions=30_000).split(0.8)
    train_d = dict(train.as_dict())
    train_d["user_rating"] = train_d.pop("rating")
    test_d = dict(test.as_dict())
    test_d["user_rating"] = test_d.pop("rating")

    model = models.Multitask(
        query_tower=lambda: models.EmbeddingTower(train.num_users, 32),
        candidate_tower=lambda: models.EmbeddingTower(train.num_movies, 32),
        retrieval_weight=retrieval_weight,
        rating_weight=rating_weight,
    )
    trainer = models.Trainer(model, optax.adagrad(0.2))
    batcher = data.batched(train_d, 4096, shuffle=True)
    state = trainer.init(jax.random.PRNGKey(0), next(batcher()))
    state, _ = trainer.fit(state, batcher, epochs=epochs, verbose=False)
    results = trainer.evaluate(state, data.batched(test_d, 8192))
    print(
        f"retrieval_w={retrieval_weight} rating_w={rating_weight}: "
        f"RMSE={results['rating_rmse']:.4f} "
        f"batch_top10={results['batch_top_10_categorical_accuracy']:.4f}"
    )
    return results


def main():
    run(retrieval_weight=0.0, rating_weight=1.0)  # Rating-specialized.
    run(retrieval_weight=1.0, rating_weight=0.0)  # Retrieval-specialized.
    run(retrieval_weight=1.0, rating_weight=1.0)  # Joint.


if __name__ == "__main__":
    main()
