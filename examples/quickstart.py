"""Quickstart: two-tower retrieval on synthetic MovieLens.

Counterpart of the reference's README quickstart / `docs/examples/
quickstart.ipynb`: build user and movie towers, train with in-batch
sampled softmax, index the corpus, retrieve top-k for a user.
"""

import jax
import numpy as np
import optax

from recommenders_tpu import data, metrics, models
from recommenders_tpu.layers import factorized_top_k


def main(epochs: int = 2, batch_size: int = 4096):
    train, test = data.synthetic_movielens().split(0.8)

    model = models.TwoTowerRetrieval(
        query_tower=lambda: models.EmbeddingTower(train.num_users, 64),
        candidate_tower=lambda: models.EmbeddingTower(train.num_movies, 64),
        query_key="user_id",
        candidate_key="movie_id",
    )
    trainer = models.Trainer(model, optax.adagrad(0.5))

    batcher = data.batched_native_or_python(
        train.as_dict(), batch_size, shuffle=True, seed=42
    )
    state = trainer.init(jax.random.PRNGKey(42), next(iter(batcher())))
    state, history = trainer.fit(state, batcher, epochs=epochs)

    # Corpus-level evaluation with a brute-force index over all movies.
    movie_ids = np.arange(train.num_movies, dtype=np.int32)
    candidates = model.apply(
        {"params": state.params},
        {"movie_id": movie_ids},
        method="candidate_embeddings",
    )
    index = factorized_top_k.BruteForce(k=100).index(candidates)
    metric = metrics.FactorizedTopK(candidates=index, ks=(10, 50, 100))
    queries = model.apply(
        {"params": state.params},
        {"user_id": test.user_ids[:4096]},
        method="query_embeddings",
    )
    mstate = metric.update(
        metric.init(), queries, candidates[test.movie_ids[:4096]]
    )
    for name, value in metric.result(mstate).items():
        print(f"{name}: {float(value):.4f}")

    # Serve: top-3 movies for one user, with STRING identifiers — the
    # reference quickstart retrieves movie titles directly; string ids
    # live host-side and results decode on fetch (see layers.TopK).
    titles = np.asarray(
        [f"Movie #{i}" for i in range(train.num_movies)]
    )
    named = factorized_top_k.BruteForce(k=100).index(candidates, titles)
    scores, names = named(queries[:1], k=3)
    print("user 0 recommendations:", names[0].tolist())
    return state


if __name__ == "__main__":
    main()
