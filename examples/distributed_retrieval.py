"""Distributed training + corpus-sharded evaluation over a device mesh.

Counterpart of `docs/examples/diststrat_retrieval.ipynb` (MirroredStrategy
on two GPUs): here the strategy IS the mesh — data-parallel training via
batch sharding, and corpus evaluation sharded across devices with a
distributed top-k reduction. Run under
`XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu`
to simulate 8 devices on CPU, or as-is on a TPU slice.
"""

import numpy as np

import jax
import optax

from recommenders_tpu import data, metrics, models, parallel


def main(epochs: int = 2):
    print(f"devices: {jax.device_count()}")
    mesh = parallel.create_mesh()  # All devices on the data axis.
    train, test = data.synthetic_movielens().split(0.8)

    model = models.TwoTowerRetrieval(
        query_tower=lambda: models.EmbeddingTower(train.num_users, 64),
        candidate_tower=lambda: models.EmbeddingTower(train.num_movies, 64),
        query_key="user_id",
        candidate_key="movie_id",
    )
    trainer = models.Trainer(model, optax.adagrad(0.5), mesh=mesh)
    batcher = data.batched(train.as_dict(), 8192, shuffle=True)
    state = trainer.init(jax.random.PRNGKey(0), next(batcher()))
    state, _ = trainer.fit(state, batcher, epochs=epochs)

    # Evaluation with the corpus sharded across all devices.
    movie_ids = np.arange(train.num_movies, dtype=np.int32)
    candidates = model.apply(
        {"params": state.params},
        {"movie_id": movie_ids},
        method="candidate_embeddings",
    )
    index = parallel.ShardedBruteForce(k=100).index(candidates)
    metric = metrics.FactorizedTopK(candidates=index, ks=(10, 100))
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


if __name__ == "__main__":
    main()
