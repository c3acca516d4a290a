"""Context features: enriching towers beyond bare ids.

Counterpart of `docs/examples/context_features.ipynb`: the query tower
combines the user id with context (timestamp bucket); the reference
reports this lifts top-100 accuracy over the ≈0.2 id-only baseline.
"""

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from recommenders_tpu import data, models


class ContextQueryTower(nn.Module):
    num_users: int
    num_time_buckets: int = 100
    dim: int = 32

    @nn.compact
    def __call__(self, inputs):
        user, time_bucket = inputs["user_id"], inputs["timestamp_bucket"]
        x = jnp.concatenate(
            [
                nn.Embed(self.num_users, self.dim)(user),
                nn.Embed(self.num_time_buckets, self.dim // 2)(
                    time_bucket
                ),
            ],
            axis=-1,
        )
        return nn.Dense(self.dim)(nn.relu(nn.Dense(64)(x)))


def main(epochs: int = 3):
    train, test = data.synthetic_movielens().split(0.8)

    def with_context(split):
        d = dict(split.as_dict())
        lo, hi = d["timestamp"].min(), d["timestamp"].max()
        d["timestamp_bucket"] = (
            (d["timestamp"] - lo) * 99 // max(1, hi - lo)
        ).astype(np.int32)
        return d

    model = models.TwoTowerRetrieval(
        query_tower=lambda: ContextQueryTower(num_users=train.num_users),
        candidate_tower=lambda: models.EmbeddingTower(
            train.num_movies, 32
        ),
        query_key=("user_id", "timestamp_bucket"),
        candidate_key="movie_id",
        batch_metric_ks=(10, 100),
    )
    trainer = models.Trainer(model, optax.adagrad(0.3))
    train_d = with_context(train)
    batcher = data.batched(train_d, 8192, shuffle=True)
    state = trainer.init(jax.random.PRNGKey(0), next(batcher()))
    state, history = trainer.fit(state, batcher, epochs=epochs)
    final = history["epochs"][-1]
    print(
        "batch top-100 accuracy with context: "
        f"{final['batch_top_100_categorical_accuracy']:.4f}"
    )


if __name__ == "__main__":
    main()
