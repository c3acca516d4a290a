"""DCN ranking: feature crosses for rating prediction.

Counterpart of `docs/examples/dcn.ipynb`: embed sparse features, apply a
DCN-v2 cross layer (optionally low-rank) over the concatenated vector,
then a deep stack, and inspect learned feature interactions.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from recommenders_tpu import data, metrics, models, tasks
from recommenders_tpu.layers.feature_interaction import dcn


class DCNModel(models.Model):
    num_users: int
    num_movies: int
    projection_dim: int = 0  # 0 = full-rank cross.

    def setup(self):
        self.user_emb = nn.Embed(self.num_users, 32)
        self.movie_emb = nn.Embed(self.num_movies, 32)
        self.cross = dcn.Cross(
            projection_dim=self.projection_dim or None
        )
        self.deep = nn.Sequential(
            [nn.Dense(128), nn.relu, nn.Dense(64), nn.relu, nn.Dense(1)]
        )
        self.task = tasks.Ranking(loss_fn=tasks.mean_squared_error)

    def compute_loss(self, batch, training=False):
        x = jnp.concatenate(
            [
                self.user_emb(batch["user_id"]),
                self.movie_emb(batch["movie_id"]),
            ],
            axis=-1,
        )
        x = self.cross(x)
        pred = self.deep(x)[:, 0]
        out = self.task(batch["rating"], pred)
        return out.loss, {"labels": out.labels, "predictions": out.predictions}

    def metrics(self):
        return {"rmse": metrics.RootMeanSquaredError()}

    def update_metrics(self, states, batch, aux):
        return {
            "rmse": metrics.RootMeanSquaredError().update(
                states["rmse"], aux["labels"], aux["predictions"]
            )
        }


def main(epochs: int = 3, projection_dim: int = 0):
    train, test = data.synthetic_movielens().split(0.8)
    model = DCNModel(
        num_users=train.num_users,
        num_movies=train.num_movies,
        projection_dim=projection_dim,
    )
    trainer = models.Trainer(model, optax.adam(1e-3))
    batcher = data.batched(train.as_dict(), 8192, shuffle=True)
    state = trainer.init(jax.random.PRNGKey(0), next(batcher()))
    state, _ = trainer.fit(state, batcher, epochs=epochs)
    results = trainer.evaluate(state, data.batched(test.as_dict(), 8192))
    kind = "low-rank" if projection_dim else "full-rank"
    print(f"{kind} DCN test RMSE: {results['rmse']:.4f}")
    return results


if __name__ == "__main__":
    main()
    main(projection_dim=16)
