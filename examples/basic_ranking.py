"""Basic ranking: predict ratings with an MSE tower model.

Counterpart of `docs/examples/basic_ranking.ipynb`: embed (user, movie),
concatenate, run an MLP to a rating prediction, train with MSE, report
RMSE.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from recommenders_tpu import data, metrics, models, tasks


class RankingModel(models.Model):
    num_users: int
    num_movies: int

    def setup(self):
        self.user_emb = nn.Embed(self.num_users, 32)
        self.movie_emb = nn.Embed(self.num_movies, 32)
        self.mlp = nn.Sequential(
            [nn.Dense(256), nn.relu, nn.Dense(64), nn.relu, nn.Dense(1)]
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
        pred = self.mlp(x)[:, 0]
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


def main(epochs: int = 3):
    train, test = data.synthetic_movielens().split(0.8)
    model = RankingModel(
        num_users=train.num_users, num_movies=train.num_movies
    )
    trainer = models.Trainer(model, optax.adam(1e-3))
    batcher = data.batched(train.as_dict(), 8192, shuffle=True)
    state = trainer.init(jax.random.PRNGKey(0), next(batcher()))
    state, _ = trainer.fit(state, batcher, epochs=epochs)
    results = trainer.evaluate(state, data.batched(test.as_dict(), 8192))
    print(f"test RMSE: {results['rmse']:.4f}")
    return results


if __name__ == "__main__":
    main()
