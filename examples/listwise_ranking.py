"""Listwise ranking: optimize NDCG over sampled lists.

Counterpart of `docs/examples/listwise_ranking.ipynb` (which uses
tensorflow-ranking losses): sample per-user movie lists, score them with
a tower model, train with pointwise MSE vs ListMLE, compare NDCG.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from recommenders_tpu import data, metrics, models, tasks
from recommenders_tpu.tasks import listwise


class ListScoringModel(models.Model):
    num_users: int
    num_movies: int
    loss_kind: str = "list_mle"

    def setup(self):
        self.user_emb = nn.Embed(self.num_users, 32)
        self.movie_emb = nn.Embed(self.num_movies, 32)
        self.score_mlp = nn.Sequential(
            [nn.Dense(64), nn.relu, nn.Dense(1)]
        )
        loss_fn = {
            "mse": tasks.mean_squared_error,
            "list_mle": listwise.list_mle,
            "pairwise": listwise.pairwise_logistic,
            "lambdarank": listwise.lambdarank,
            "approx_ndcg": listwise.approx_ndcg,
        }[self.loss_kind]
        self.task = tasks.Ranking(loss_fn=loss_fn)

    def compute_loss(self, batch, training=False):
        u = self.user_emb(batch["user_id"])[:, None, :]
        m = self.movie_emb(batch["movie_id"])
        x = jnp.concatenate([jnp.broadcast_to(u, m.shape), m], axis=-1)
        scores = self.score_mlp(x)[..., 0]
        out = self.task(batch["rating"], scores)
        return out.loss, {"labels": out.labels, "predictions": out.predictions}

    def metrics(self):
        return {"ndcg": metrics.NDCG(), "ndcg@5": metrics.NDCG(k=5)}

    def update_metrics(self, states, batch, aux):
        return {
            name: m.update(states[name], aux["labels"], aux["predictions"])
            for name, m in self.metrics().items()
        }


def run(loss_kind: str, epochs: int = 2):
    ds = data.synthetic_movielens(num_interactions=20_000)
    lists = data.sample_listwise(
        ds.user_ids, ds.movie_ids, ds.ratings,
        num_list_per_user=3, num_examples_per_list=8,
    )
    model = ListScoringModel(
        num_users=ds.num_users,
        num_movies=ds.num_movies,
        loss_kind=loss_kind,
    )
    trainer = models.Trainer(model, optax.adam(1e-2))
    batcher = data.batched(lists, 1024, shuffle=True)
    state = trainer.init(jax.random.PRNGKey(0), next(batcher()))
    state, history = trainer.fit(
        state, batcher, epochs=epochs, verbose=False
    )
    final = history["epochs"][-1]
    print(
        f"{loss_kind:>12}: NDCG={final['ndcg']:.4f} "
        f"NDCG@5={final['ndcg@5']:.4f}"
    )
    return final


def main():
    for kind in ("mse", "pairwise", "lambdarank", "list_mle", "approx_ndcg"):
        run(kind)


if __name__ == "__main__":
    main()
