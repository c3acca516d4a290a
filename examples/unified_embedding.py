"""Unified embeddings: feature multiplexing into shared hashed tables.

Counterpart of `docs/examples/uet.ipynb` (Unified Embedding, Coleman et
al.): several categorical features share round-robin hashed tables with
per-feature multi-chunk lookups, trading collision noise for memory.
Compares collisionless vs unified embeddings on a synthetic CTR task.
"""

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from recommenders_tpu import data, metrics, models, tasks
from recommenders_tpu.embedding import unified


def synthetic_ctr(n=60_000, seed=0):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 10_000, n).astype(np.int32)
    b = rng.randint(0, 5_000, n).astype(np.int32)
    logit = ((a % 3) - 1.0) + ((b % 2) - 0.5)
    clicked = (
        rng.uniform(size=n) < 1.0 / (1.0 + np.exp(-logit))
    ).astype(np.float32)
    return {"ad_id": a, "site_id": b, "clicked": clicked}


class UnifiedCTR(models.Model):
    use_unified: bool = True

    def setup(self):
        if self.use_unified:
            config = unified.UnifiedEmbeddingConfig(
                buckets_per_table=4_000,
                dim_per_table=16,
                num_tables=2,
                name="shared",
            )
            config.add_feature("ad_id", num_chunks=2)
            config.add_feature("site_id", num_chunks=2)
            self.embedding = unified.UnifiedEmbedding(config=config)
        else:
            self.ad_emb = nn.Embed(10_000, 32)
            self.site_emb = nn.Embed(5_000, 32)
        self.head = nn.Sequential(
            [nn.Dense(64), nn.relu, nn.Dense(1)]
        )
        self.task = tasks.Ranking()

    def compute_loss(self, batch, training=False):
        if self.use_unified:
            embs = self.embedding(
                {"ad_id": batch["ad_id"], "site_id": batch["site_id"]}
            )
            x = jnp.concatenate(embs, axis=-1)
        else:
            x = jnp.concatenate(
                [
                    self.ad_emb(batch["ad_id"]),
                    self.site_emb(batch["site_id"]),
                ],
                axis=-1,
            )
        pred = jax.nn.sigmoid(self.head(x)[:, 0])
        out = self.task(batch["clicked"], pred)
        return out.loss, {"labels": out.labels, "predictions": out.predictions}

    def metrics(self):
        return {"auc": metrics.AUC()}

    def update_metrics(self, states, batch, aux):
        return {
            "auc": metrics.AUC().update(
                states["auc"], aux["labels"], aux["predictions"]
            )
        }


def run(use_unified: bool, epochs: int = 3):
    ctr = synthetic_ctr()
    model = UnifiedCTR(use_unified=use_unified)
    trainer = models.Trainer(model, optax.adagrad(0.1))
    batcher = data.batched(ctr, 4096, shuffle=True)
    state = trainer.init(jax.random.PRNGKey(0), next(batcher()))
    state, history = trainer.fit(
        state, batcher, epochs=epochs, verbose=False
    )
    kind = "unified" if use_unified else "collisionless"
    print(f"{kind:>14}: AUC={history['epochs'][-1]['auc']:.4f}")


def main():
    run(use_unified=False)
    run(use_unified=True)


if __name__ == "__main__":
    main()
