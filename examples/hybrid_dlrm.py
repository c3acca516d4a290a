"""Hybrid DLRM: engine-managed big tables + dense head via optax.

The production-scale configuration (the reference achieves this split
with the TPU embedding engine behind `TPUEmbedding` +
`CompositeOptimizer`): a 500k-row user table updated by the engine's
row-sparse Adagrad while the dense interaction head trains with Adam —
one jitted step, optionally with SparseCore-style 1-step-stale
pipelining.
"""

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from recommenders_tpu import models, tasks
from recommenders_tpu.embedding import config as cfg
from recommenders_tpu.embedding import engine as engine_lib


class DLRMHead(nn.Module):
    @nn.compact
    def __call__(self, batch, acts):
        dense = nn.relu(nn.Dense(16)(batch["dense_features"]))
        x = jnp.concatenate(
            [acts["user_id"], acts["item_id"], dense], axis=-1
        )
        pred = nn.sigmoid(
            nn.Dense(1)(nn.relu(nn.Dense(64)(x)))[:, 0]
        )
        out = tasks.Ranking()(batch["clicked"], pred)
        return out.loss, out.predictions


def make_batches(rng, n_batches, batch_size=4096):
    for _ in range(n_batches):
        item = rng.randint(0, 10_000, batch_size)
        dense = rng.normal(size=(batch_size, 8)).astype(np.float32)
        logit = 2.0 * dense[:, 0] + ((item % 2) - 0.5)
        clicked = (
            rng.uniform(size=batch_size)
            < 1.0 / (1.0 + np.exp(-logit))
        ).astype(np.float32)
        yield {
            "user_id": rng.randint(0, 500_000, batch_size).astype(
                np.int32
            ),
            "item_id": item.astype(np.int32),
            "dense_features": dense,
            "clicked": clicked,
        }


def main(steps: int = 30, pipelined: bool = True):
    engine = engine_lib.EmbeddingEngine(
        (
            cfg.FeatureConfig(
                table=cfg.TableConfig(
                    500_000, 16, name="user",
                    optimizer=cfg.OptimizerSpec(
                        kind="adagrad", learning_rate=0.1
                    ),
                ),
                name="user_id",
            ),
            cfg.FeatureConfig(
                table=cfg.TableConfig(
                    10_000, 16, name="item",
                    optimizer=cfg.OptimizerSpec(
                        kind="adagrad", learning_rate=0.1
                    ),
                ),
                name="item_id",
            ),
        ),
    )
    trainer = models.HybridTrainer(
        DLRMHead(), engine, optax.adam(1e-2), pipelined=pipelined
    )
    rng = np.random.RandomState(0)
    batches = list(make_batches(rng, steps))
    state = trainer.init(jax.random.PRNGKey(0), batches[0])
    for i, batch in enumerate(batches):
        state, loss, _ = trainer.train_step(state, batch)
        if i % 10 == 0:
            print(f"step {i}: loss={float(loss):.4f}")
    state = trainer.finalize(state)
    print(
        f"done: {int(state.engine_state.step)} engine steps, "
        f"final loss {float(loss):.4f}"
    )


if __name__ == "__main__":
    main()
