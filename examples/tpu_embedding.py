"""Large-scale embedding training with the decoupled engine.

Counterpart of `docs/examples/tpu_embedding_layer.ipynb`: declare
table/feature configs with per-table sparse optimizers, shard tables over
the mesh, and train with the decoupled engine (no dense vocab-sized
gradients) — optionally with SparseCore-style 1-step-stale pipelining.
"""

import numpy as np

import jax
import jax.numpy as jnp

from recommenders_tpu import parallel
from recommenders_tpu.embedding import config as cfg
from recommenders_tpu.embedding import engine as engine_lib


def main(steps: int = 20, pipelined: bool = True):
    mesh = parallel.create_mesh(
        shape=(1, jax.device_count()),
    )
    watches_table = cfg.TableConfig(
        vocabulary_size=1_000_000,
        dim=32,
        name="watches",
        combiner="mean",
        optimizer=cfg.OptimizerSpec(kind="adagrad", learning_rate=0.1),
    )
    user_table = cfg.TableConfig(
        vocabulary_size=100_000,
        dim=32,
        name="user",
        optimizer=cfg.OptimizerSpec(kind="adam", learning_rate=0.01),
    )
    engine = engine_lib.EmbeddingEngine(
        (
            cfg.FeatureConfig(table=user_table, name="user_id"),
            cfg.FeatureConfig(table=watches_table, name="watch_history"),
        ),
        mesh=mesh,
    )
    state = engine.init(jax.random.PRNGKey(0))
    print(
        "table shardings:",
        {n: str(t.sharding.spec) for n, t in state.tables.items()},
    )

    rng = np.random.RandomState(0)

    def batch(i):
        history = rng.randint(0, 1_000_000, size=(512, 10)).astype(np.int32)
        history[rng.uniform(size=history.shape) < 0.2] = cfg.PAD_ID
        return {
            "user_id": rng.randint(0, 100_000, 512).astype(np.int32),
            "watch_history": history,
        }

    def loss_of_acts(acts):
        # Pull each user's embedding toward their watch-history summary.
        return jnp.mean(
            jnp.sum(
                jnp.square(
                    acts["user_id"]
                    - jax.lax.stop_gradient(acts["watch_history"])
                ),
                axis=-1,
            )
        )

    if pipelined:
        pending = None
        for i in range(steps):
            state, pending, loss, _ = engine.pipelined_grad_and_update(
                state, pending, batch(i), loss_of_acts
            )
            if i % 5 == 0:
                print(f"step {i}: loss={float(loss):.4f}")
        state = engine.flush(state, pending)
    else:
        for i in range(steps):
            state, loss, _ = engine.grad_and_update(
                state, batch(i), loss_of_acts
            )
            if i % 5 == 0:
                print(f"step {i}: loss={float(loss):.4f}")
    print(f"done: {int(state.step)} engine steps")


if __name__ == "__main__":
    main()
