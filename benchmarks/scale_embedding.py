"""Scale stress: many sharded embedding tables + approximate serving.

Exercise for BASELINE.json config 5 ("scaled synthetic corpus, 10 sharded
embedding tables, approximate top-K serving"): trains a DLRM-shaped step
through the decoupled engine with N row-sharded tables over the mesh's
model axis, then serves top-k over a large candidate corpus with the
bucketed kernel. Sizes scale via flags; defaults fit one chip, and
`--vocab 100000000` is the 100M-row configuration for a pod slice.

Usage:
    python benchmarks/scale_embedding.py                  # 1-chip sizes
    python benchmarks/scale_embedding.py --vocab 10000000 --tables 10
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--vocab", type=int, default=1_000_000)
    parser.add_argument("--tables", type=int, default=10)
    parser.add_argument("--dim", type=int, default=32)
    parser.add_argument("--batch", type=int, default=4096)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--corpus", type=int, default=500_000)
    parser.add_argument("--model-axis", type=int, default=0,
                        help="0 = all devices on the model axis")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from recommenders_tpu import tasks as tasks_lib
    from recommenders_tpu.embedding import config as cfg
    from recommenders_tpu.embedding import engine as engine_lib
    from recommenders_tpu.layers import factorized_top_k
    from recommenders_tpu.parallel import mesh as mesh_lib

    n_dev = jax.device_count()
    model_par = args.model_axis or n_dev
    mesh = mesh_lib.create_mesh(shape=(n_dev // model_par, model_par))

    feature_configs = tuple(
        cfg.FeatureConfig(
            table=cfg.TableConfig(
                args.vocab,
                args.dim,
                name=f"table_{i}",
                optimizer=cfg.OptimizerSpec(
                    kind="adagrad", learning_rate=0.05
                ),
            ),
            name=f"feature_{i}",
        )
        for i in range(args.tables)
    )
    engine = engine_lib.EmbeddingEngine(feature_configs, mesh=mesh)
    state = engine.init(jax.random.PRNGKey(0))
    table_gb = (
        args.tables * args.vocab * args.dim * 4 / 1e9
    )
    print(
        f"{args.tables} tables x {args.vocab} rows x {args.dim} dim "
        f"= {table_gb:.1f} GB of tables over {n_dev} device(s)",
        file=sys.stderr,
    )

    rng = np.random.RandomState(0)
    task = tasks_lib.Retrieval()

    def batch(i):
        return {
            fc.name: jnp.asarray(
                rng.randint(0, args.vocab, args.batch), jnp.int32
            )
            for fc in feature_configs
        }

    def loss_of(acts):
        # Two-tower-ish: first half of features vs second half.
        half = args.tables // 2
        q = sum(acts[f"feature_{i}"] for i in range(half))
        c = sum(acts[f"feature_{i}"] for i in range(half, args.tables))
        return task(q, c).loss

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, b):
        s, loss, _ = engine.grad_and_update(state, b, loss_of)
        return s, loss

    batches = [batch(i) for i in range(8)]
    dev_batches = [jax.device_put(b) for b in batches]
    state, loss = step(state, dev_batches[0])
    jax.block_until_ready(loss)
    start = time.perf_counter()
    for i in range(args.steps):
        state, loss = step(state, dev_batches[i % 8])
        if (i + 1) % 10 == 0:
            jax.block_until_ready(loss)
    jax.block_until_ready(loss)
    train_elapsed = time.perf_counter() - start
    train_eps = args.batch * args.steps / train_elapsed

    # Approximate serving over a large corpus.
    corpus = jnp.asarray(
        rng.normal(size=(args.corpus, 128)), jnp.float32
    )
    queries = [
        jnp.asarray(rng.normal(size=(256, 128)), jnp.float32)
        for _ in range(6)
    ]
    index = factorized_top_k.Bucketed(k=100).index(corpus)
    jax.block_until_ready(index(queries[-1]))
    start = time.perf_counter()
    for q in queries[:-1]:
        jax.block_until_ready(index(q))
    serve_qps = 256 * 5 / (time.perf_counter() - start)

    print(
        json.dumps(
            {
                "train_examples_per_sec": round(train_eps, 1),
                "serve_queries_per_sec": round(serve_qps, 1),
                "tables_gb": round(table_gb, 2),
                "devices": n_dev,
            }
        )
    )


if __name__ == "__main__":
    main()
