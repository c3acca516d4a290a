"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline: two-tower retrieval training throughput (examples/sec/chip) on
the BASELINE.json config-1 workload shape — in-batch sampled-softmax over
a 4096 batch with 64-d towers. The training step uses the framework's
scale path (the decoupled embedding engine with row-sparse Adagrad), the
same math as the Trainer path but without dense vocabulary-sized
gradients. The reference publishes no throughput numbers
(`BASELINE.json.published == {}`), so `vs_baseline` is reported against
this repo's recorded round-1 value (`bench_baseline.json`), else 1.0.

Usage: python bench.py
"""

import functools
import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from recommenders_tpu import tasks as tasks_lib
    from recommenders_tpu.embedding import config as cfg
    from recommenders_tpu.embedding import engine as engine_lib

    BATCH = 4096
    DIM = 64
    NUM_USERS = 65_536
    NUM_ITEMS = 131_072
    STEPS = 100
    WARMUP = 10

    rng = np.random.RandomState(0)
    # Fresh host batches for every timed step; transfers are pipelined
    # (device_put one step ahead), as a prefetching input pipeline would.
    host_batches = [
        {
            "user_id": rng.randint(0, NUM_USERS, BATCH).astype(np.int32),
            "item_id": rng.randint(0, NUM_ITEMS, BATCH).astype(np.int32),
        }
        for _ in range(WARMUP + STEPS)
    ]

    spec = cfg.OptimizerSpec(kind="adagrad", learning_rate=0.1)
    engine = engine_lib.EmbeddingEngine(
        (
            cfg.FeatureConfig(
                table=cfg.TableConfig(NUM_USERS, DIM, name="user"),
                name="user_id",
            ),
            cfg.FeatureConfig(
                table=cfg.TableConfig(NUM_ITEMS, DIM, name="item"),
                name="item_id",
            ),
        ),
        optimizer=spec,
    )
    state = engine.init(jax.random.PRNGKey(0))
    task = tasks_lib.Retrieval()

    def loss_of(acts):
        return task(acts["user_id"], acts["item_id"]).loss

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch):
        new_state, loss, _ = engine.grad_and_update(
            state, batch, loss_of
        )
        return new_state, loss

    def run(steps, offset):
        pending = jax.device_put(host_batches[offset])
        loss = None
        for i in range(steps):
            batch = pending
            if offset + i + 1 < len(host_batches):
                pending = jax.device_put(host_batches[offset + i + 1])
            nonlocal_state[0], loss = train_step(nonlocal_state[0], batch)
            if (i + 1) % 20 == 0:
                # Bound the in-flight queue (10 steps deep) without
                # serializing every dispatch.
                jax.block_until_ready(loss)
        return loss

    nonlocal_state = [state]
    loss = run(WARMUP, 0)
    jax.block_until_ready(loss)

    start = time.perf_counter()
    loss = run(STEPS, WARMUP)
    jax.block_until_ready(loss)
    elapsed = time.perf_counter() - start
    assert np.isfinite(float(loss)), float(loss)

    n_chips = jax.device_count()
    examples_per_sec_chip = BATCH * STEPS / elapsed / n_chips

    baseline = 1.0
    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json"
    )
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            recorded = json.load(f).get(
                "retrieval_train_examples_per_sec_chip"
            )
        if recorded:
            baseline = examples_per_sec_chip / recorded

    print(
        json.dumps(
            {
                "metric": "retrieval_train_examples_per_sec_chip",
                "value": round(examples_per_sec_chip, 1),
                "unit": "examples/sec/chip",
                "vs_baseline": round(baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
