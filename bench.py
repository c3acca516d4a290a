"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline: two-tower retrieval training throughput (examples/sec/chip) on
the BASELINE.json config-1 workload shape — in-batch sampled-softmax over
a 4096 batch with 64-d towers (README quickstart scale, run at production
batch size). The reference publishes no throughput numbers
(`BASELINE.json.published == {}`), so `vs_baseline` is reported against
this repo's own recorded first-round value when present
(`bench_baseline.json`), else 1.0.

Usage: python bench.py            # full line on the default platform
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax
    import flax.linen as nn

    from recommenders_tpu import models as models_lib
    from recommenders_tpu import tasks as tasks_lib

    BATCH = 4096
    DIM = 64
    NUM_USERS = 65_536
    NUM_ITEMS = 131_072
    STEPS = 30
    WARMUP = 5

    class TwoTower(models_lib.Model):
        def setup(self):
            self.user_emb = nn.Embed(NUM_USERS, DIM)
            self.item_emb = nn.Embed(NUM_ITEMS, DIM)
            self.task = tasks_lib.Retrieval()

        def compute_loss(self, batch, training=False):
            q = self.user_emb(batch["user_id"])
            c = self.item_emb(batch["item_id"])
            return self.task(q, c).loss

    rng = np.random.RandomState(0)
    batch = {
        "user_id": rng.randint(0, NUM_USERS, size=BATCH).astype(np.int32),
        "item_id": rng.randint(0, NUM_ITEMS, size=BATCH).astype(np.int32),
    }

    trainer = models_lib.Trainer(TwoTower(), optax.adagrad(0.1))
    state = trainer.init(jax.random.PRNGKey(0), batch)

    for _ in range(WARMUP):
        state, loss = trainer.train_step(state, batch)
    jax.block_until_ready(loss)

    start = time.perf_counter()
    for _ in range(STEPS):
        state, loss = trainer.train_step(state, batch)
    jax.block_until_ready(loss)
    elapsed = time.perf_counter() - start

    n_chips = jax.device_count()
    examples_per_sec_chip = BATCH * STEPS / elapsed / n_chips

    baseline = 1.0
    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json"
    )
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            recorded = json.load(f).get("retrieval_train_examples_per_sec_chip")
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
