"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline: two-tower retrieval training throughput (examples/sec/chip) on
the BASELINE.json config-1 workload shape — in-batch sampled-softmax over
a 4096 batch with 64-d towers. The training step uses the framework's
scale path (the decoupled embedding engine with row-sparse Adagrad), the
same math as the Trainer path but without dense vocabulary-sized
gradients. The reference publishes no throughput numbers
(`BASELINE.json.published == {}`), so `vs_baseline` is reported against
this repo's recorded round-1 value (`bench_baseline.json`), else 1.0.

Rigor (VERDICT r1 item 6): the timed region runs TRIALS times; `value`
is the MEDIAN trial's throughput and the JSON line carries the IQR and
per-trial values so run-to-run variance is visible. A roofline line goes
to stderr: the step's dominant FLOPs are the three [B,B,D] score
matmuls (forward + two backward), statically known, so model FLOP/s and
MFU against the chip's bf16 peak are exact, not sampled.

Modes: BENCH_BF16=1 switches the scoring matmuls to bf16 inputs with
f32 accumulation (`Retrieval(score_dtype=bfloat16)`); both modes print
the same schema with "mode" distinguishing them.

Usage: python bench.py
"""

import functools
import json
import os
import time

import numpy as np

BATCH = 4096
DIM = 64
NUM_USERS = 65_536
NUM_ITEMS = 131_072
STEPS = 100
WARMUP = 10
TRIALS = 5

# Dominant model FLOPs per step: scores fwd (2·B²·D) + backward wrt q and
# c (2 more matmuls of the same shape). Embedding gather/scatter and the
# softmax are O(B·D + B²) — folded into the same count as +B² terms would
# be noise. Exact because shapes are static.
FLOPS_PER_STEP = 3 * 2 * BATCH * BATCH * DIM
# TPU v5e single core: 197 TFLOP/s bf16 peak, ~98.5 f32.
PEAK_BF16 = 197e12
PEAK_F32 = 98.5e12


def main():
    import jax
    import jax.numpy as jnp

    from recommenders_tpu import tasks as tasks_lib
    from recommenders_tpu.embedding import config as cfg
    from recommenders_tpu.embedding import engine as engine_lib

    bf16 = os.environ.get("BENCH_BF16") == "1"

    rng = np.random.RandomState(0)
    # Fresh host batches for every timed step; transfers are pipelined
    # (device_put one step ahead), as a prefetching input pipeline would.
    num_batches = WARMUP + STEPS * TRIALS
    host_batches = [
        {
            "user_id": rng.randint(0, NUM_USERS, BATCH).astype(np.int32),
            "item_id": rng.randint(0, NUM_ITEMS, BATCH).astype(np.int32),
        }
        for _ in range(num_batches)
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
    task = tasks_lib.Retrieval(
        score_dtype=jnp.bfloat16 if bf16 else None
    )

    def loss_of(acts):
        return task(acts["user_id"], acts["item_id"]).loss

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch):
        new_state, loss, _ = engine.grad_and_update(
            state, batch, loss_of
        )
        return new_state, loss

    nonlocal_state = [state]

    def run(steps, offset):
        pending = jax.device_put(host_batches[offset])
        loss = None
        for i in range(steps):
            batch = pending
            if offset + i + 1 < num_batches:
                pending = jax.device_put(host_batches[offset + i + 1])
            nonlocal_state[0], loss = train_step(nonlocal_state[0], batch)
            if (i + 1) % 20 == 0:
                # Bound the in-flight queue without serializing every
                # dispatch.
                jax.block_until_ready(loss)
        return loss

    loss = run(WARMUP, 0)
    jax.block_until_ready(loss)

    trial_eps = []
    for t in range(TRIALS):
        start = time.perf_counter()
        loss = run(STEPS, WARMUP + t * STEPS)
        jax.block_until_ready(loss)
        elapsed = time.perf_counter() - start
        trial_eps.append(BATCH * STEPS / elapsed)
    assert np.isfinite(float(loss)), float(loss)

    n_chips = jax.device_count()
    per_chip = sorted(e / n_chips for e in trial_eps)
    median = per_chip[len(per_chip) // 2]
    q1 = per_chip[len(per_chip) // 4]
    q3 = per_chip[(3 * len(per_chip)) // 4]

    flops_per_sec = median / BATCH * FLOPS_PER_STEP
    peak = PEAK_BF16 if bf16 else PEAK_F32
    mfu = flops_per_sec / peak
    import sys

    print(
        f"roofline: {FLOPS_PER_STEP / 1e9:.2f} GFLOP/step model math, "
        f"{flops_per_sec / 1e12:.2f} TFLOP/s sustained, "
        f"MFU {100 * mfu:.1f}% of "
        f"{'bf16' if bf16 else 'f32'} peak ({peak / 1e12:.0f} TFLOP/s); "
        f"per-trial Mex/s: "
        + ", ".join(f"{e / 1e6:.2f}" for e in per_chip),
        file=sys.stderr,
    )

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
            baseline = median / recorded

    print(
        json.dumps(
            {
                "metric": "retrieval_train_examples_per_sec_chip",
                "value": round(median, 1),
                "unit": "examples/sec/chip",
                "vs_baseline": round(baseline, 3),
                "trials": TRIALS,
                "iqr": [round(q1, 1), round(q3, 1)],
                "mode": "bf16_scores" if bf16 else "f32",
                "mfu_pct": round(100 * mfu, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
