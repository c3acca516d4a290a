"""Sparse-update step under SKEWED (Zipf) id distributions.

The headline and multi-table benches draw UNIFORM ids — the blocked
update kernel's worst case, where a 4096-id batch touches essentially
every block of every table and the sweep degenerates to a full
table+slot read/write. Production recsys id streams are Zipfian
(tpu_embedding_layer.py's mod-sharding exists because of hot rows):
most updates hit few blocks, and the kernel's pair list covers ONLY
touched blocks, so the sweep — the step's dominant HBM term — shrinks
with skew. This bench measures that adaptivity on the headline shape.

Usage: python benchmarks/skewed_update.py [--alpha 0,0.8,1.2]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np  # noqa: E402

BATCH, DIM = 4096, 64
VOCAB = 4_194_304            # one big DLRM-style table
SHORT, LONG = 10, 60


def zipf_ids(rng, vocab, size, alpha):
    if alpha <= 0:
        return rng.randint(0, vocab, size).astype(np.int32)
    # Ranked Zipf over the full vocab via inverse-CDF sampling.
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    probs = ranks ** (-alpha)
    probs /= probs.sum()
    cdf = np.cumsum(probs)
    u = rng.rand(*size) if isinstance(size, tuple) else rng.rand(size)
    ids = np.searchsorted(cdf, u).astype(np.int32)
    # Spread hot ranks across the id space (hash) so skew is about
    # FREQUENCY, not block locality — the honest case for div layout.
    return ((ids.astype(np.int64) * 2654435761) % vocab).astype(np.int32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--alpha", default="0,0.8,1.2")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from recommenders_tpu import tasks as tasks_lib  # noqa: F401
    from recommenders_tpu.embedding import config as cfg
    from recommenders_tpu.embedding import engine as engine_lib

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    rng = np.random.RandomState(int(time.time()))
    spec = cfg.OptimizerSpec(kind="adagrad", learning_rate=0.1)
    engine = engine_lib.EmbeddingEngine(
        (
            cfg.FeatureConfig(
                table=cfg.TableConfig(VOCAB, DIM, name="big"),
                name="f",
            ),
        ),
        optimizer=spec,
        dtype=jnp.bfloat16,
        slot_dtype=jnp.bfloat16,
        exact_grad_routing=False,
    )
    loss_of = lambda a: jnp.sum(jnp.square(a["f"]))  # noqa: E731

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(st, bs):
        def body(st, b):
            s, loss, _ = engine.grad_and_update(st, b, loss_of)
            return s, loss
        return jax.lax.scan(body, st, bs)

    fence = jax.jit(lambda x: sum(jnp.sum(v) for v in x.values()))

    for alpha in [float(a) for a in args.alpha.split(",")]:
        def batches(n, alpha=alpha):
            return jax.device_put({
                "f": zipf_ids(rng, VOCAB, (n, BATCH), alpha),
            })

        # Touched-block fraction at the kernel's block size (3072 phys
        # rows = 6144 logical at pack 2), one sample batch.
        sample = zipf_ids(rng, VOCAB, BATCH, alpha)
        span = 8192      # br=4096 phys rows x pack 2 (auto pick here)
        touched = len(np.unique(sample // span))
        total = -(-VOCAB // span)

        state = engine.init(jax.random.PRNGKey(0))
        carry = state
        for n in (SHORT, LONG, SHORT):
            bs = batches(n)
            np.asarray(fence(bs))
            carry, out = run(carry, bs)
            np.asarray(out[-1])
        pers = []
        for _ in range(3):
            ds = {}
            for n in (SHORT, LONG):
                bs = batches(n)
                np.asarray(fence(bs))
                t0 = time.perf_counter()
                carry, out = run(carry, bs)
                np.asarray(out[-1])
                ds[n] = time.perf_counter() - t0
            pers.append((ds[LONG] - ds[SHORT]) / (LONG - SHORT))
        per = float(np.median(pers))
        print(
            f"alpha={alpha:3.1f}: {per * 1e6:7.1f} us/step "
            f"({BATCH / per / 1e6:5.2f} Mex/s), touched blocks "
            f"{touched}/{total} ({100 * touched / total:.0f}%)"
        )


if __name__ == "__main__":
    main()
