"""Efficient serving: exact vs approximate retrieval indexes.

Counterpart of `docs/examples/efficient_serving.ipynb` (ScaNN): compare
BruteForce, the fused bucketed kernel, and the partitioned ScaNN-style
index on latency proxies and recall over a synthetic clustered corpus
(partitioned ANN needs cluster structure — on i.i.d. noise its recall
collapses by construction, as for any ANN).

The default configuration is GATE-SIZED (~15 s on an unloaded CPU) so
`tools/run_examples.py` keeps margin under host contention; set
`RTPU_FULL=1` for the flagship 200k x 128 run (the shape the serving
benchmarks use), which takes a few minutes on CPU where the bucketed
kernel runs interpreted.

For real measured serving numbers on TPU hardware, see
`benchmarks/serving.py` and docs/PARITY.md.
"""

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from recommenders_tpu.layers import approximate, factorized_top_k

FULL = os.environ.get("RTPU_FULL") == "1"


def timed(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - start) / iters, out


def recall(exact_ids, got_ids):
    k = exact_ids.shape[1]
    return float(
        np.mean(
            [
                len(np.intersect1d(exact_ids[i], got_ids[i])) / k
                for i in range(exact_ids.shape[0])
            ]
        )
    )


def clustered_corpus(rng, n, dim, centers=100):
    """Cluster-structured embeddings (what trained towers produce)."""
    c = rng.normal(size=(centers, dim)).astype(np.float32)
    assign = rng.randint(0, centers, n)
    return c[assign] + 0.3 * rng.normal(size=(n, dim)).astype(np.float32)


def main(
    corpus_size: int = 200_000 if FULL else 50_000,
    dim: int = 128,
    k: int = 10,
):
    rng = np.random.RandomState(0)
    corpus = jnp.asarray(clustered_corpus(rng, corpus_size, dim))
    queries = jnp.asarray(rng.normal(size=(256, dim)), jnp.float32)

    brute = factorized_top_k.BruteForce(k=k).index(corpus)
    t_brute, (_, exact_ids) = timed(brute, queries)
    exact_ids = np.asarray(exact_ids)
    print(f"BruteForce:        {t_brute * 1e3:7.2f} ms  recall=1.000")

    bucketed = factorized_top_k.Bucketed(k=k).index(corpus)
    t_bucket, (_, ids) = timed(bucketed, queries)
    print(
        f"Bucketed (Pallas): {t_bucket * 1e3:7.2f} ms  "
        f"recall={recall(exact_ids, np.asarray(ids)):.3f}"
    )

    scann = approximate.ScaNN(
        k=k,
        num_leaves=200 if FULL else 100,
        num_leaves_to_search=20 if FULL else 10,
        quantize=True,
        num_reordering_candidates=5 * k,
    ).index(corpus)
    t_scann, (_, ids) = timed(scann, queries)
    print(
        f"ScaNN-style:       {t_scann * 1e3:7.2f} ms  "
        f"recall={recall(exact_ids, np.asarray(ids)):.3f}"
    )


if __name__ == "__main__":
    main()
