"""Efficient serving: exact vs approximate retrieval indexes.

Counterpart of `docs/examples/efficient_serving.ipynb` (ScaNN): compare
BruteForce, the fused bucketed kernel, and the partitioned ScaNN-style
index on latency proxies and recall over a large synthetic corpus.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from recommenders_tpu.layers import approximate, factorized_top_k


def timed(fn, *args, iters=5):
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


def main(corpus_size: int = 200_000, dim: int = 128, k: int = 10):
    rng = np.random.RandomState(0)
    corpus = jnp.asarray(
        rng.normal(size=(corpus_size, dim)), jnp.float32
    )
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
        num_leaves=200,
        num_leaves_to_search=20,
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
