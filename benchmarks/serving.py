"""Serving benchmark: corpus-queries/sec for top-100 retrieval.

The second north-star metric (BASELINE.md): top-100 queries/sec over a
1M-candidate corpus, comparing the exact XLA path, the fused Pallas
bucketed kernel, and the partitioned ScaNN-style index. Timing guards
against result caching by rotating distinct query batches and blocking on
every call.

Usage: python benchmarks/serving.py [--corpus 1000000] [--dim 128]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

# Runnable as `python benchmarks/serving.py` without installation
# (PYTHONPATH breaks the ambient TPU plugin, so bootstrap sys.path here).
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--corpus", type=int, default=1_000_000)
    parser.add_argument("--dim", type=int, default=128)
    parser.add_argument("--queries", type=int, default=1024)
    parser.add_argument("--k", type=int, default=100)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument(
        "--seed",
        type=int,
        default=None,
        help="Data seed; defaults to time-derived. Remote-attached runtimes "
        "may cache repeated (program, input) pairs, so a FIXED seed can "
        "report impossibly high qps on re-runs.",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from recommenders_tpu.layers import approximate, factorized_top_k

    seed = args.seed if args.seed is not None else int(time.time()) % 2**31
    print(f"data seed: {seed}", file=sys.stderr)
    rng = np.random.RandomState(seed)
    # Clustered corpus/queries (mixture of gaussians): tower embeddings
    # are strongly clustered in practice, and partitioned ANN is
    # meaningless on i.i.d. noise (its honest worst case). The bucketed
    # kernel's recall is data-independent either way.
    num_centers = 1024
    centers = rng.normal(
        scale=3.0, size=(num_centers, args.dim)
    ).astype(np.float32)

    def clustered(n):
        return (
            centers[rng.randint(0, num_centers, n)]
            + rng.normal(size=(n, args.dim)).astype(np.float32)
        )

    corpus = jnp.asarray(clustered(args.corpus))
    pool = [
        jnp.asarray(clustered(args.queries))
        for _ in range(args.iters + 1)
    ]

    def bench(layer):
        out = layer(pool[-1])
        jax.block_until_ready(out)
        start = time.perf_counter()
        for q in pool[:-1]:
            jax.block_until_ready(layer(q))
        return args.queries * args.iters / (
            time.perf_counter() - start
        )

    def recall_of(layer, exact_ids):
        _, ids = layer(pool[0])
        ids = np.asarray(ids)
        return float(
            np.mean(
                [
                    len(np.intersect1d(exact_ids[i], ids[i])) / args.k
                    for i in range(args.queries)
                ]
            )
        )

    brute = factorized_top_k.BruteForce(k=args.k).index(corpus)
    _, exact_ids = brute(pool[0])
    exact_ids = np.asarray(exact_ids)

    results = {}
    results["brute_force_qps"] = bench(brute)

    bucketed = factorized_top_k.Bucketed(k=args.k).index(corpus)
    results["bucketed_qps"] = bench(bucketed)
    results["bucketed_recall"] = recall_of(bucketed, exact_ids)

    scann = approximate.ScaNN(
        k=args.k,
        num_leaves=2000,
        num_leaves_to_search=40,
        quantize=True,
        num_reordering_candidates=4 * args.k,
        query_batch=128,
    ).index(corpus)
    results["scann_qps"] = bench(scann)
    results["scann_recall"] = recall_of(scann, exact_ids)

    results = {
        k: round(v, 4 if "recall" in k else 1)
        for k, v in results.items()
    }
    json.dump(results, sys.stdout)
    print()


if __name__ == "__main__":
    main()
