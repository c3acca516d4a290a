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


def native_main(args):
    """Serve through the C++ PJRT host (`native/pjrt_host`) on the chip.

    The TF-Serving analog end-to-end: build + export the index from a
    CPU-only process (the tunneled chip is single-claimant, so this
    process must never initialize the TPU backend), then the standalone
    C++ binary claims the chip, compiles the exported StableHLO, and
    serves `--repeat` timed query batches. Parity is checked against the
    CPU query path (soft tolerances: CPU and MXU matmuls round
    differently, so tie order at the top-k boundary may differ).
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from recommenders_tpu.layers import factorized_top_k
    from recommenders_tpu.utils import export as export_lib
    from recommenders_tpu.utils import native_serving as ns

    if not ns.axon_available():
        print(
            json.dumps({"error": "axon plugin or pjrt_host missing"})
        )
        return

    seed = args.seed if args.seed is not None else int(time.time()) % 2**31
    rng = np.random.RandomState(seed)
    corpus = rng.normal(size=(args.corpus, args.dim)).astype(np.float32)
    queries = rng.normal(size=(args.queries, args.dim)).astype(np.float32)

    index = factorized_top_k.BruteForce(k=args.k).index(jnp.asarray(corpus))
    expected_scores, expected_ids = index(jnp.asarray(queries))

    import tempfile

    with tempfile.TemporaryDirectory() as work:
        export_dir = os.path.join(work, "bf")
        export_lib.export_index(
            export_dir, index, jnp.asarray(queries), k=args.k
        )
        t0 = time.time()
        res = ns.serve_exported_index(
            export_dir, queries, repeat=args.iters, timeout=1200.0
        )
        wall = time.time() - t0

    scores, ids = res.outputs
    overlap = float(
        np.mean(
            [
                len(np.intersect1d(np.asarray(expected_ids)[i], ids[i]))
                / args.k
                for i in range(args.queries)
            ]
        )
    )
    np.testing.assert_allclose(
        np.sort(scores, axis=1),
        np.sort(np.asarray(expected_scores), axis=1),
        rtol=2e-2,
        atol=1e-2,
    )
    stats = res.repeat_stats or {}
    out = {
        "config": f"native_bruteforce_{args.corpus}x{args.dim}",
        # The tunneled runtime caches repeated (program, input) pairs,
        # so same-input repeat timing is NOT a throughput number — the
        # in-process mode (no --native) measures qps with rotated query
        # batches. The native mode's deliverables are the round-trip
        # itself: compile + execute + bit-level parity.
        "cached_repeat_ms": stats.get("median_ms"),
        "compile_ms": res.compile_ms,
        "parity_overlap": round(overlap, 4),
        "wall_s": round(wall, 1),
    }
    json.dump(out, sys.stdout)
    print()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--corpus", type=int, default=1_000_000)
    parser.add_argument("--dim", type=int, default=128)
    parser.add_argument("--queries", type=int, default=1024)
    parser.add_argument("--k", type=int, default=100)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument(
        "--native",
        action="store_true",
        help="Serve through the C++ PJRT host binary instead of in-process "
        "JAX (builds/export on CPU; the host claims the chip).",
    )
    parser.add_argument(
        "--seed",
        type=int,
        default=None,
        help="Data seed; defaults to time-derived. Remote-attached runtimes "
        "may cache repeated (program, input) pairs, so a FIXED seed can "
        "report impossibly high qps on re-runs.",
    )
    args = parser.parse_args()

    if args.native:
        return native_main(args)

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
        # Fence the query pool's async h2d staging (device_put returns
        # before the bytes cross the ~25 MB/s tunnel link), then warm
        # the program. `block_until_ready` through the tunnel returns
        # BEFORE execution completes (CLAUDE.md), so the honest
        # completion fence is a device→host fetch of the final
        # output — device execution is FIFO, so fetching the last
        # batch's result bounds all earlier ones.
        np.asarray(
            jax.jit(lambda xs: sum(jnp.sum(x) for x in xs))(pool)
        )
        scores, _ = layer(pool[-1])
        np.asarray(scores)
        start = time.perf_counter()
        out = None
        for q in pool[:-1]:
            out = layer(q)
        # Scalar fetch: the RTT is the fence; don't also pay the
        # link-bandwidth cost of the full score matrix.
        np.asarray(out[0][0, 0])
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
