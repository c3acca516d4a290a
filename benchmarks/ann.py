"""ANN serving benchmark: recall/qps curves at large corpus scale.

Measures the ScaNN-style index (leaf-scoring Pallas kernel + int8
anisotropic quantization) against the Bucketed kernel and brute force on
the real chip, at corpus sizes up to SURVEY §7 config-5 territory.
Ground truth at scale is computed by chunked exact scoring on device.

The reference's published serving numbers are colab-CPU ScaNN
("~2 ms/query over ~1M", "15× faster than brute force",
docs/examples/efficient_serving.ipynb); this prints the TPU-native
equivalents with recall attached.

Usage:
  python benchmarks/ann.py --corpus 1000000 [--dim 128] [--queries 256]
      [--configs default,tuned] [--skip-brute]

Time-derived query seeds defeat the tunnel's (program, input) result
cache (CLAUDE.md gotcha).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np  # noqa: E402


def _ground_truth(queries, corpus, k, chunk=1 << 18):
    """Exact top-k by chunked device scoring (fits any corpus)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def score(q, c):
        return q @ c.T

    q = jnp.asarray(queries)
    best_scores = np.full((queries.shape[0], k), -np.inf, np.float32)
    best_ids = np.zeros((queries.shape[0], k), np.int64)
    for start in range(0, corpus.shape[0], chunk):
        block = jnp.asarray(corpus[start:start + chunk])
        s = np.asarray(score(q, block))
        merged = np.concatenate([best_scores, s], axis=1)
        merged_ids = np.concatenate(
            [
                best_ids,
                np.broadcast_to(
                    np.arange(start, start + block.shape[0]),
                    s.shape,
                ),
            ],
            axis=1,
        )
        idx = np.argpartition(-merged, k - 1, axis=1)[:, :k]
        best_scores = np.take_along_axis(merged, idx, axis=1)
        best_ids = np.take_along_axis(merged_ids, idx, axis=1)
    order = np.argsort(-best_scores, axis=1)
    return np.take_along_axis(best_ids, order, axis=1)


def _recall(ids, truth):
    hits = 0
    for i in range(truth.shape[0]):
        hits += len(set(ids[i].tolist()) & set(truth[i].tolist()))
    return hits / truth.size


def _time_queries(fn, queries_fn, trials=5):
    """Median seconds per invocation over fresh query batches."""
    fn(queries_fn())  # compile
    times = []
    import jax

    for _ in range(trials):
        q = queries_fn()
        t0 = time.perf_counter()
        out = fn(q)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", type=int, default=1_000_000)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--queries", type=int, default=256)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--skip-brute", action="store_true")
    p.add_argument("--skip-bucketed", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from recommenders_tpu.layers import approximate, factorized_top_k

    n, d, qn, k = args.corpus, args.dim, args.queries, args.k
    print(f"backend={jax.default_backend()} corpus={n}x{d} "
          f"queries={qn} k={k}", file=sys.stderr)

    rng = np.random.RandomState(0)
    # Clustered corpus (recsys embeddings are not isotropic noise).
    num_clusters = 256
    centers = rng.normal(size=(num_clusters, d)).astype(np.float32)
    assign = rng.randint(0, num_clusters, n)
    corpus = (
        centers[assign] + 0.6 * rng.normal(size=(n, d))
    ).astype(np.float32)

    seed0 = int(time.time())  # Defeat the tunnel result cache.

    def fresh_queries(seed_offset=[0]):
        seed_offset[0] += 1
        r = np.random.RandomState(seed0 + seed_offset[0])
        a = r.randint(0, num_clusters, qn)
        return jnp.asarray(
            (centers[a] + 0.6 * r.normal(size=(qn, d))).astype(
                np.float32
            )
        )

    fixed_queries = np.asarray(fresh_queries())
    truth = _ground_truth(fixed_queries, corpus, k)

    results = []

    def bench(name, index, sized_bytes):
        t0 = time.time()
        qps = qn / _time_queries(
            lambda q: index(q, k), fresh_queries
        )
        _, ids = index(jnp.asarray(fixed_queries), k)
        rec = _recall(np.asarray(ids), truth)
        results.append(
            {
                "config": name,
                "qps": round(qps),
                "recall_at_100": round(rec, 4),
                "index_mb": round(sized_bytes / 2**20),
            }
        )
        print(f"  {name}: {qps:,.0f} q/s, recall@{k} {rec:.4f} "
              f"({time.time() - t0:.0f}s)", file=sys.stderr)

    if not args.skip_brute:
        print("brute force...", file=sys.stderr)
        bf = factorized_top_k.BruteForce(k=k).index(jnp.asarray(corpus))
        bench("brute_force", bf, n * d * 4)

    if not args.skip_bucketed and d % 128 == 0:
        print("bucketed...", file=sys.stderr)
        bk = factorized_top_k.Bucketed(
            k=k, buckets=4096, chunk=4096, query_tile=128,
            corpus_dtype=jnp.bfloat16,
        ).index(jnp.asarray(corpus))
        bench("bucketed_bf16_4096", bk, n * d * 2)

    leaves = max(64, 1 << int(np.log2(np.sqrt(n) * 2)))
    for probes, reorder in ((leaves // 16, None),
                            (leaves // 8, None),
                            (leaves // 8, 4 * k)):
        name = f"scann_L{leaves}_P{probes}" + (
            f"_R{reorder}" if reorder else ""
        )
        print(f"{name} (build ~mins at 10M)...", file=sys.stderr)
        t0 = time.time()
        index = approximate.ScaNN(
            k=k,
            num_leaves=leaves,
            num_leaves_to_search=probes,
            quantize=True,
            anisotropic_quantization_threshold=0.2,
            num_reordering_candidates=reorder,
            query_batch=qn,
        )
        index.index(corpus)
        print(f"  built in {time.time() - t0:.0f}s", file=sys.stderr)
        bench(name, index, int(n * 1.3) * d)

    print(json.dumps({"corpus": n, "dim": d, "results": results}))


if __name__ == "__main__":
    main()
