"""Corpus-eval throughput: the reference's ">2× evaluation speedup" axis.

Measures factorized top-k evaluation queries/sec in three regimes:

  1. `jit_step`: device-resident corpus, the fully jitted
     `make_corpus_eval_step` (embed → scan → top-k → metric in ONE
     dispatch per batch) — the replacement for the reference's
     per-batch tf.data map/reduce (layers/factorized_top_k.py:496-507).
  2. `python_loop`: same device-resident corpus but the index/metric
     called from Python per batch (round-1 behavior) — isolates the
     dispatch overhead the jit step removes.
  3. `host_streamed`: corpus resident on HOST (larger than HBM),
     streamed chunk-by-chunk with transfer/compute double-buffering
     (`Streaming.index_from_dataset`) while all queries score at once.

Usage:
  python benchmarks/corpus_eval.py [--corpus 1000000]
      [--host-corpus 10000000] [--dim 128] [--queries 8192]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", type=int, default=1_000_000)
    p.add_argument("--host-corpus", type=int, default=10_000_000)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--queries", type=int, default=8192)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--chunk", type=int, default=1 << 17)
    p.add_argument("--skip-host", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from recommenders_tpu.layers import factorized_top_k as ftk
    from recommenders_tpu.metrics import factorized_top_k as ftk_metric

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    results = {}
    rng = np.random.RandomState(int(time.time()))  # Defeat result cache.
    d, qn = args.dim, args.queries
    queries_host = rng.normal(size=(qn, d)).astype(np.float32)
    k = 100

    # --- Device-resident corpus: jit step vs python loop --------------
    n = args.corpus
    corpus = rng.normal(size=(n, d)).astype(np.float32)
    corpus_dev = jnp.asarray(corpus)
    index = ftk.Streaming(k=k, chunk_size=args.chunk).index(corpus_dev)
    metric = ftk_metric.FactorizedTopK(candidates=index, ks=(10, 100))
    true_ids_host = rng.randint(0, n, qn).astype(np.int32)

    @jax.jit
    def jit_step(mstate, q, true_ids, corpus_dev):
        true_embs = jnp.take(corpus_dev, true_ids, axis=0)
        return metric.update(
            mstate, q, true_embs, true_candidate_ids=true_ids
        )

    def run_jit():
        mstate = metric.init()
        for start in range(0, qn, args.batch):
            q = jnp.asarray(queries_host[start:start + args.batch])
            ids = jnp.asarray(true_ids_host[start:start + args.batch])
            mstate = jit_step(mstate, q, ids, corpus_dev)
        # Honest fence: a device→host fetch (block_until_ready through
        # the tunnel acks before execution completes — CLAUDE.md).
        np.asarray(jax.tree_util.tree_leaves(mstate)[0])
        return mstate

    def run_python_loop():
        mstate = metric.init()
        for start in range(0, qn, args.batch):
            q = jnp.asarray(queries_host[start:start + args.batch])
            ids = jnp.asarray(true_ids_host[start:start + args.batch])
            true_embs = jnp.take(corpus_dev, ids, axis=0)
            mstate = metric.update(
                mstate, q, true_embs, true_candidate_ids=ids
            )
        np.asarray(jax.tree_util.tree_leaves(mstate)[0])
        return mstate

    for name, fn in (("jit_step", run_jit),
                     ("python_loop", run_python_loop)):
        fn()  # compile
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        qps = qn / sorted(times)[1]
        results[f"{name}_qps_{n // 1000}k_corpus"] = round(qps)
        print(f"{name}: {qps:,.0f} q/s over {n:,} device corpus",
              file=sys.stderr)

    # --- Host-resident corpus, streamed -------------------------------
    if not args.skip_host:
        hn = args.host_corpus
        print(f"building {hn:,} x {d} host corpus "
              f"({hn * d * 4 / 2**30:.1f} GiB)...", file=sys.stderr)
        host_corpus = np.empty((hn, d), np.float32)
        for start in range(0, hn, 1 << 20):
            end = min(start + (1 << 20), hn)
            host_corpus[start:end] = rng.normal(
                size=(end - start, d)
            ).astype(np.float32)

        def chunks():
            for start in range(0, hn, args.chunk):
                yield host_corpus[start:start + args.chunk]

        stream = ftk.Streaming(k=k).index_from_dataset(chunks)
        q = jnp.asarray(queries_host)
        t0 = time.perf_counter()
        scores, ids = stream(q, k=k)
        np.asarray(scores[0, 0])
        elapsed = time.perf_counter() - t0
        qps = qn / elapsed
        gbps = hn * d * 4 / elapsed / 2**30
        results[f"host_streamed_qps_{hn // 1_000_000}m_corpus"] = round(
            qps
        )
        results["host_streamed_corpus_gibps"] = round(gbps, 2)
        print(
            f"host_streamed: {qps:,.0f} q/s over {hn:,} host corpus "
            f"({elapsed:.1f}s, {gbps:.2f} GiB/s corpus ingest)",
            file=sys.stderr,
        )

    print(json.dumps(results))


if __name__ == "__main__":
    main()
