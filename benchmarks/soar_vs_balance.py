"""SOAR vs split-reseed balanced k-means at equal memory (VERDICT r4 #6).

Settles whether the streamed-sharded build's SOAR rejection
(`parallel/ann.py index_streamed`) costs quality: SOAR (ScaNN's
spilled multi-assignment, reference layers/factorized_top_k.py:688-707
serializes the searcher that implements it) doubles leaf memory by
storing each row under a secondary centroid; split-reseed balancing
(`kmeans_balance_fraction`) attacks the same failure mode — probed
recall lost to leaf-mass skew — with NO extra memory.

Dominance framing: give the balanced index DOUBLE the probes of the
SOAR index. Per-query scanned slots are then equal (SOAR's slots hold
2N row copies, balanced's N), so q/s is comparable, while balanced
still stores HALF the leaf bytes. If balanced recall >= SOAR recall
across the probe ladder, balancing dominates SOAR at equal memory and
the streamed rejection is quality-free.

Usage: python benchmarks/soar_vs_balance.py [--corpus 10000000]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(
    0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks",
    )
)

from ann import _exact_topk_device, _make_corpus_fns, _time_queries  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", type=int, default=10_000_000)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--queries", type=int, default=256)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--leaves", type=int, default=4096)
    p.add_argument("--probes", type=str, default="32,64,128")
    p.add_argument("--soar-lambda", type=float, default=1.5)
    p.add_argument("--balance", type=float, default=0.3)
    p.add_argument("--train-iters", type=int, default=8)
    args = p.parse_args()

    import jax

    from recommenders_tpu.layers import approximate

    n, d, qn, k = args.corpus, args.dim, args.queries, args.k
    print(f"backend={jax.default_backend()} corpus={n}x{d}",
          file=sys.stderr)
    sample, _ = _make_corpus_fns(d, seed=0)
    corpus = jax.block_until_ready(sample(n, 0))
    fixed_queries = sample(qn, 1 << 30)
    _, truth_ids = _exact_topk_device(fixed_queries, corpus, k)
    truth = np.asarray(truth_ids)
    seed0 = int(time.time())
    salt = [0]

    def fresh_queries():
        salt[0] += 1
        return sample(qn, seed0 + salt[0])

    def recall(ids):
        return float(np.mean([
            len(np.intersect1d(truth[i], np.asarray(ids)[i])) / k
            for i in range(qn)
        ]))

    probe_ladder = [int(x) for x in args.probes.split(",")]
    results = []
    for name, soar, balance, probe_mult in (
        ("soar", args.soar_lambda, 0.0, 1),
        ("balanced", None, args.balance, 2),
    ):
        for probes in probe_ladder:
            idx = approximate.ScaNN(
                k=k,
                num_leaves=args.leaves,
                num_leaves_to_search=probes * probe_mult,
                quantize="int8",
                scoring_buckets=8192,
                probe_tile=32,
                query_batch=qn,
                soar_lambda=soar,
                kmeans_balance_fraction=balance,
                training_iterations=args.train_iters,
                kmeans_sample_size=1 << 21,
                seed=7,
            ).index(corpus)
            slots = int(np.prod(idx._leaf_embs.shape[:2]))
            _, got = idx(fixed_queries)
            r = recall(got)
            dt = _time_queries(lambda q: idx(q)[1], fresh_queries)
            row = {
                "config": name,
                "probes": probes * probe_mult,
                "leaf_slots": slots,
                "leaf_mem_mb": round(slots * d / 1e6),
                "recall": round(r, 4),
                "qps": round(qn / dt),
            }
            results.append(row)
            print(json.dumps(row), flush=True)
            del idx
    # Dominance summary: balanced at 2P vs soar at P, per rung.
    for i, probes in enumerate(probe_ladder):
        s = results[i]
        b = results[len(probe_ladder) + i]
        print(json.dumps({
            "rung": probes,
            "soar_recall": s["recall"], "balanced_recall": b["recall"],
            "balanced_minus_soar": round(b["recall"] - s["recall"], 4),
            "mem_ratio_balanced_over_soar": round(
                b["leaf_slots"] / s["leaf_slots"], 3),
            "qps_ratio": round(b["qps"] / s["qps"], 3),
        }), flush=True)


if __name__ == "__main__":
    main()
