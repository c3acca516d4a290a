"""Throwaway diagnostic: WHERE does probed recall die at 100M?

Builds the streamed 100M int8 ScaNN index at the round-3 bench
configuration, then for the fixed query set's exact top-100 rows
measures, at several probe depths P:

  placement   fraction whose ASSIGNED leaf is in the query's top-P
              probe list (the ceiling probing can reach at that P)
  primary     fraction whose PRIMARY (nearest) centroid is in the
              top-P list (the ceiling a spill-free assignment allows)
  achieved    recall the bucketed probed search actually returns

primary − placement = loss caused by capacity spill (rows packed into
a leaf the prober does not visit); placement − achieved = loss in the
scoring/fold stage (bucket collisions etc.).

Usage: python benchmarks/_probe_diag_100m.py [--corpus 100000000]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

from benchmarks.ann import _make_corpus_fns


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", type=int, default=100_000_000)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--queries", type=int, default=256)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--leaves", type=int, default=8192)
    p.add_argument("--capacity-factor", type=float, default=1.05)
    p.add_argument("--spill-rounds", type=int, default=4)
    p.add_argument("--build-batch", type=int, default=2_000_000)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from recommenders_tpu.layers import approximate

    n, d, qn, k = args.corpus, args.dim, args.queries, args.k
    bchunk = min(args.build_batch, n)
    nb = (n + bchunk - 1) // bchunk
    print(f"backend={jax.default_backend()} {n}x{d}", file=sys.stderr)
    sample, sample_t = _make_corpus_fns(d, seed=0)

    def gen_batches():
        for i in range(nb):
            m = min(bchunk, n - i * bchunk)
            yield sample_t(m, jnp.uint32(i))

    # Ground truth first (HBM empty — see benchmarks/ann.py).
    @functools.partial(
        jax.jit, static_argnames=("k",), donate_argnums=(2, 3)
    )
    def truth_step(queries, batch, s, i, base, k):
        scores = queries @ batch.T
        ids = base + jnp.arange(scores.shape[1], dtype=jnp.int32)
        cs = jnp.concatenate([s, scores], axis=1)
        ci = jnp.concatenate(
            [i, jnp.broadcast_to(ids, scores.shape)], axis=1
        )
        ts, ti = jax.lax.top_k(cs, k)
        return ts, jnp.take_along_axis(ci, ti, axis=1)

    fixed_queries = sample(qn, 1 << 30)
    t0 = time.time()
    s = jnp.full((qn, k), -jnp.inf, jnp.float32)
    ids = jnp.zeros((qn, k), jnp.int32)
    for b in range(nb):
        m = min(bchunk, n - b * bchunk)
        batch = sample_t(m, jnp.uint32(b))
        s, ids = truth_step(
            fixed_queries, batch, s, ids, jnp.int32(b * bchunk), k
        )
    truth = np.asarray(ids)          # [Q, k] global rows
    del s, ids, batch
    print(f"truth in {time.time() - t0:.0f}s", file=sys.stderr)

    grain = 128
    mean = n / args.leaves
    cap = int(np.ceil(args.capacity_factor * mean / grain)) * grain
    index = approximate.ScaNN(
        k=k, num_leaves=args.leaves, num_leaves_to_search=1536,
        quantize="int8", leaf_capacity=cap,
        scoring_buckets=4096, probe_tile=64,
        query_batch=qn, kmeans_sample_size=1 << 21,
        training_iterations=8, spill_rounds=args.spill_rounds,
    )
    t0 = time.time()
    index.index_streamed(gen_batches, num_rows=n)
    jax.block_until_ready(index._leaf_embs)
    print(f"build in {time.time() - t0:.0f}s", file=sys.stderr)

    # Invert leaf_rows -> row's assigned leaf for the truth rows, on
    # HOST: one [L, cap] fetch (~0.4 GB over the link) + numpy
    # searchsorted — the on-device formulation spent minutes per leaf
    # chunk.
    t0 = time.time()
    lr_h = np.asarray(index._leaf_rows)              # [L, cap]
    flat = lr_h.reshape(-1)
    order = np.argsort(flat, kind="stable")
    sf = flat[order]
    needles = truth.reshape(-1)
    pos = np.clip(np.searchsorted(sf, needles), 0, sf.size - 1)
    found = sf[pos] == needles
    assigned = np.where(
        found, (order[pos] // lr_h.shape[1]).astype(np.int32), -1
    ).reshape(qn, k)
    del lr_h, flat, order, sf
    print(f"assigned-leaf inversion in {time.time() - t0:.0f}s "
          f"(unplaced={np.mean(assigned < 0):.4f})", file=sys.stderr)

    # Primary centroid of each truth row: regenerate truth-row
    # embeddings (rows are defined by the generator stream).
    centroids = index._centroids

    @jax.jit
    def primary_of(batch_embs):
        return jnp.argmax(batch_embs @ centroids.T, axis=1)

    # Gather truth-row embeddings by regenerating their batches.
    need = np.unique(truth.reshape(-1))
    embs = np.zeros((need.shape[0], d), np.float32)
    for b in range(nb):
        lo, hi = b * bchunk, min((b + 1) * bchunk, n)
        sel = need[(need >= lo) & (need < hi)]
        if sel.size == 0:
            continue
        batch = sample_t(hi - lo, jnp.uint32(b))
        embs[np.searchsorted(need, sel)] = np.asarray(
            batch[jnp.asarray(sel - lo)]
        )
    primary = np.asarray(
        primary_of(jnp.asarray(embs))
    )
    prim_of_truth = primary[
        np.searchsorted(need, truth.reshape(-1))
    ].reshape(qn, k)
    print("primaries computed", file=sys.stderr)

    # Query probe lists at several depths (per-query, tile=1 ceiling).
    cq = np.asarray(fixed_queries @ centroids.T)     # [Q, L]
    order = np.argsort(-cq, axis=1)
    out = {}
    for P in (512, 1024, 1536, 2048, 3072):
        probes = order[:, :P]                        # [Q, P]
        placement = np.mean([
            np.isin(assigned[q], probes[q]).mean() for q in range(qn)
        ])
        prim_cov = np.mean([
            np.isin(prim_of_truth[q], probes[q]).mean()
            for q in range(qn)
        ])
        out[P] = (placement, prim_cov)
        print(f"P={P:5d} placement={placement:.4f} "
              f"primary={prim_cov:.4f}", file=sys.stderr)

    # Achieved recall at the bench configuration (P=1536, tile=64).
    _, got = index(fixed_queries, k)
    got = np.asarray(got)
    rec = np.mean([
        len(set(got[q]) & set(truth[q])) / k for q in range(qn)
    ])
    print(f"achieved recall@100 (P=1536, T64): {rec:.4f}",
          file=sys.stderr)
    spill_rate = np.mean(assigned != prim_of_truth)
    print(f"truth rows not in their primary leaf: {spill_rate:.4f}",
          file=sys.stderr)
    import json
    print(json.dumps({
        "achieved": round(float(rec), 4),
        "spill_rate_truth_rows": round(float(spill_rate), 4),
        "by_P": {str(p): [round(float(a), 4), round(float(b), 4)]
                 for p, (a, b) in out.items()},
    }))


if __name__ == "__main__":
    main()
