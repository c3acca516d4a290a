"""ANN serving benchmark: recall/qps curves at large corpus scale.

Measures the ScaNN-style index (device-resident build + leaf-scoring
Pallas kernel + int8 anisotropic quantization) against the Bucketed
kernel and chunked exact scoring on the real chip, at corpus sizes up to
SURVEY §7 config-5 territory.

Nothing large crosses the host link: the clustered corpus is GENERATED
on device with jax.random, the index builds on device
(`ScaNN._index_device`), and ground truth is a chunked exact top-k that
runs as one jitted loop — only the final `[Q, k]` id matrices return to
the host. (The remote-attached chip's tunnel moves ~25 MB/s; a 10M×128
f32 corpus would take ~3.5 minutes PER TRANSFER the host-build path
needs several of.)

The reference's published serving numbers are colab-CPU ScaNN
("~2 ms/query over ~1M", "15× faster than brute force",
docs/examples/efficient_serving.ipynb); this prints the TPU-native
equivalents with recall attached.

Usage:
  python benchmarks/ann.py --corpus 10000000 [--dim 128] [--queries 256]
      [--skip-exact-timing] [--skip-bucketed]

Time-derived query seeds defeat the tunnel's (program, input) result
cache (CLAUDE.md gotcha).
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np  # noqa: E402

NUM_CLUSTERS = 256
NOISE = 0.6


def _make_corpus_fns(dim, seed):
    """Device-side clustered data generators (recsys embeddings are not
    isotropic noise)."""
    import jax
    import jax.numpy as jnp

    centers = jax.random.normal(
        jax.random.PRNGKey(seed), (NUM_CLUSTERS, dim), jnp.float32
    )

    @functools.partial(jax.jit, static_argnames=("n", "salt"))
    def sample(n, salt):
        key = jax.random.PRNGKey(seed + salt)
        ka, kn = jax.random.split(key)
        a = jax.random.randint(ka, (n,), 0, NUM_CLUSTERS)
        return centers[a] + NOISE * jax.random.normal(
            kn, (n, dim), jnp.float32
        )

    @functools.partial(jax.jit, static_argnames=("n",))
    def sample_t(n, salt):
        # Traced salt: one compile covers every batch of a streamed
        # sweep (the static-salt variant would recompile per batch).
        key = jax.random.PRNGKey(seed) + jnp.uint32(salt)
        ka, kn = jax.random.split(key)
        a = jax.random.randint(ka, (n,), 0, NUM_CLUSTERS)
        return centers[a] + NOISE * jax.random.normal(
            kn, (n, dim), jnp.float32
        )

    return sample, sample_t


def _exact_topk_device(queries, corpus, k, chunk=1 << 19):
    """Chunked exact top-k fully on device (merging running top-k)."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("k", "chunk"))
    def run(queries, corpus, k, chunk):
        n, d = corpus.shape
        q = queries.shape[0]

        def merge(s, i, block_scores, base):
            ids = base + jnp.arange(
                block_scores.shape[1], dtype=jnp.int32
            )
            cs = jnp.concatenate([s, block_scores], axis=1)
            ci = jnp.concatenate(
                [i, jnp.broadcast_to(ids, block_scores.shape)], axis=1
            )
            ts, ti = jax.lax.top_k(cs, k)
            return ts, jnp.take_along_axis(ci, ti, axis=1)

        s = jnp.full((q, k), -jnp.inf, jnp.float32)
        i = jnp.zeros((q, k), jnp.int32)
        nfull = n // chunk
        if nfull:
            def body(b, carry):
                s, i = carry
                block = jax.lax.dynamic_slice(
                    corpus, (b * chunk, 0), (chunk, d)
                )
                return merge(s, i, queries @ block.T, b * chunk)

            s, i = jax.lax.fori_loop(0, nfull, body, (s, i))
        if n % chunk:
            s, i = merge(
                s, i, queries @ corpus[nfull * chunk:].T, nfull * chunk
            )
        return s, i

    return run(queries, corpus, k, chunk)


def _recall(ids, truth):
    hits = 0
    for i in range(truth.shape[0]):
        hits += len(set(ids[i].tolist()) & set(truth[i].tolist()))
    return hits / truth.size


def _time_queries(fn, queries_fn, trials=5, pipeline=4):
    """Seconds per invocation, pipelined dispatch, honest fence.

    Each trial issues `pipeline` fresh query batches back-to-back and
    fetches a scalar of the LAST output to host — device execution is
    FIFO, so the fetch bounds all of them. Serializing on
    `block_until_ready` per batch (the old scheme) adds this tunnel's
    ~1.5-30 ms dispatch/ack round-trip to every batch and UNDER-reports
    device throughput ~4x (measured on the 1M serving bench: bucketed
    27.6k -> 118k q/s); `block_until_ready` through the tunnel is also
    not a completion guarantee (CLAUDE.md) — only a device→host fetch
    is.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np_

    def fence(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np_.asarray(leaf[(0,) * leaf.ndim])

    # Compile + stage: all trial batches (plus a dedicated warm batch —
    # reusing a trial batch would hit the chip's result cache mid-trial)
    # up front, fenced.
    batches = [
        [queries_fn() for _ in range(pipeline)] for _ in range(trials)
    ]
    warm = queries_fn()
    fence(jax.jit(lambda xs: sum(jnp.sum(x) for x in xs))(
        [warm] + [q for t in batches for q in t]
    ))
    fence(fn(warm))
    times = []
    for t in range(trials):
        t0 = time.perf_counter()
        out = None
        for q in batches[t]:
            out = fn(q)
        fence(out)
        times.append((time.perf_counter() - t0) / pipeline)
    return sorted(times)[len(times) // 2]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", type=int, default=1_000_000)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--queries", type=int, default=256)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--skip-exact-timing", action="store_true")
    p.add_argument("--skip-bucketed", action="store_true")
    p.add_argument(
        "--streaming", action="store_true",
        help="Streamed build (Bucketed.index_streamed): the f32 "
        "corpus never exists on device, so corpora past HBM's f32 "
        "capacity (100M x 128 on a 16 GB chip) become servable.",
    )
    p.add_argument(
        "--streaming-quantize", default="int4", choices=("int4", "int8"),
        help="Storage for the streamed build: int4 (6.4 GB at 100Mx128, "
        "capacity row) or int8 anisotropic (12.8 GB — the quality row; "
        "recall caps near the int8 ceiling instead of int4's ~0.78).",
    )
    p.add_argument(
        "--streaming-index", default="bucketed",
        choices=("bucketed", "scann"),
        help="bucketed = full scan; scann = streamed PARTITIONED build "
        "(ScaNN.index_streamed) probing a leaf subset per query.",
    )
    p.add_argument("--leaves", type=int, default=8192)
    p.add_argument("--probes", type=int, default=1024)
    p.add_argument("--probe-tile", type=int, default=64)
    p.add_argument(
        "--capacity-factor", type=float, default=1.3,
        help="Leaf capacity as a multiple of mean leaf size. Lower "
        "saves HBM (int8 at 100M needs ~1.1 to fit) at the cost of "
        "more overflow spilling.",
    )
    p.add_argument("--spill-rounds", type=int, default=4)
    p.add_argument(
        "--scoring-buckets", type=int, default=4096,
        help="(--streaming-index scann) in-kernel argmax fold width; "
        "collision recall loss ~ k^2/2B, so B=8192 halves it vs 4096 "
        "at k=100 (clamped to leaf capacity; multiple of 128).",
    )
    p.add_argument(
        "--balance", type=float, default=0.0,
        help="(--streaming-index scann) kmeans_balance_fraction: "
        "split-reseed this fraction of the lightest leaves next to "
        "the heaviest each Lloyd iteration (spill control at tight "
        "capacity).",
    )
    p.add_argument(
        "--train-iters", type=int, default=8,
        help="k-means Lloyd iterations for the streamed partitioned "
        "build; under-converged centroids skew leaf masses and drive "
        "capacity spill.",
    )
    p.add_argument("--build-batch", type=int, default=2_000_000)
    p.add_argument(
        "--only", default=None,
        help="Run only configs whose name contains this substring.",
    )
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from recommenders_tpu.layers import approximate, factorized_top_k

    n, d, qn, k = args.corpus, args.dim, args.queries, args.k
    print(f"backend={jax.default_backend()} corpus={n}x{d} "
          f"queries={qn} k={k}", file=sys.stderr)

    sample, sample_t = _make_corpus_fns(d, seed=0)
    if args.streaming:
        return run_streaming(args, sample, sample_t)
    t0 = time.time()
    corpus = jax.block_until_ready(sample(n, 0))
    print(f"corpus generated on device in {time.time() - t0:.1f}s",
          file=sys.stderr)

    seed0 = int(time.time())  # Defeat the tunnel result cache.
    salt = [0]

    def fresh_queries():
        salt[0] += 1
        return sample(qn, seed0 + salt[0])

    fixed_queries = sample(qn, 1 << 30)
    t0 = time.time()
    _, truth_ids = _exact_topk_device(fixed_queries, corpus, k)
    truth = np.asarray(truth_ids)
    print(f"ground truth in {time.time() - t0:.1f}s", file=sys.stderr)

    results = []

    def bench(name, query_fn, sized_bytes, build_s=None):
        t0 = time.time()
        qps = qn / _time_queries(query_fn, fresh_queries)
        _, ids = query_fn(fixed_queries)
        rec = _recall(np.asarray(ids), truth)
        entry = {
            "config": name,
            "qps": round(qps),
            "recall_at_100": round(rec, 4),
            "index_mb": round(sized_bytes / 2**20),
        }
        if build_s is not None:
            entry["build_s"] = round(build_s, 1)
        results.append(entry)
        print(f"  {name}: {qps:,.0f} q/s, recall@{k} {rec:.4f} "
              f"({time.time() - t0:.0f}s)", file=sys.stderr)

    if not args.skip_exact_timing:
        print("exact (chunked device scan)...", file=sys.stderr)
        bench(
            "exact_chunked",
            lambda q: _exact_topk_device(q, corpus, k),
            n * d * 4,
        )

    def want(name):
        return args.only is None or args.only in name

    if not args.skip_bucketed and d % 128 == 0:
        if want("bucketed_bf16_4096"):
            print("bucketed...", file=sys.stderr)
            bk = factorized_top_k.Bucketed(
                k=k, buckets=4096, chunk=4096, query_tile=128,
                corpus_dtype=jnp.bfloat16,
            ).index(corpus)
            bench("bucketed_bf16_4096", lambda q: bk(q, k), n * d * 2)
            del bk
        if want("bucketed_int8_4096"):
            print("bucketed int8...", file=sys.stderr)
            bk8 = factorized_top_k.Bucketed(
                k=k, buckets=4096, chunk=4096, query_tile=128,
                quantize="int8",
            ).index(corpus)
            bench("bucketed_int8_4096", lambda q: bk8(q, k), n * d)
            del bk8
        if want("bucketed_int4_4096"):
            # int4 needs buckets | chunk/2 → chunk 8192 for B=4096; the
            # halved corpus block keeps the VMEM budget at the bf16
            # recipe's level.
            print("bucketed int4...", file=sys.stderr)
            bk4 = factorized_top_k.Bucketed(
                k=k, buckets=4096, chunk=8192, query_tile=128,
                quantize="int4",
            ).index(corpus)
            bench("bucketed_int4_4096", lambda q: bk4(q, k), n * d // 2)
            del bk4

    # Learned-codebook PQ full scans (ops/product_quantization): the
    # LUT16-on-MXU counterpart of the scalar int4 sweep. ds=1 spends
    # int4's 4 bits/dim on learned per-dim grids; ds=2 is score_ah(2)'s
    # 2 bits/dim, halving index bytes again.
    from recommenders_tpu.ops import product_quantization as pq_lib

    for ds in (1, 2):
        name = f"pq_ds{ds}_maxnorm"
        if not want(name) or d % ds:
            continue
        if n > 2_000_000 and args.only is None:
            # PQ's encode intermediates exceed HBM past ~2M rows and its
            # verdict (dominated ~90× by scalar int4 at equal bits/dim)
            # was settled at 1M — skip unless explicitly requested.
            print(f"{name}: skipped at n={n} (run with --only pq_)",
                  file=sys.stderr)
            continue
        print(f"{name}...", file=sys.stderr)
        t0 = time.time()
        scales, normed = pq_lib.normalize_rows(corpus, "max")
        # 256k training rows: K=16 per-subspace k-means is saturated far
        # below that (ScaNN also trains AH codebooks on a sample).
        cb = pq_lib.train_codebooks(
            normed[: min(n, 1 << 18)], d // ds, 16,
            iterations=10, block=1 << 17,
        )
        codes = pq_lib.encode(normed, cb, chunk=1 << 19)
        packed = jax.block_until_ready(pq_lib.pack_codes(codes))
        del normed, codes
        pad = (-n) % 8192
        packed = jnp.pad(packed, ((0, pad), (0, 0)))
        scales_p = jnp.pad(scales, (0, pad))
        build_s = time.time() - t0
        print(f"  trained+encoded on device in {build_s:.0f}s",
              file=sys.stderr)
        bench(
            name,
            lambda q: pq_lib.pq_top_k(
                q, packed, cb, k, row_scales=scales_p, valid_rows=n,
                buckets=4096, chunk=8192,
            ),
            n * (d // ds // 2 + 4),
            build_s=build_s,
        )
        del packed, scales_p, scales

    leaves = max(64, 1 << int(np.log2(np.sqrt(n) * 2)))
    # (probes, reorder, storage, scoring_buckets, probe_tile):
    # int8 anisotropic vs bf16 leaves; f32 vs bf16 reorder corpora; the
    # [Q, P·cap] top-k vs in-kernel bucketed argmax; per-query vs
    # tile-coherent probing — every dial of the recall/bandwidth trade.
    for probes, reorder, storage, buckets, tile in (
        (leaves // 16, None, "int8", None, 1),
        (leaves // 8, None, "int8", None, 1),
        (leaves // 8, None, "bf16", None, 1),
        (leaves // 8, 4 * k, "int8", None, 1),
        (leaves // 8, 4 * k, "int8+bf16reorder", None, 1),
        (leaves // 16, None, "int8", 4096, 1),
        (leaves // 8, None, "int8", 4096, 1),
        (leaves // 8, None, "int8", 4096, 64),
        (leaves // 4, None, "int8", 4096, 64),
        (leaves // 4, None, "int8", 4096, 128),
        (leaves // 4, 4 * k, "int8+bf16reorder", 4096, 64),
        (leaves // 8, None, "int4", 4096, 64),
        (leaves // 4, None, "int4", 4096, 64),
        (leaves // 4, 4 * k, "int4+bf16reorder", 4096, 64),
        (leaves // 8, 4 * k, "int4+bf16reorder", None, 1),
    ):
        name = f"scann_L{leaves}_P{probes}_{storage}" + (
            f"_B{buckets}" if buckets else ""
        ) + (f"_T{tile}" if tile > 1 else "") + (
            f"_R{reorder}" if reorder else ""
        )
        if not want(name):
            continue
        print(f"{name}...", file=sys.stderr)
        t0 = time.time()
        quantize = False
        for q_kind in ("int8", "int4"):
            if storage.startswith(q_kind):
                quantize = q_kind
        index = approximate.ScaNN(
            k=k,
            num_leaves=leaves,
            num_leaves_to_search=probes,
            quantize=quantize,
            leaf_dtype=(
                jnp.bfloat16 if storage == "bf16" else jnp.float32
            ),
            reorder_dtype=(
                jnp.bfloat16 if "bf16reorder" in storage else jnp.float32
            ),
            anisotropic_quantization_threshold=0.2,
            num_reordering_candidates=reorder,
            scoring_buckets=buckets,
            probe_tile=tile,
            query_batch=qn,
            kmeans_sample_size=min(n, 1 << 21),
            kmeans_balance_fraction=args.balance,
            training_iterations=args.train_iters,
        )
        index.index(corpus)  # jax.Array → device-resident build
        build_s = time.time() - t0
        print(f"  built on device in {build_s:.0f}s", file=sys.stderr)
        bytes_per_row = d * (
            2 if storage == "bf16" else 0.5 if quantize == "int4" else 1
        )
        bench(name, lambda q: index(q, k), int(n * 1.3) * bytes_per_row,
              build_s=build_s)
        # Release per-config leaf blocks before the next build.
        del index

    print(json.dumps({"corpus": n, "dim": d, "results": results}))


def run_streaming(args, sample, sample_t):
    """100M-scale path: streamed int4 build + regenerated ground truth.

    The corpus is DEFINED as the concatenation of `sample_t(bchunk, i)`
    batches; both the index build and the exact ground-truth scan
    regenerate the same batches, so nothing corpus-sized ever exists in
    f32 (51 GB at 100M×128 — over a v5e's 16 GB HBM; the packed int4
    index is 6.4 GB).
    """
    import jax
    import jax.numpy as jnp

    from recommenders_tpu.layers import factorized_top_k

    n, d, qn, k = args.corpus, args.dim, args.queries, args.k
    bchunk = min(args.build_batch, n)
    nb = (n + bchunk - 1) // bchunk
    print(f"backend={jax.default_backend()} corpus={n}x{d} (streamed, "
          f"{nb} x {bchunk}-row batches) queries={qn} k={k}",
          file=sys.stderr)

    def gen_batches():
        for i in range(nb):
            m = min(bchunk, n - i * bchunk)
            yield sample_t(m, jnp.uint32(i))

    # Ground truth FIRST, while HBM is empty: the exact scan's working
    # set (regenerated 1 GB f32 batches + scores) must not coexist with
    # a near-capacity index (the 13.4 GB int8 ScaNN build left no room
    # and the post-build scan OOMed).
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
    truth = np.asarray(ids)
    del s, ids, batch
    print(f"ground truth (regenerated scan) in {time.time() - t0:.0f}s",
          file=sys.stderr)

    t0 = time.time()
    quant = args.streaming_quantize
    if args.streaming_index == "scann":
        from recommenders_tpu.layers import approximate

        leaves = args.leaves
        grain = 256 if quant == "int4" else 128
        mean = n / leaves
        cap = int(np.ceil(args.capacity_factor * mean / grain)) * grain
        index = approximate.ScaNN(
            k=k, num_leaves=leaves,
            num_leaves_to_search=args.probes,
            quantize=quant, leaf_capacity=cap,
            scoring_buckets=args.scoring_buckets,
            probe_tile=args.probe_tile,
            query_batch=qn, kmeans_sample_size=1 << 21,
            kmeans_balance_fraction=args.balance,
            training_iterations=args.train_iters,
            spill_rounds=args.spill_rounds,
        )
        index.index_streamed(gen_batches, num_rows=n)
        jax.block_until_ready(index._leaf_embs)
        build_s = time.time() - t0
        name = (
            f"scann_L{leaves}_P{args.probes}_{quant}"
            f"_B{args.scoring_buckets}"
            f"_T{args.probe_tile}_cap{args.capacity_factor}_streamed"
        )
        index_bytes = (
            index._leaf_embs.nbytes
            + index._leaf_scales.nbytes
            + index._leaf_rows.nbytes
        )
        print(f"streamed partitioned {quant} build: {build_s:.0f}s "
              f"({index_bytes / 2**30:.1f} GiB leaves)", file=sys.stderr)
    else:
        # int4 packs pairs across chunk/2, so its chunk doubles to keep
        # the same VMEM block bytes; int8 uses the standard 4096 grid.
        chunk = 8192 if quant == "int4" else 4096
        index = factorized_top_k.Bucketed(
            k=k, buckets=4096, chunk=chunk, query_tile=128,
            quantize=quant,
        ).index_streamed(gen_batches(), num_rows=n)
        jax.block_until_ready(index._candidates)
        build_s = time.time() - t0
        name = f"bucketed_{quant}_4096_streamed"
        index_bytes = index._candidates.nbytes + index._scales.nbytes
        print(f"streamed {quant} build: {build_s:.0f}s "
              f"({index._candidates.nbytes / 2**30:.1f} GiB packed)",
              file=sys.stderr)

    seed0 = int(time.time())
    salt = [1 << 20]

    def fresh_queries():
        salt[0] += 1
        return sample_t(qn, jnp.uint32(seed0 + salt[0]))

    qps = qn / _time_queries(lambda q: index(q, k), fresh_queries)
    _, got = index(fixed_queries, k)
    rec = _recall(np.asarray(got), truth)
    entry = {
        "config": name,
        "qps": round(qps),
        "recall_at_100": round(rec, 4),
        "index_mb": round(index_bytes / 2**20),
        "build_s": round(build_s, 1),
    }
    print(f"  {entry['config']}: {qps:,.0f} q/s, recall@{k} {rec:.4f}",
          file=sys.stderr)
    print(json.dumps({"corpus": n, "dim": d, "streamed": True,
                      "results": [entry]}))


if __name__ == "__main__":
    main()
