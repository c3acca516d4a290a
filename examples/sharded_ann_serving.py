"""Beyond-one-chip approximate serving: streamed SHARDED index builds.

The round-4 capacity story end to end: a corpus too large for any single
device streams batch-by-batch onto its owning devices
(`ShardedBucketed.index_streamed` / `ShardedScaNN.index_streamed`), and
queries run SPMD with only `k × devices` rows of cross-device traffic.
The sharded ScaNN serves its FULL production configuration — int8
leaves, in-kernel bucketed fold per shard, balanced k-means partitions,
and an exact reorder over the row-sharded corpus.

Run under `XLA_FLAGS=--xla_force_host_platform_device_count=8
JAX_PLATFORMS=cpu` to simulate 8 devices on CPU (what
tools/run_examples.py does), or as-is on a TPU slice. Reference
counterpart: ScaNN serialized into the SavedModel + Streaming's
host-bounded corpus (`tensorflow_recommenders/layers/
factorized_top_k.py:404-509,688-707`); here capacity scales with mesh
devices instead of host RAM.
"""

import numpy as np

import jax

from recommenders_tpu.layers import approximate, factorized_top_k
from recommenders_tpu.parallel import ann as parallel_ann


def main(num_rows: int = 40_000, dim: int = 128, batch: int = 4_096):
    print(f"devices: {jax.device_count()}")
    rng = np.random.RandomState(0)
    centers = rng.normal(size=(64, dim)).astype(np.float32)

    # A host-side batch stream stands in for a corpus of embeddings far
    # past one device's memory: each batch goes STRAIGHT to the shard
    # that owns its rows — the full corpus never exists on any device.
    def corpus_batches():
        r = np.random.RandomState(7)
        for start in range(0, num_rows, batch):
            b = min(batch, num_rows - start)
            a = r.randint(0, 64, b)
            yield (centers[a] + 0.3 * r.normal(size=(b, dim))).astype(
                np.float32
            )

    queries = (
        centers[rng.randint(0, 64, 128)]
        + 0.3 * rng.normal(size=(128, dim))
    ).astype(np.float32)

    # Exact baseline: the Bucketed sweep, also streamed + sharded.
    bucketed = parallel_ann.ShardedBucketed(
        k=10, buckets=512, chunk=512, quantize="int8"
    ).index_streamed(corpus_batches, num_rows)
    b_scores, b_ids = bucketed(queries)

    # ScaNN production config, streamed + sharded: probed int8 leaves,
    # bucketed in-kernel fold, balanced k-means, exact reorder over the
    # row-sharded corpus.
    scann = parallel_ann.ShardedScaNN(
        approximate.ScaNN(
            k=10,
            num_leaves=64,
            num_leaves_to_search=24,
            quantize="int8",
            scoring_buckets=768,
            probe_tile=8,
            num_reordering_candidates=60,
            kmeans_balance_fraction=0.125,
            training_iterations=8,
        )
    ).index_streamed(corpus_batches, num_rows)
    s_scores, s_ids = scann(queries)

    # Ground truth from an exact single-device scan (small demo corpus).
    full = np.concatenate(list(corpus_batches()), axis=0)
    bf = factorized_top_k.BruteForce(k=10).index(full)
    _, true_ids = bf(queries)

    def recall(ids):
        ids, truth = np.asarray(ids), np.asarray(true_ids)
        return np.mean(
            [len(set(ids[i]) & set(truth[i])) / 10 for i in range(128)]
        )

    n_shards = len(bucketed._candidates.addressable_shards)
    print(
        f"streamed sharded Bucketed over {n_shards} shards: "
        f"recall@10 {recall(b_ids):.3f}"
    )
    print(
        f"streamed sharded ScaNN (probed+fold+reorder): "
        f"recall@10 {recall(s_ids):.3f}"
    )
    assert recall(b_ids) > 0.95
    assert recall(s_ids) > 0.85


if __name__ == "__main__":
    main()
