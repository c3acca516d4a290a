"""Mesh-sharded approximate serving: Bucketed and ScaNN over a corpus axis.

`parallel.corpus.ShardedBruteForce` scales EXACT retrieval by sharding
corpus rows across the mesh; this module applies the same distributed
top-k reduction (SURVEY.md §5 "corpus-sharded scoring") to the two
APPROXIMATE indexes, which is what makes corpora past one chip's HBM —
or higher-precision storage at a fixed corpus size — servable on a
slice:

  - `ShardedBucketed`: corpus rows sharded over `mesh[axis]`; every
    shard sweeps its local rows with the bucketed Pallas kernel
    (`ops/scoring.bucketed_top_k`; the jnp oracle on CPU), takes a
    local top-k over its buckets, and the global result is
    `all_gather(k)` + re-top-k over ICI. Each shard folds into its own
    bucket state, so the effective selection width is
    `devices × buckets` — sharding never lowers bucket recall.
  - `ShardedScaNN`: k-means LEAVES sharded over `mesh[axis]`, centroids
    replicated. Every shard computes the same global top-P probe list
    (one small `[Q, L]` matmul), scores only the probed leaves IT OWNS
    (foreign probes mask to MIN_FLOAT), and contributes a local top-k;
    the global reduction is the same `all_gather + re-top-k`. Scores
    are identical to the single-device `ScaNN` layer's — per-shard
    masking partitions the probed slots exactly — so results match the
    unsharded index up to score-tie ordering.

The reference's corresponding scaling knobs are single-host threading:
Streaming's parallel tf.data map/reduce and ScaNN's
`parallelize_batch_searches` (`tensorflow_recommenders/layers/
factorized_top_k.py:404-509,665-666,764-788`). Here the scale axis is
mesh devices, and the cross-device traffic is `k·devices` rows per
query batch instead of corpus-sized.

On a 1-device mesh both layers degrade to their single-chip twins.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from recommenders_tpu.layers import factorized_top_k as layers_ftk
from recommenders_tpu.ops import topk as topk_ops
from recommenders_tpu.parallel import mesh as mesh_lib

Array = jax.Array

MIN_FLOAT = topk_ops.MIN_FLOAT


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _shard_devices(mesh: Mesh, axis: str):
    """The axis devices of a 1-axis mesh, in shard order.

    Streamed sharded builds place per-shard buffers on explicit devices;
    with more than one mesh axis the buffers would additionally need
    replication over the other axes, which the builds do not implement.
    """
    if mesh.devices.size != mesh.shape[axis]:
        raise ValueError(
            "index_streamed requires a mesh whose only axis is "
            f"{axis!r}; got axes {mesh.axis_names} with shape "
            f"{dict(mesh.shape)}."
        )
    return list(mesh.devices.flatten())


# Eager `index()` guard: a host corpus bigger than this (f32 bytes)
# must not be materialized on ONE device by a Sharded* entry point —
# that is exactly the scale sharding exists for. Conservative for a
# 16 GB v5e: the eager build needs the corpus plus a padded copy.
SINGLE_DEVICE_BUILD_BUDGET_BYTES = 6 << 30


def _host_corpus_rows(candidates, budget_bytes: int):
    """Returns `(as_numpy, n_rows)` when `candidates` is a HOST array
    whose f32 footprint exceeds `budget_bytes`, else `(None, 0)`.

    Device-resident `jax.Array`s are excluded: their placement already
    happened at the caller's hands, so delegating cannot unmaterialize
    anything (and sharded inputs are already distributed)."""
    if isinstance(candidates, jax.Array):
        return None, 0
    arr = np.asarray(candidates)
    if arr.ndim == 2 and arr.shape[0] * arr.shape[1] * 4 > budget_bytes:
        return arr, arr.shape[0]
    return None, 0


def _batched(arr: np.ndarray, rows: int = 1 << 18):
    def gen():
        for i in range(0, arr.shape[0], rows):
            yield arr[i:i + rows]
    return gen


def _zeros_on(shape, dtype, dev):
    """Allocates zeros DIRECTLY on `dev` — no host buffer, no transfer
    (a 100M-scale shard must not ride the ~25 MB/s host link)."""
    sharding = jax.sharding.SingleDeviceSharding(dev)
    return jax.jit(
        lambda: jnp.zeros(shape, dtype), out_shardings=sharding
    )()


def _full_on(shape, value, dtype, dev):
    sharding = jax.sharding.SingleDeviceSharding(dev)
    return jax.jit(
        lambda: jnp.full(shape, value, dtype), out_shardings=sharding
    )()


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_vec(buf: Array, block: Array, off) -> Array:
    """Writes 1-D `block` into 1-D `buf` at `off` (donated, in-place)."""
    return jax.lax.dynamic_update_slice(buf, block, (off,))


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_ids(
    ids_buf: Array, vals: Array, leaf_b: Array, slot_b: Array
) -> Array:
    """Scatters per-row identifiers into `[leaves, capacity]` blocks
    (donated, in-place); sentinel leaf indices drop out of bounds."""
    return ids_buf.at[leaf_b, slot_b].set(vals, mode="drop")


def _assemble_sharded(mesh: Mesh, axis: str, shards) -> Array:
    """Stacks per-device shard arrays into one global array sharded over
    `mesh[axis]` — metadata only, no data movement: each shard is
    already resident on its device."""
    shard_shape = shards[0].shape
    global_shape = (len(shards) * shard_shape[0],) + shard_shape[1:]
    return jax.make_array_from_single_device_arrays(
        global_shape, NamedSharding(mesh, P(axis)), list(shards)
    )


class ShardedBucketed(layers_ftk.TopK):
    """Bucketed Pallas serving over a mesh-sharded corpus.

    Same recall/throughput dials as `layers.factorized_top_k.Bucketed`
    (`buckets`, `chunk`, `query_tile`, `quantize`/`corpus_dtype`), with
    the corpus row-sharded over `mesh[axis]`. Rows pad per shard to the
    chunk grid at index time; each shard's true row count reaches the
    kernel as a dynamic SMEM scalar (`ops/scoring.bucketed_scores`), so
    one program serves every shard.

    Attributes:
      query_fn: Optional query-embedding function.
      buckets / chunk / query_tile: Kernel dials (see `Bucketed`).
      quantize: False, "int8", or "int4" (per-row scales; int4 packs
        two codes per byte with a PER-SHARD pairing stride).
      corpus_dtype: Storage dtype for unquantized corpora.
      anisotropic_quantization_threshold: Score-aware scale refinement.
      mesh: Device mesh; defaults to all devices on one `axis`.
      axis: Mesh axis name sharding the corpus rows.
    """

    def __init__(
        self,
        query_fn: Optional[Callable[[Array], Array]] = None,
        k: int = 10,
        buckets: int = 2048,
        chunk: int = 2048,
        query_tile: int = 256,
        corpus_dtype=None,
        quantize=False,
        anisotropic_quantization_threshold: Optional[float] = 0.2,
        mesh: Optional[Mesh] = None,
        axis: str = mesh_lib.MODEL_AXIS,
    ) -> None:
        super().__init__(k=k)
        quantize = {True: "int8", False: None}.get(quantize, quantize)
        if quantize not in (None, "int8", "int4"):
            raise ValueError(
                f"quantize must be False, True, 'int8' or 'int4'; got "
                f"{quantize!r}"
            )
        if quantize and corpus_dtype is not None:
            raise ValueError(
                "quantize stores integer codes; corpus_dtype must be None."
            )
        if quantize == "int4" and (chunk // 2) % buckets != 0:
            raise ValueError(
                f"quantize='int4' needs buckets ({buckets}) to divide "
                f"chunk/2 ({chunk // 2})."
            )
        self.query_fn = query_fn
        self._buckets = buckets
        self._chunk = chunk
        self._query_tile = query_tile
        self._corpus_dtype = corpus_dtype
        self._quantize = quantize
        self._anisotropic_threshold = anisotropic_quantization_threshold
        if mesh is None:
            mesh = mesh_lib.create_mesh(
                shape=(jax.device_count(),), axis_names=(axis,)
            )
        self._mesh = mesh
        self._axis = axis
        self._candidates = None
        self._fns = {}

    def index(
        self,
        candidates: Array,
        identifiers: Optional[Array] = None,
    ) -> "ShardedBucketed":
        from recommenders_tpu.ops import quantization, scoring

        # A host corpus past one device's build budget must never be
        # committed to a single device here — delegate to the streamed
        # build, which moves each row block straight to its owning
        # shard device (bit-equal to this path: tests/test_sharded_ann
        # asserts eager/streamed agreement).
        if self._mesh.shape[self._axis] > 1:
            host, n_rows = _host_corpus_rows(
                candidates, SINGLE_DEVICE_BUILD_BUDGET_BYTES
            )
            if host is not None:
                return self.index_streamed(
                    _batched(host), n_rows, identifiers=identifiers
                )

        candidates = jnp.asarray(candidates)
        if candidates.ndim != 2:
            raise ValueError(
                f"The candidates tensor must be 2D (got {candidates.shape})."
            )
        if candidates.shape[1] % 128 != 0:
            raise ValueError(
                "ShardedBucketed requires the embedding dim to be a "
                f"multiple of 128; got {candidates.shape[1]}."
            )
        n, d = candidates.shape
        identifiers = self._intern_identifiers(identifiers, n)
        if identifiers is not None:
            identifiers = jnp.asarray(identifiers)
            if identifiers.shape[0] != n:
                raise ValueError(
                    "The candidates and identifiers tensors must have the "
                    f"same number of rows (got {n} and "
                    f"{identifiers.shape[0]})."
                )
        s = self._mesh.shape[self._axis]
        # Equal chunk-aligned rows per shard; trailing shards may be
        # partially (or fully) padding, masked via per-shard valid
        # counts.
        rps = _round_up(-(-n // s), self._chunk)
        padded = jnp.pad(candidates, ((0, s * rps - n), (0, 0)))
        scales = None
        if self._quantize:
            bits = 4 if self._quantize == "int4" else 8
            scales, codes = quantization.quantize_rows_device(
                padded, self._anisotropic_threshold, bits=bits
            )
            scales = scales.reshape(s, rps)
            codes = codes.reshape(s, rps, d)
            if bits == 4:
                # Packs the per-shard row axis: slot r pairs with
                # r + rps/2 WITHIN the shard — the stride the kernel
                # derives from its local shape.
                codes = quantization.pack_nibbles(codes)
            stacked = codes
        else:
            if self._corpus_dtype is not None:
                padded = padded.astype(self._corpus_dtype)
            stacked = padded.reshape(s, rps, d)
        sharding = NamedSharding(self._mesh, P(self._axis))
        self._candidates = jax.device_put(stacked, sharding)
        self._scales = (
            None if scales is None else jax.device_put(scales, sharding)
        )
        valid = np.clip(n - np.arange(s) * rps, 0, rps).astype(np.int32)
        self._valid = jax.device_put(jnp.asarray(valid), sharding)
        self._identifiers = identifiers
        self._num_candidates = n
        self._rows_per_shard = rps
        self._fns = {}
        return self

    def index_streamed(
        self,
        batches,
        num_rows: int,
        identifiers: Optional[Array] = None,
    ) -> "ShardedBucketed":
        """Builds the sharded index from row batches without EVER
        materializing the corpus — or any shard-crossing slice of it —
        on a single device.

        The composition of `Bucketed.index_streamed` (single-device
        streamed build) with the mesh sharding of `index`: each incoming
        batch is split at shard row boundaries on the host, and every
        piece is transferred straight to its OWNING device, where it is
        cast/quantized and written into that shard's preallocated
        buffer. Peak memory per device is one shard plus one batch, so
        an N-device slice indexes N× the corpus one chip can hold —
        e.g. 8 × 16 GB v5e chips serve ~1.2B int8 rows at d=128. The
        reference's Streaming layer achieves corpus-beyond-accelerator
        scale by keeping the corpus host-side as a tf.data stream
        (`tensorflow_recommenders/layers/factorized_top_k.py:404-509`);
        here the corpus lives sharded in HBM and queries stay
        device-resident end-to-end.

        Args:
          batches: Iterable (or zero-arg callable returning one) of
            `[b, D]` row blocks in corpus order — NumPy (host) arrays
            at scale, so pieces move host→owning-device directly.
            Uniform batch sizes avoid per-shape recompiles.
          num_rows: Total corpus rows (must match the stream).
          identifiers: Optional `[num_rows]` identifier array.
        """
        from recommenders_tpu.ops import quantization

        it = iter(batches() if callable(batches) else batches)
        identifiers = self._intern_identifiers(identifiers, num_rows)
        if identifiers is not None:
            identifiers = jnp.asarray(identifiers)
            if identifiers.shape[0] != num_rows:
                raise ValueError(
                    f"identifiers rows ({identifiers.shape[0]}) != "
                    f"num_rows ({num_rows})."
                )
        devs = _shard_devices(self._mesh, self._axis)
        s = len(devs)
        packed4 = self._quantize == "int4"
        rps = _round_up(-(-num_rows // s), self._chunk)
        half = rps // 2
        bufs = [None] * s
        scale_bufs = [None] * s
        off = 0
        d = None
        for batch in it:
            if not hasattr(batch, "ndim"):
                batch = np.asarray(batch)
            if batch.ndim != 2:
                raise ValueError(
                    f"Batches must be 2D row blocks (got {batch.shape})."
                )
            b = batch.shape[0]
            if d is None:
                d = batch.shape[1]
                if d % 128 != 0:
                    raise ValueError(
                        "ShardedBucketed requires the embedding dim to "
                        f"be a multiple of 128; got {d}."
                    )
            if off + b > num_rows:
                raise ValueError(
                    f"Batches supply more than num_rows={num_rows} rows."
                )
            pos = 0
            while pos < b:
                shard = off // rps
                local = off % rps
                take = min(b - pos, rps - local)
                dev = devs[shard]
                if bufs[shard] is None:
                    if self._quantize:
                        code_rows = half if packed4 else rps
                        bufs[shard] = _zeros_on(
                            (code_rows, d), jnp.int8, dev
                        )
                        scale_bufs[shard] = _zeros_on(
                            (rps,), jnp.float32, dev
                        )
                    else:
                        dtype = self._corpus_dtype or jnp.float32
                        bufs[shard] = _zeros_on((rps, d), dtype, dev)
                piece = jax.device_put(batch[pos:pos + take], dev)
                if self._quantize:
                    bits = 4 if packed4 else 8
                    sc, codes = quantization.quantize_rows_device(
                        piece, self._anisotropic_threshold, bits=bits
                    )
                    scale_bufs[shard] = _write_vec(
                        scale_bufs[shard], sc, local
                    )
                    if packed4:
                        # Nibble pairing strides PER SHARD: local slot r
                        # pairs with r + rps/2 within the shard (the
                        # stride the kernel derives from its local
                        # shape). A piece straddling the half boundary
                        # splits; each (row, nibble) is written once, so
                        # OR-ing into the zero buffer is exact.
                        cut = int(np.clip(half - local, 0, take))
                        if cut:
                            bufs[shard] = layers_ftk._or_nibble(
                                bufs[shard], codes[:cut], local, False
                            )
                        if take - cut:
                            bufs[shard] = layers_ftk._or_nibble(
                                bufs[shard], codes[cut:],
                                local + cut - half, True,
                            )
                    else:
                        bufs[shard] = layers_ftk._write_rows(
                            bufs[shard], codes, local
                        )
                else:
                    bufs[shard] = layers_ftk._write_rows(
                        bufs[shard], piece.astype(bufs[shard].dtype),
                        local,
                    )
                off += take
                pos += take
        if off != num_rows:
            raise ValueError(
                f"Batches supplied {off} rows, expected num_rows="
                f"{num_rows}."
            )
        # Trailing shards an undersized corpus never reached still need
        # (empty) buffers for the SPMD query program.
        for shard, dev in enumerate(devs):
            if bufs[shard] is None:
                if self._quantize:
                    code_rows = half if packed4 else rps
                    bufs[shard] = _zeros_on((code_rows, d), jnp.int8, dev)
                    scale_bufs[shard] = _zeros_on(
                        (rps,), jnp.float32, dev
                    )
                else:
                    dtype = self._corpus_dtype or jnp.float32
                    bufs[shard] = _zeros_on((rps, d), dtype, dev)
        self._candidates = _assemble_sharded(
            self._mesh, self._axis,
            [b.reshape((1,) + b.shape) for b in bufs],
        )
        self._scales = (
            _assemble_sharded(
                self._mesh, self._axis,
                [sb.reshape((1,) + sb.shape) for sb in scale_bufs],
            )
            if self._quantize else None
        )
        sharding = NamedSharding(self._mesh, P(self._axis))
        valid = np.clip(
            num_rows - np.arange(s) * rps, 0, rps
        ).astype(np.int32)
        self._valid = jax.device_put(jnp.asarray(valid), sharding)
        self._identifiers = identifiers
        self._num_candidates = num_rows
        self._rows_per_shard = rps
        self._fns = {}
        return self

    def _make_fn(self, k: int):
        from recommenders_tpu.ops import scoring

        buckets, chunk = self._buckets, self._chunk
        query_tile = self._query_tile
        corpus_dtype = self._corpus_dtype
        quantize = self._quantize
        packed4 = quantize == "int4"
        rps = self._rows_per_shard
        axis = self._axis
        on_cpu = jax.default_backend() == "cpu"

        def local_query(queries, cands, scales, valid):
            c = cands[0]
            v = valid[0]
            sc = None if scales is None else scales[0]
            if corpus_dtype is not None:
                queries = queries.astype(corpus_dtype)
            if on_cpu:
                scores, rows = scoring.bucketed_top_k_reference(
                    queries.astype(jnp.float32),
                    c if quantize else c.astype(jnp.float32),
                    k, buckets=buckets, scales=sc, packed4=packed4,
                    valid_rows=v,
                )
            else:
                scores, rows = scoring.bucketed_top_k(
                    queries, c, k, buckets=buckets, chunk=chunk,
                    query_tile=query_tile, scales=sc, packed4=packed4,
                    valid_rows=v,
                )
            rows = rows + jax.lax.axis_index(axis) * rps
            return topk_ops.distributed_top_k(scores, rows, k, axis)

        spec3 = P(self._axis)
        if self._scales is None:
            def wrapped(queries, cands, valid):
                return local_query(queries, cands, None, valid)

            sharded = jax.shard_map(
                wrapped, mesh=self._mesh,
                in_specs=(P(), spec3, spec3),
                out_specs=(P(), P()),
                check_vma=False,
            )
            return jax.jit(sharded)
        sharded = jax.shard_map(
            local_query, mesh=self._mesh,
            in_specs=(P(), spec3, spec3, spec3),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(sharded)

    def __call__(
        self, queries: Array, k: Optional[int] = None
    ) -> Tuple[Array, Array]:
        k = k if k is not None else self._k
        if self._candidates is None:
            raise ValueError(
                "The `index` method must be called first to "
                "create the retrieval index."
            )
        if self.query_fn is not None:
            queries = self.query_fn(queries)
        k = min(k, self._num_candidates, self._buckets)
        if k not in self._fns:
            self._fns[k] = self._make_fn(k)
        if self._scales is None:
            scores, rows = self._fns[k](
                queries, self._candidates, self._valid
            )
        else:
            scores, rows = self._fns[k](
                queries, self._candidates, self._scales, self._valid
            )
        if self._identifiers is not None:
            return scores, jnp.take(self._identifiers, rows)
        return self._decode(scores, rows)

    def is_exact(self) -> bool:
        return False


def _pad_block_sentinel(arr: Array, s: int, fill) -> Array:
    """`[s·l, ...] → [s·(l+1), ...]`: appends one `fill` block per
    shard. The sentinel is an all-invalid leaf every shard parks its
    FOREIGN probes on — its rows are -1, so the bucketed fold and the
    validity masks drop it exactly, and because it is the largest local
    index, ascending-sorted probe lists make all sentinel entries
    adjacent (the Pallas pipeline then streams the block once)."""
    l = arr.shape[0] // s
    a = arr.reshape((s, l) + arr.shape[1:])
    pad = jnp.full((s, 1) + arr.shape[1:], fill, arr.dtype)
    return jnp.concatenate([a, pad], axis=1).reshape(
        (s * (l + 1),) + arr.shape[1:]
    )


class ShardedScaNN(layers_ftk.TopK):
    """ScaNN-style probed serving with leaves sharded over the mesh.

    Wraps a configured `layers.approximate.ScaNN`: `index()` runs its
    normal (device or host) build, then re-shards the leaf blocks over
    `mesh[axis]` with centroids replicated (`index_streamed` builds the
    shards in place — see its docstring). Queries run SPMD: every shard
    derives the same global top-P probe list from the replicated
    centroids, scores the probed leaves it owns (foreign probes park on
    a per-shard all-invalid sentinel leaf), and the global top-k is an
    `all_gather + re-top-k`. SOAR-built indexes deduplicate globally
    AFTER the gather (a row's primary and secondary copies may live on
    different shards).

    The inner index's full production configuration shards:
      - `scoring_buckets`/`probe_tile`: each shard runs the probed
        bucketed-argmax fold over the leaves it owns — scores partition
        exactly across shards, and each shard folds into its OWN bucket
        state, so sharding never lowers bucket recall (effective width
        is devices × buckets, as with `ShardedBucketed`).
      - `num_reordering_candidates`: the exact reorder corpus is
        ROW-sharded over the same axis; the globally re-top-k'd
        shortlist is re-scored by whichever shard owns each row and
        combined with a `pmax` (each row is owned exactly once, so the
        result equals the single-device reorder bit for bit).

    `num_leaves` must divide evenly by the axis size.

    Attributes:
      scann: The configured (unbuilt) single-device index to build and
        shard. Its `k`, `query_fn`, probing, quantization, bucketed
        scoring, reorder, and SOAR settings all apply.
      mesh: Device mesh; defaults to all devices on one `axis`.
      axis: Mesh axis name sharding the leaves (and, with reorder, the
        corpus rows).
    """

    def __init__(
        self,
        scann,
        mesh: Optional[Mesh] = None,
        axis: str = mesh_lib.MODEL_AXIS,
    ) -> None:
        from recommenders_tpu.layers import approximate

        if not isinstance(scann, approximate.ScaNN):
            raise ValueError(
                f"scann must be a layers.approximate.ScaNN; got "
                f"{type(scann).__name__}."
            )
        super().__init__(k=scann.k)
        self._scann = scann
        if mesh is None:
            mesh = mesh_lib.create_mesh(
                shape=(jax.device_count(),), axis_names=(axis,)
            )
        self._mesh = mesh
        self._axis = axis
        self._built = False
        self._fns = {}

    @property
    def query_fn(self):
        return self._scann.query_fn

    def index(
        self,
        candidates: Array,
        identifiers: Optional[Array] = None,
    ) -> "ShardedScaNN":
        inner = self._scann
        # A host corpus past one device's build budget would OOM the
        # default device in the inner single-device build — exactly the
        # scale sharding exists for. Delegate to the streamed sharded
        # build (leaf storage goes straight to owning devices); SOAR
        # cannot stream, so refuse it with a pointer instead of OOMing.
        if self._mesh.shape[self._axis] > 1:
            host, n_rows = _host_corpus_rows(
                candidates, SINGLE_DEVICE_BUILD_BUDGET_BYTES
            )
            if host is not None:
                if inner._soar_lambda is not None:
                    raise ValueError(
                        "This corpus exceeds the single-device build "
                        "budget and soar_lambda is set: the eager build "
                        "would materialize the full corpus on one device "
                        "and the streamed build does not support SOAR. "
                        "Drop soar_lambda (use kmeans_balance_fraction "
                        "for recall — see docs/PARITY.md) and build via "
                        "index_streamed, or shrink the corpus."
                    )
                return self.index_streamed(
                    _batched(host), n_rows, identifiers=identifiers
                )
        identifiers = self._intern_identifiers(
            identifiers, np.shape(candidates)[0]
        )
        inner.index(candidates, identifiers)
        s = self._mesh.shape[self._axis]
        num_leaves = inner._centroids.shape[0]
        if num_leaves % s != 0:
            raise ValueError(
                f"num_leaves ({num_leaves}) must divide evenly over the "
                f"{s}-way '{self._axis}' axis."
            )
        leaf_sharding = NamedSharding(self._mesh, P(self._axis))
        rep = NamedSharding(self._mesh, P())
        sent = lambda arr, fill: _pad_block_sentinel(arr, s, fill)  # noqa: E731
        self._centroids = jax.device_put(inner._centroids, rep)
        self._leaf_embs = jax.device_put(
            sent(inner._leaf_embs, 0), leaf_sharding
        )
        self._leaf_scales = (
            None if inner._leaf_scales is None
            else jax.device_put(sent(inner._leaf_scales, 0), leaf_sharding)
        )
        self._leaf_ids = jax.device_put(
            sent(inner._leaf_ids, 0), leaf_sharding
        )
        self._leaf_rows = jax.device_put(
            sent(inner._leaf_rows, -1), leaf_sharding
        )
        self._leaf_valid = jax.device_put(
            sent(inner._leaf_valid, False), leaf_sharding
        )
        n = inner._num_candidates
        # Replicated [N] id table for the bucketed and reorder paths
        # (which carry global ROWS, not per-leaf gathers). None when the
        # caller gave no identifiers — rows then double as ids.
        self._global_ids = (
            None if identifiers is None
            else jax.device_put(jnp.asarray(identifiers), rep)
        )
        if inner._reorder_n:
            # Row-shard the exact-reorder corpus over the same axis.
            rps = -(-n // s)
            corpus = jnp.pad(inner._corpus, ((0, s * rps - n), (0, 0)))
            self._corpus = jax.device_put(
                corpus, NamedSharding(self._mesh, P(self._axis))
            )
            self._corpus_rps = rps
            inner._corpus = None
            inner._identifiers = None
        else:
            self._corpus = None
        self._num_leaves = num_leaves
        self._num_candidates = n
        # The single-device leaf blocks are superseded by the sharded
        # copies; drop them so the unsharded placement does not pin HBM.
        inner._leaf_embs = inner._leaf_scales = None
        inner._leaf_ids = inner._leaf_rows = inner._leaf_valid = None
        inner._flat_ids = None
        inner._built = False
        self._built = True
        self._fns = {}
        return self

    def index_streamed(
        self,
        batches,
        num_rows: int,
        identifiers: Optional[Array] = None,
    ) -> "ShardedScaNN":
        """Streamed SHARDED partitioned build: leaf storage goes
        straight to the owning devices, so probed ANN serving reaches
        corpora no SINGLE device could even hold in quantized form.

        Follows the three passes of `ScaNN.index_streamed`
        (`layers/approximate.py`): sample→k-means and top-R assignment
        run on the default device over bounded state (the 2²¹-row
        k-means sample and an `[N, R]` int32 choices buffer — at d=128,
        R=4 that is 32× smaller than the f32 corpus, the binding term of
        the build's single-device footprint); the scatter pass then
        broadcasts each batch to every shard device, which quantizes it
        locally and scatters ONLY the rows whose leaves it owns
        (foreign rows mask to a dropped sentinel leaf). Per-device leaf
        memory is `num_leaves/S × capacity`, so capacity scales with
        slice size: S chips × 16 GB HBM of int8 leaves.

        Same SOAR restriction as the single-device streamed build
        (doubling leaf memory defeats streaming), plus
        `num_leaves % S == 0`. Unlike the single-device streamed build,
        `num_reordering_candidates` IS supported: the exact-reorder
        corpus is row-sharded across the slice during the scatter pass
        (each row block goes straight to its range owner), so the
        probe→reorder cascade works at corpus sizes where no single
        device could hold the reorder corpus.

        Args:
          batches: Zero-arg callable returning an iterator of `[b, D]`
            row blocks in corpus order, or a list of blocks. Uniform
            batch sizes avoid per-shape recompiles.
          num_rows: Total corpus rows (must match the stream).
          identifiers: Optional `[num_rows]` id array (scattered into
            per-shard `[L/S, cap]` blocks; omit at extreme scale to let
            global row indices serve as ids).
        """
        from recommenders_tpu.layers import approximate

        inner = self._scann
        identifiers = self._intern_identifiers(identifiers, num_rows)
        if inner._soar_lambda is not None:
            raise ValueError(
                "index_streamed does not support soar_lambda (SOAR "
                "doubles leaf memory; the streamed build exists because "
                "memory is the binding constraint)."
            )
        if callable(batches):
            factory = batches
        else:
            blocks = list(batches)
            factory = lambda: iter(blocks)  # noqa: E731
        identifiers_h = None
        if identifiers is not None:
            identifiers_h = np.asarray(identifiers)
            if identifiers_h.shape[0] != num_rows:
                raise ValueError(
                    f"identifiers rows ({identifiers_h.shape[0]}) != "
                    f"num_rows ({num_rows})."
                )
        devs = _shard_devices(self._mesh, self._axis)
        s = len(devs)
        num_leaves = min(inner._num_leaves, num_rows)
        if num_leaves % s != 0:
            raise ValueError(
                f"num_leaves ({num_leaves}) must divide evenly over the "
                f"{s}-way '{self._axis}' axis."
            )
        l_local = num_leaves // s
        capacity = inner._capacity(num_leaves, num_rows)
        packed4 = inner._quantize == "int4"

        # Pass 1: stride-sample rows for centroid training (bounded:
        # kmeans_sample_size × d on the default device).
        sample_target = min(inner._kmeans_sample or (1 << 21), num_rows)
        rng = np.random.RandomState(inner._seed)
        parts = []
        seen = 0
        for batch in factory():
            batch = jnp.asarray(batch)
            b = batch.shape[0]
            take = min(b, int(np.ceil(sample_target * b / num_rows)))
            if take:
                idx = np.sort(rng.choice(b, size=take, replace=False))
                parts.append(batch[jnp.asarray(idx)])
            seen += b
        if seen != num_rows:
            raise ValueError(
                f"Batches supplied {seen} rows, expected num_rows="
                f"{num_rows}."
            )
        sample = jnp.concatenate(parts, axis=0).astype(jnp.float32)
        del parts
        centroids = approximate.kmeans_device(
            sample, num_leaves, inner._iterations, inner._seed,
            chunk=inner._assign_chunk,
        )
        del sample

        # Pass 2: top-R assignment + bounded-capacity packing on the
        # default device; assignment maps stage on host.
        rounds = min(inner._spill_rounds, num_leaves)
        choices = jnp.zeros((num_rows, rounds), jnp.int32)
        off = 0
        for batch in factory():
            batch = jnp.asarray(batch).astype(jnp.float32)
            ch = approximate._topr_assign_device(
                batch, centroids, rounds, inner._assign_chunk
            )
            choices = layers_ftk._write_rows(choices, ch, off)
            off += batch.shape[0]
        leaf_of, slot_of, unplaced = approximate._pack_assign_device(
            choices, num_leaves, capacity
        )
        if int(unplaced) > 0:
            raise ValueError(
                f"{int(unplaced)} rows could not be placed within their "
                f"{rounds} nearest leaves; increase `leaf_capacity`, "
                "`num_leaves`, or `spill_rounds`."
            )
        leaf_of_h = np.asarray(leaf_of)
        slot_of_h = np.asarray(slot_of)
        del choices, leaf_of, slot_of

        # Pass 3: broadcast each batch; every shard quantizes locally
        # and scatters the rows of leaves it owns (foreign rows map past
        # the sentinel block and drop). Build-time compute is S× one
        # device's, but the batch transfer would dominate either way and
        # the scatter runs fully parallel across the slice. Each shard
        # stores l_local + 1 blocks: the last is the all-invalid
        # SENTINEL leaf foreign probes park on at query time
        # (`_pad_block_sentinel`) — rows stay -1, embs/scales stay zero.
        d = centroids.shape[1]
        stored_l = l_local + 1
        rows_bufs = [
            _full_on((stored_l, capacity), -1, jnp.int32, dev)
            for dev in devs
        ]
        valid_bufs = [
            _zeros_on((stored_l, capacity), jnp.bool_, dev) for dev in devs
        ]
        if inner._quantize:
            bits = 4 if packed4 else 8
            code_cap = capacity // 2 if packed4 else capacity
            embs_bufs = [
                _zeros_on((stored_l, code_cap, d), jnp.int8, dev)
                for dev in devs
            ]
            scales_bufs = [
                _zeros_on((stored_l, capacity), jnp.float32, dev)
                for dev in devs
            ]
        else:
            embs_bufs = [
                _zeros_on((stored_l, capacity, d), inner._leaf_dtype, dev)
                for dev in devs
            ]
            scales_bufs = None
        ids_bufs = (
            None if identifiers_h is None
            else [
                _zeros_on(
                    (stored_l, capacity), jnp.asarray(identifiers_h).dtype,
                    dev,
                )
                for dev in devs
            ]
        )
        # Reorder corpus: row-sharded by contiguous ranges (independent
        # of leaf ownership — the reorder gather masks by row range).
        reorder = bool(inner._reorder_n)
        if reorder:
            rps_r = -(-num_rows // s)
            corpus_bufs = [
                _zeros_on((rps_r, d), inner._reorder_dtype, dev)
                for dev in devs
            ]
        off = 0
        for batch in factory():
            if not hasattr(batch, "ndim"):
                batch = np.asarray(batch)
            b = batch.shape[0]
            leaf_b = leaf_of_h[off:off + b]
            slot_b = slot_of_h[off:off + b].astype(np.int32)
            for i, dev in enumerate(devs):
                lp = leaf_b - i * l_local
                # Foreign rows map BEYOND the sentinel block (which must
                # stay empty) and drop out of bounds.
                lp = np.where(
                    (lp >= 0) & (lp < l_local), lp, stored_l
                ).astype(np.int32)
                batch_d = jax.device_put(batch, dev).astype(jnp.float32)
                leaf_d = jax.device_put(lp, dev)
                slot_d = jax.device_put(slot_b, dev)
                if inner._quantize:
                    (embs_bufs[i], scales_bufs[i], rows_bufs[i],
                     valid_bufs[i]) = approximate._scatter_batch_quantized(
                        embs_bufs[i], scales_bufs[i], rows_bufs[i],
                        valid_bufs[i], batch_d, leaf_d, slot_d,
                        jnp.int32(off),
                        threshold=inner._anisotropic_threshold,
                        bits=bits, half=capacity // 2,
                    )
                else:
                    embs_bufs[i], rows_bufs[i], valid_bufs[i] = (
                        approximate._scatter_batch(
                            embs_bufs[i], rows_bufs[i], valid_bufs[i],
                            batch_d, leaf_d, slot_d, jnp.int32(off),
                        )
                    )
                if ids_bufs is not None:
                    ids_d = jax.device_put(
                        identifiers_h[off:off + b], dev
                    )
                    ids_bufs[i] = _scatter_ids(
                        ids_bufs[i], ids_d, leaf_d, slot_d
                    )
            if reorder:
                pos = 0
                while pos < b:
                    shard = (off + pos) // rps_r
                    local = (off + pos) % rps_r
                    take = min(b - pos, rps_r - local)
                    piece = jax.device_put(
                        batch[pos:pos + take], devs[shard]
                    ).astype(inner._reorder_dtype)
                    corpus_bufs[shard] = layers_ftk._write_rows(
                        corpus_bufs[shard], piece, local
                    )
                    pos += take
            off += b

        rep = NamedSharding(self._mesh, P())
        self._centroids = jax.device_put(centroids, rep)
        self._leaf_embs = _assemble_sharded(
            self._mesh, self._axis, embs_bufs
        )
        self._leaf_scales = (
            None if scales_bufs is None
            else _assemble_sharded(self._mesh, self._axis, scales_bufs)
        )
        self._leaf_rows = _assemble_sharded(
            self._mesh, self._axis, rows_bufs
        )
        self._leaf_valid = _assemble_sharded(
            self._mesh, self._axis, valid_bufs
        )
        self._leaf_ids = (
            self._leaf_rows if ids_bufs is None
            else _assemble_sharded(self._mesh, self._axis, ids_bufs)
        )
        self._global_ids = (
            None if identifiers_h is None
            else jax.device_put(jnp.asarray(identifiers_h), rep)
        )
        if reorder:
            self._corpus = _assemble_sharded(
                self._mesh, self._axis, corpus_bufs
            )
            self._corpus_rps = rps_r
        else:
            self._corpus = None
        self._num_leaves = num_leaves
        self._num_candidates = num_rows
        inner._num_candidates = num_rows
        self._built = True
        self._fns = {}
        return self

    def _make_fn(self, k: int):
        from recommenders_tpu.layers import approximate
        from recommenders_tpu.ops import leaf_scoring

        inner = self._scann
        axis = self._axis
        s = self._mesh.shape[self._axis]
        l_local = self._num_leaves // s
        num_probes = min(inner._num_probes, self._num_leaves)
        quantized = inner._quantize
        packed4 = quantized == "int4"
        dedup = inner._soar_lambda is not None
        reorder_n = inner._reorder_n
        shortlist = max(k, reorder_n) if reorder_n else k
        bucketed = inner._scoring_buckets is not None
        tile = inner._probe_tile if bucketed else 1
        cap_store = self._leaf_embs.shape[1]
        cap_logical = cap_store * (2 if packed4 else 1)
        d = self._centroids.shape[1]
        use_kernel = (
            jax.default_backend() != "cpu"
            and d % 128 == 0
            and cap_store % 128 == 0
        )
        rps = getattr(self, "_corpus_rps", None)

        def local_query(queries, a):
            cscores = queries @ a["centroids"].T     # [Q, L] (replicated)
            lo = jax.lax.axis_index(axis) * l_local
            q = queries.shape[0]
            if bucketed:
                buckets = min(inner._scoring_buckets, cap_logical)
                # Identical probe construction on every shard
                # (replicated centroids), so per-shard scores partition
                # the unsharded kernel's exactly.
                q_t, probes, inv = approximate._tile_probes(
                    queries, cscores, num_probes, tile
                )
                lp = probes - lo
                # Foreign probes park on the sentinel leaf (the largest
                # local index, all rows -1 ⇒ folds to nothing);
                # ascending sort makes sentinel entries adjacent, so
                # the pipeline streams that block once. Probe order
                # within a tile is irrelevant to the running max.
                lp = jnp.sort(
                    jnp.where((lp >= 0) & (lp < l_local), lp, l_local),
                    axis=1,
                )
                if use_kernel:
                    vals, rows = leaf_scoring.probed_bucketed_scores(
                        q_t, a["embs"], a.get("scales"), a["rows"], lp,
                        buckets, query_tile=tile, packed4=packed4,
                    )
                else:
                    vals, rows = leaf_scoring.probed_bucketed_reference(
                        q_t, a["embs"], a.get("scales"), a["rows"], lp,
                        buckets, query_tile=tile, packed4=packed4,
                    )
                if inv is not None:
                    vals, rows = vals[inv], rows[inv]
                fetch = min(
                    2 * shortlist if dedup else shortlist, buckets
                )
                ls, idx = jax.lax.top_k(vals, fetch)
                lr = jnp.take_along_axis(rows, idx, axis=1)
                li = (
                    lr if "gids" not in a
                    else a["gids"][jnp.maximum(lr, 0)]
                )
            else:
                _, probes = jax.lax.top_k(cscores, num_probes)
                probes = probes.astype(jnp.int32)
                lp = probes - lo
                # Foreign probes hit the sentinel leaf, whose validity
                # is all-False — one mask covers both padding slots and
                # foreign leaves.
                lpc = jnp.where(
                    (lp >= 0) & (lp < l_local), lp, l_local
                )
                sc = a.get("scales")
                if use_kernel:
                    scores = leaf_scoring.probed_leaf_scores(
                        queries, a["embs"], sc, lpc, packed4=packed4
                    )
                else:
                    scores = leaf_scoring.probed_scores_reference(
                        queries, a["embs"], sc, lpc, packed4=packed4
                    )
                ok = a["valid"][lpc]                 # [Q, P, cap]
                scores = jnp.where(ok.reshape(q, -1), scores, MIN_FLOAT)
                flat_ids = a["ids"][lpc].reshape(q, -1)
                flat_rows = a["rows"][lpc].reshape(q, -1)
                fetch = min(
                    2 * shortlist if dedup else shortlist,
                    scores.shape[1],
                )
                ls, idx = jax.lax.top_k(scores, fetch)
                li = jnp.take_along_axis(flat_ids, idx, axis=1)
                lr = jnp.take_along_axis(flat_rows, idx, axis=1)
            gs = jax.lax.all_gather(ls, axis, axis=1, tiled=True)
            gi = jax.lax.all_gather(li, axis, axis=1, tiled=True)
            gr = jax.lax.all_gather(lr, axis, axis=1, tiled=True)
            if dedup:
                # Global dedup: a SOAR row's two copies may come from
                # different shards. Each shard fetched 2·shortlist, so
                # `shortlist` unique survivors are guaranteed.
                ts, ti, tr = approximate._dedup_topk(
                    gs, gi, gr, shortlist
                )
            else:
                w = min(shortlist, gs.shape[1])
                ts, idx2 = jax.lax.top_k(gs, w)
                ti = jnp.take_along_axis(gi, idx2, axis=1)
                tr = jnp.take_along_axis(gr, idx2, axis=1)
            if reorder_n:
                # Exact reorder over the ROW-sharded corpus: the
                # globally re-top-k'd shortlist is replicated; each row
                # is re-scored by the one shard owning it and combined
                # with pmax — bit-identical to the single-device
                # `_reorder` (same einsum shape and dtypes per row).
                my0 = jax.lax.axis_index(axis) * rps
                lr2 = tr - my0
                mine = (lr2 >= 0) & (lr2 < rps) & (ts > MIN_FLOAT / 2)
                gathered = a["corpus"][jnp.clip(lr2, 0, rps - 1)]
                exact = jnp.einsum(
                    "qd,qrd->qr", queries, gathered,
                    preferred_element_type=jnp.float32,
                )
                exact = jnp.where(mine, exact, MIN_FLOAT)
                exact = jax.lax.pmax(exact, axis)
                kk = min(k, exact.shape[1])
                ts, idx3 = jax.lax.top_k(exact, kk)
                return ts, jnp.take_along_axis(ti, idx3, axis=1)
            kk = min(k, ts.shape[1])
            return ts[:, :kk], ti[:, :kk]

        leaf = P(self._axis)
        spec = {
            "centroids": P(), "embs": leaf, "ids": leaf, "rows": leaf,
            "valid": leaf,
        }
        if self._leaf_scales is not None:
            spec["scales"] = leaf
        if bucketed and self._global_ids is not None:
            spec["gids"] = P()
        if reorder_n:
            spec["corpus"] = leaf
        sharded = jax.shard_map(
            local_query, mesh=self._mesh,
            in_specs=(P(), spec),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(sharded)

    def __call__(
        self, queries: Array, k: Optional[int] = None
    ) -> Tuple[Array, Array]:
        if not self._built:
            raise ValueError(
                "The `index` method must be called first to "
                "create the retrieval index."
            )
        k = k if k is not None else self._k
        inner = self._scann
        if self.query_fn is not None:
            queries = self.query_fn(queries)
        k = min(k, self._num_candidates)
        if k not in self._fns:
            self._fns[k] = self._make_fn(k)
        args = {
            "centroids": self._centroids, "embs": self._leaf_embs,
            "ids": self._leaf_ids, "rows": self._leaf_rows,
            "valid": self._leaf_valid,
        }
        if self._leaf_scales is not None:
            args["scales"] = self._leaf_scales
        bucketed = inner._scoring_buckets is not None
        if bucketed and self._global_ids is not None:
            args["gids"] = self._global_ids
        if inner._reorder_n:
            args["corpus"] = self._corpus
        qn = queries.shape[0]
        tile = inner._probe_tile if bucketed else 1
        pad = (-qn) % tile
        if pad:
            queries = jnp.pad(queries, ((0, pad), (0, 0)))
        scores, ids = self._fns[k](queries, args)
        if pad:
            scores, ids = scores[:qn], ids[:qn]
        return self._decode(scores, ids)

    def is_exact(self) -> bool:
        return False
