"""Retrieval index layers: exact brute-force, streaming, and sharded top-K.

TPU-native rebuild of the reference's factorized top-K layers
(`tensorflow_recommenders/layers/factorized_top_k.py:140,336,515,613`):

  - `BruteForce`: corpus resident on device; one `[q, n]` matmul on the MXU
    plus `lax.top_k`. Corpus rows are padded to a lane multiple (128) so the
    matmul tiles cleanly.
  - `Streaming`: corpus streamed through a device-side `lax.scan` with a
    running top-k merge (replacing the reference's host-bound tf.data
    map/reduce, layers/factorized_top_k.py:496-507). Also accepts host
    iterables of chunks for corpora larger than device memory.
  - `ScaNN` lives in `recommenders_tpu.layers.approximate` (an
    on-device partitioned + quantized approximate index) and is re-exported
    here for API parity.

Identifiers may be integer arrays (device-resident end to end) or host
STRING arrays (parity with the reference's `tf.string` index surface):
JAX has no string tensors, so string-identified indexes run on row
positions device-side and decode results back to strings on the host —
returned ids are then a NumPy string array. See the `TopK` docstring.
"""

from __future__ import annotations

import abc
import functools
from typing import Callable, Iterable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from recommenders_tpu.ops import topk as topk_ops

Array = jax.Array

MIN_FLOAT = topk_ops.MIN_FLOAT

# Pad corpora to a multiple of the TPU lane width so the scoring matmul and
# top-k tile cleanly onto the MXU/VPU.
_PAD_MULTIPLE = 128


def _is_string_array(identifiers) -> bool:
    """True for host arrays/sequences of str/bytes identifiers."""
    if identifiers is None or isinstance(identifiers, jax.Array):
        return False
    arr = np.asarray(identifiers)
    return arr.dtype.kind in ("U", "S", "O")


class TopK(abc.ABC):
    """Interface for top-K retrieval layers.

    Mirrors the reference's `TopK` contract
    (layers/factorized_top_k.py:140-301): `index` builds the index, calling
    the layer queries it, `query_with_exclusions` over-fetches and masks,
    `is_exact` reports whether scores are exact.

    String identifiers (parity with the reference's `tf.string` index
    surface, exercised by its oracle grid at
    layers/factorized_top_k_test.py:36,185-193): JAX has no string
    tensors, so `index`/`index_from_dataset` accept host string arrays
    and keep them HOST-side — the device index runs on row positions,
    and query results decode back to the indexed strings on fetch
    (returned ids are then a NumPy string array, not a `jax.Array`).
    `query_with_exclusions` accepts string exclusions and encodes them
    before the device mask. Exports persist the table next to the
    module (`utils/export.py` `identifiers.json`) so native-host
    callers can decode row results the same way.
    """

    def __init__(self, k: int = 10) -> None:
        self._k = k
        self._id_strings: Optional[np.ndarray] = None
        self._id_lookup = None
        self._suppress_decode = False

    # --- Host-side string identifier support ------------------------------

    def _intern_identifiers(self, identifiers, num_rows: int):
        """Stores string identifiers host-side; returns the identifier
        array the DEVICE index should use (None → row positions)."""
        self._id_lookup = None
        if _is_string_array(identifiers):
            arr = np.asarray(identifiers)
            if arr.ndim != 1 or arr.shape[0] != num_rows:
                raise ValueError(
                    f"identifiers must be a [num_rows] vector; got shape "
                    f"{arr.shape} for {num_rows} rows."
                )
            self._id_strings = arr
            return None
        self._id_strings = None
        return identifiers

    def _decode(self, scores, rows):
        """Maps row-position results back to string identifiers (host).
        Identity when the index was built with numeric (or no)
        identifiers."""
        if self._id_strings is None or self._suppress_decode:
            return scores, rows
        return scores, np.take(
            self._id_strings, np.asarray(rows), axis=0, mode="clip"
        )

    def _encode_ids(self, ids) -> Array:
        """String identifiers → row positions (-1 for unknown, which
        matches no candidate row)."""
        if self._id_lookup is None:
            self._id_lookup = {
                s: i for i, s in enumerate(self._id_strings.tolist())
            }
        table = self._id_lookup
        flat = np.asarray(
            [table.get(s, -1) for s in np.asarray(ids).reshape(-1).tolist()],
            dtype=np.int32,
        )
        return jnp.asarray(flat.reshape(np.asarray(ids).shape))

    @property
    def k(self) -> int:
        return self._k

    @abc.abstractmethod
    def index(
        self,
        candidates: Array,
        identifiers: Optional[Array] = None,
    ) -> "TopK":
        """Builds (or rebuilds) the retrieval index. Returns self."""

    def index_from_dataset(
        self,
        candidates: Iterable[Union[Array, Tuple[Array, Array]]],
    ) -> "TopK":
        """Builds the index from an iterable of embedding batches.

        Batches may be plain embedding arrays or `(identifiers, embeddings)`
        tuples, exactly like the reference
        (layers/factorized_top_k.py:179-215). Everything is concatenated on
        host and handed to `index`.
        """
        batches = list(candidates)
        if not batches:
            raise ValueError("The candidates iterable must not be empty.")
        if isinstance(batches[0], tuple):
            if any(not isinstance(b, tuple) or len(b) != 2 for b in batches):
                raise ValueError(
                    "The dataset must consistently yield candidate "
                    "embeddings or (identifiers, embeddings) tuples."
                )
            id_batches = [i for i, _ in batches]
            if any(_is_string_array(i) for i in id_batches):
                # String ids concatenate on host (no string tensors).
                identifiers = np.concatenate(
                    [np.asarray(i) for i in id_batches], axis=0
                )
            else:
                identifiers = jnp.concatenate(id_batches, axis=0)
            embeddings = jnp.concatenate([e for _, e in batches], axis=0)
            return self.index(embeddings, identifiers)
        embeddings = jnp.concatenate(list(batches), axis=0)
        return self.index(embeddings, None)

    @abc.abstractmethod
    def __call__(
        self, queries: Array, k: Optional[int] = None
    ) -> Tuple[Array, Array]:
        """Queries the index: returns `([q, k] scores, [q, k] ids)`."""

    def query_with_exclusions(
        self,
        queries: Array,
        exclusions: Array,
        k: Optional[int] = None,
    ) -> Tuple[Array, Array]:
        """Queries the index, excluding the given identifiers per row.

        Over-fetches `k + exclusions.shape[1]` candidates then drops the
        excluded ones (reference: layers/factorized_top_k.py:242-288).
        String-identifier indexes accept string exclusions (encoded to
        row positions before the device mask).
        """
        exclusions = np.asarray(exclusions) if _is_string_array(
            exclusions
        ) else exclusions
        k = k if k is not None else self._k
        adjusted_k = k + exclusions.shape[1]
        if self._id_strings is not None or _is_string_array(exclusions):
            # Query FIRST with decode suppressed: a host-streamed
            # dataset index discovers its string id table during the
            # stream, so string exclusions can only encode afterwards.
            self._suppress_decode = True
            try:
                scores, rows = self(queries, k=adjusted_k)
            finally:
                self._suppress_decode = False
            if _is_string_array(exclusions):
                if self._id_strings is None:
                    raise ValueError(
                        "String exclusions require a string-identified "
                        "index (none was built)."
                    )
                excl_rows = self._encode_ids(exclusions)
            else:
                excl_rows = jnp.asarray(exclusions)
            return self._decode(
                *topk_ops.exclude(scores, rows, excl_rows, k=k)
            )
        scores, ids = self(queries, k=adjusted_k)
        return topk_ops.exclude(scores, ids, exclusions, k=k)

    @abc.abstractmethod
    def is_exact(self) -> bool:
        """Whether the returned scores/candidates are exact."""


@functools.partial(jax.jit, static_argnames=("k",))
def _brute_force_query(
    queries: Array,
    candidates: Array,
    identifiers: Array,
    valid: Array,
    k: int,
) -> Tuple[Array, Array]:
    """One MXU matmul over the whole corpus + top-k + id gather."""
    scores = (queries @ candidates.T).astype(jnp.float32)
    scores = jnp.where(valid[None, :], scores, MIN_FLOAT)
    values, indices = jax.lax.top_k(scores, k)
    return values, jnp.take(identifiers, indices)


class BruteForce(TopK):
    """Exact brute-force retrieval with the corpus resident on device.

    Counterpart of the reference's `BruteForce`
    (layers/factorized_top_k.py:515-610), minus the Keras variable
    machinery: the index is just device arrays, and the query path is a
    single jitted function, so re-indexing never needs a function-cache
    reset (layers/factorized_top_k.py:303-318).

    Attributes:
      query_fn: Optional callable mapping raw query features to embeddings
        (the reference's `query_model`).
    """

    def __init__(
        self,
        query_fn: Optional[Callable[[Array], Array]] = None,
        k: int = 10,
    ) -> None:
        super().__init__(k=k)
        self.query_fn = query_fn
        self._candidates: Optional[Array] = None
        self._identifiers: Optional[Array] = None
        self._valid: Optional[Array] = None
        self._num_candidates = 0

    def index(
        self,
        candidates: Array,
        identifiers: Optional[Array] = None,
    ) -> "BruteForce":
        candidates = jnp.asarray(candidates)
        if candidates.ndim != 2:
            raise ValueError(
                f"The candidates tensor must be 2D (got {candidates.shape})."
            )
        identifiers = self._intern_identifiers(
            identifiers, candidates.shape[0]
        )
        if identifiers is not None:
            identifiers = jnp.asarray(identifiers)
            if candidates.shape[0] != identifiers.shape[0]:
                raise ValueError(
                    "The candidates and identifiers tensors must have the "
                    f"same number of rows (got {candidates.shape[0]} and "
                    f"{identifiers.shape[0]})."
                )
        self._num_candidates = candidates.shape[0]
        self._candidates, self._identifiers, self._valid = (
            topk_ops.pad_corpus(candidates, identifiers, _PAD_MULTIPLE)
        )
        return self

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
        k = min(k, self._num_candidates)
        return self._decode(*_brute_force_query(
            queries, self._candidates, self._identifiers, self._valid, k
        ))

    def is_exact(self) -> bool:
        return True


class Streaming(TopK):
    """Exact top-K over a corpus too large (or too dynamic) to matmul at once.

    Two operating modes, both with the running-merge semantics of the
    reference's `Streaming` (layers/factorized_top_k.py:336-512):

      - `index(...)` with in-memory arrays: the query runs as one
        `lax.scan` over corpus chunks, entirely on device
        (`recommenders_tpu.ops.topk.streaming_top_k`).
      - `index_from_dataset(factory)` with a *callable* returning an
        iterator of host batches: each batch is scored and merged with a
        jitted step while the next batch is fetched, for corpora larger
        than device memory. Batches without explicit identifiers are
        enumerated with a running counter, like the reference's
        `enumerate_rows` (layers/factorized_top_k.py:474-480).

    Attributes:
      query_fn: Optional callable mapping raw query features to embeddings.
      chunk_size: Candidate rows scored per scan step in on-device mode.
    """

    def __init__(
        self,
        query_fn: Optional[Callable[[Array], Array]] = None,
        k: int = 10,
        chunk_size: int = 4096,
    ) -> None:
        super().__init__(k=k)
        self.query_fn = query_fn
        self._chunk_size = chunk_size
        self._candidates: Optional[Array] = None
        self._identifiers: Optional[Array] = None
        self._valid: Optional[Array] = None
        self._num_candidates = 0
        self._dataset_factory = None

    def index(
        self,
        candidates: Array,
        identifiers: Optional[Array] = None,
    ) -> "Streaming":
        candidates = jnp.asarray(candidates)
        self._num_candidates = candidates.shape[0]
        identifiers = self._intern_identifiers(
            identifiers, candidates.shape[0]
        )
        chunk = min(self._chunk_size, _round_up(self._num_candidates, 128))
        self._candidates, self._identifiers, self._valid = (
            topk_ops.pad_corpus(candidates, identifiers, chunk)
        )
        self._chunk = chunk
        self._dataset_factory = None
        return self

    def index_from_dataset(self, candidates) -> "Streaming":
        """Keeps a batch-iterator factory for host-streamed querying.

        Accepts a zero-arg callable returning an iterable (so the corpus
        can be re-streamed on every query), or a list of batches.
        """
        if callable(candidates):
            self._dataset_factory = candidates
        else:
            batches = list(candidates)
            self._dataset_factory = lambda: iter(batches)
        self._candidates = None
        # String identifiers are discovered batch-by-batch during the
        # streamed query (the factory may be re-streamed each call);
        # start each stream with a clean slate.
        self._id_strings = None
        self._id_lookup = None
        return self

    def __call__(
        self, queries: Array, k: Optional[int] = None
    ) -> Tuple[Array, Array]:
        k = k if k is not None else self._k
        if self.query_fn is not None:
            queries = self.query_fn(queries)
        if self._candidates is not None:
            k = min(k, self._num_candidates)
            return self._decode(*topk_ops.streaming_top_k(
                queries,
                self._candidates,
                self._identifiers,
                self._valid,
                k=k,
                chunk_size=self._chunk,
            ))
        if self._dataset_factory is None:
            raise ValueError(
                "The `index` method must be called first to "
                "create the retrieval index."
            )
        return self._host_streamed_query(queries, k)

    def _host_streamed_query(
        self, queries: Array, k: int, prefetch: int = 2
    ) -> Tuple[Array, Array]:
        """Streams host batches with `prefetch`-deep transfer prefetch.

        Up to `prefetch` batches' host→device copies are in flight while
        the current batch's jitted score+merge executes (the
        double-buffering tf.data provides the reference's Streaming
        layer, here via async `device_put`); the merge chain itself
        keeps the device busy. Depth 2 hides the host-side staging of
        batch i+2 behind the still-running transfer of batch i+1
        (measured in `benchmarks/corpus_eval.py --overlap-demo`).
        """
        import collections

        q = queries.shape[0]
        state = None
        counter = 0
        string_parts = []

        def to_device(batch, counter):
            if isinstance(batch, tuple):
                ids, emb = batch
                if _is_string_array(ids):
                    # String ids stay host-side: the device merge runs
                    # on row positions; results decode after the
                    # stream (the factory yields a stable order).
                    string_parts.append(np.asarray(ids))
                    ids = counter + jnp.arange(
                        np.shape(emb)[0], dtype=jnp.int32
                    )
                else:
                    ids = jax.device_put(jnp.asarray(ids))
            else:
                emb = batch
                ids = counter + jnp.arange(
                    np.shape(batch)[0], dtype=jnp.int32
                )
            emb = jax.device_put(jnp.asarray(emb))
            return ids, emb

        it = iter(self._dataset_factory())
        staged = collections.deque()

        def refill():
            while len(staged) < max(1, prefetch):
                nonlocal counter
                try:
                    batch = next(it)
                except StopIteration:
                    return
                pair = to_device(batch, counter)
                counter += pair[1].shape[0]
                staged.append(pair)

        refill()
        if not staged:
            raise ValueError("The candidates dataset must not be empty.")
        while staged:
            ids, emb = staged.popleft()
            refill()
            if state is None:
                state = (
                    jnp.full((q, k), MIN_FLOAT, dtype=jnp.float32),
                    jnp.zeros((q, k), dtype=ids.dtype),
                )
            state = _streaming_merge_step(queries, emb, ids, state, k)
        if string_parts:
            strings = np.concatenate(string_parts, axis=0)
            if strings.shape[0] != counter:
                raise ValueError(
                    "The dataset mixed string and non-string identifier "
                    f"batches ({strings.shape[0]} string-identified rows "
                    f"of {counter})."
                )
            self._id_strings = strings
            self._id_lookup = None
            return self._decode(*state)
        return state

    def is_exact(self) -> bool:
        return True


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_rows(buf: Array, block: Array, off) -> Array:
    """Writes `block` into `buf` at row `off` (donated, in-place)."""
    return jax.lax.dynamic_update_slice(buf, block, (off, 0))


@functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
def _or_nibble(buf: Array, codes: Array, off, high: bool) -> Array:
    """ORs int4 `codes` into `buf` rows at `off`, as the high or low
    nibble (`ops/quantization.pack_nibbles` byte layout). Each (row,
    nibble) must be written at most once over a zero buffer."""
    cur = jax.lax.dynamic_slice(
        buf, (off, 0), (codes.shape[0], buf.shape[1])
    )
    lo, hi = codes.astype(jnp.int32), cur.astype(jnp.int32)
    if high:
        merged = (hi & 255) | (lo << 4)
    else:
        merged = hi | (lo & 15)
    return jax.lax.dynamic_update_slice(
        buf, merged.astype(jnp.int8), (off, 0)
    )


class Bucketed(TopK):
    """High-throughput serving index on the fused Pallas scoring kernel.

    Streams the corpus HBM→VMEM once per query batch with a per-bucket
    running argmax (`recommenders_tpu.ops.scoring.bucketed_top_k`) —
    the `[q, corpus]` score matrix never materializes. Returned scores are
    exact dot products; recall < 1 only from top-k items colliding in one
    bucket (≈ `1 − k²/2·buckets`), so like the reference's ScaNN layer
    this reports `is_exact() == False` and corpus evaluation must be
    id-based. On CPU backends the jnp reference implementation with
    identical bucket semantics runs instead of the kernel.

    Attributes:
      query_fn: Optional query-embedding function.
      buckets: Selection width (recall dial). Must divide `chunk`.
      chunk: Corpus rows per kernel step.
      query_tile: Query rows per kernel step (VMEM dial).
      corpus_dtype: Optional storage dtype for the indexed corpus.
        `jnp.bfloat16` halves HBM traffic and VMEM footprint — on a
        16 MB-VMEM core it makes `buckets=4096, chunk=4096,
        query_tile=128` fit (measured recall@100 ≈ 0.989 on a 1M corpus,
        vs ≈ 0.976 for the f32 default at 2048 buckets).
      quantize: `False`, `"int8"` (or `True`), or `"int4"`. Stores the
        corpus as integer codes with per-row f32 scales
        (`ops/quantization.py`) dequantized in-kernel — int8 sweeps 4×
        less HBM than f32 (2× less than bf16); int4 packs two codes
        per byte (`pack_nibbles`) for an 8× reduction and decodes with
        two bitwise ops per nibble in VMEM. Recall becomes
        quantization-limited like the ScaNN layer's (int4 noticeably
        so — pair it with reordering via the `ScaNN` layer when
        recall@100 ≳ 0.95 matters). Mutually exclusive with
        `corpus_dtype`. int4 requires `buckets` to divide `chunk/2`.
      anisotropic_quantization_threshold: Score-aware scale refinement
        for quantized indexes (ScaNN's dial of the same name); None
        uses abs-max scaling.
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
                "quantize stores integer codes; corpus_dtype must be "
                "None."
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
        self._scales: Optional[Array] = None
        self._candidates: Optional[Array] = None
        self._identifiers: Optional[Array] = None
        self._num_candidates = 0

    def index(
        self,
        candidates: Array,
        identifiers: Optional[Array] = None,
    ) -> "Bucketed":
        from recommenders_tpu.ops import scoring  # Local: optional dep.

        candidates = jnp.asarray(candidates)
        if candidates.ndim != 2:
            raise ValueError(
                f"The candidates tensor must be 2D (got {candidates.shape})."
            )
        if candidates.shape[1] % 128 != 0:
            raise ValueError(
                "Bucketed requires the embedding dim to be a multiple of "
                f"128 (the TPU lane width); got {candidates.shape[1]}. Pad "
                "the embeddings or use BruteForce."
            )
        self._num_candidates = candidates.shape[0]
        identifiers = self._intern_identifiers(
            identifiers, self._num_candidates
        )
        if identifiers is not None:
            identifiers = jnp.asarray(identifiers)
            if identifiers.shape[0] != self._num_candidates:
                raise ValueError(
                    "The candidates and identifiers tensors must have the "
                    f"same number of rows (got {self._num_candidates} and "
                    f"{identifiers.shape[0]})."
                )
        # Pad to the chunk grid AT INDEX TIME for every mode: a
        # query-time pad would copy the whole stored corpus per call
        # (and at 100M×128 int8 the 12.8 GB transient pair does not
        # even fit HBM). Padding rows are masked in-kernel via the
        # valid_rows SMEM scalar.
        if self._quantize == "int8":
            from recommenders_tpu.ops import quantization, scoring

            padded = scoring.pad_to_multiple(candidates, self._chunk)
            self._scales, candidates = quantization.quantize_rows_device(
                padded, self._anisotropic_threshold
            )
        elif self._quantize == "int4":
            from recommenders_tpu.ops import quantization, scoring

            # Nibble pairing is row c ↔ row c + padded_n/2, so the
            # stride must be baked in at index time.
            padded = scoring.pad_to_multiple(candidates, self._chunk)
            self._scales, codes = quantization.quantize_rows_device(
                padded, self._anisotropic_threshold, bits=4
            )
            candidates = quantization.pack_nibbles(codes)
        else:
            from recommenders_tpu.ops import scoring

            if self._corpus_dtype is not None:
                candidates = candidates.astype(self._corpus_dtype)
            candidates = scoring.pad_to_multiple(candidates, self._chunk)
        self._candidates = candidates
        self._identifiers = identifiers
        return self

    def index_streamed(
        self,
        batches,
        num_rows: int,
        identifiers: Optional[Array] = None,
    ) -> "Bucketed":
        """Builds the index from row batches without ever materializing
        the full-precision corpus on device.

        The streaming counterpart of `index_from_dataset` (reference
        `layers/factorized_top_k.py:179-215` concatenates on host): each
        batch is cast/quantized on device and written into the
        preallocated storage buffer, so peak device memory is the
        *stored* corpus plus one batch — with `quantize="int4"` a
        100M×128 corpus builds in ~6.4 GB where its f32 form (51 GB)
        could never exist on a single chip.

        Args:
          batches: Iterable (or zero-arg callable returning one) of
            `[b, D]` row blocks, in corpus order. Uniform batch sizes
            avoid per-shape recompiles of the write step.
          num_rows: Total corpus rows (must match the sum of batches).
          identifiers: Optional `[num_rows]` identifier array.
        """
        from recommenders_tpu.ops import quantization, scoring

        it = iter(batches() if callable(batches) else batches)
        identifiers = self._intern_identifiers(identifiers, num_rows)
        if identifiers is not None:
            identifiers = jnp.asarray(identifiers)
            if identifiers.shape[0] != num_rows:
                raise ValueError(
                    f"identifiers rows ({identifiers.shape[0]}) != "
                    f"num_rows ({num_rows})."
                )
        packed4 = self._quantize == "int4"
        # Chunk padding bakes in at build time for every mode (like
        # `index`): padding at query time would copy the stored corpus.
        stored_n = scoring._round_up(num_rows, self._chunk)
        buf = scales = None
        off = 0
        for batch in it:
            batch = jnp.asarray(batch)
            if batch.ndim != 2:
                raise ValueError(
                    f"Batches must be 2D row blocks (got {batch.shape})."
                )
            b, d = batch.shape
            if buf is None:
                if d % 128 != 0:
                    raise ValueError(
                        "Bucketed requires the embedding dim to be a "
                        f"multiple of 128; got {d}."
                    )
                if self._quantize:
                    code_rows = stored_n // 2 if packed4 else stored_n
                    buf = jnp.zeros((code_rows, d), jnp.int8)
                    scales = jnp.zeros((stored_n,), jnp.float32)
                else:
                    dtype = self._corpus_dtype or jnp.float32
                    buf = jnp.zeros((stored_n, d), dtype)
            if off + b > num_rows:
                raise ValueError(
                    f"Batches supply more than num_rows={num_rows} rows."
                )
            if self._quantize:
                bits = 4 if packed4 else 8
                s, codes = quantization.quantize_rows_device(
                    batch, self._anisotropic_threshold, bits=bits
                )
                scales = jax.lax.dynamic_update_slice(scales, s, (off,))
                if packed4:
                    half = stored_n // 2
                    # Row r lands in packed row r % half, low nibble for
                    # r < half, high nibble otherwise (`pack_nibbles`
                    # layout). A batch straddling the half boundary
                    # splits; each (row, nibble) is written once, so
                    # OR-ing into the zero-initialized buffer is exact.
                    cut = int(np.clip(half - off, 0, b))
                    if cut:
                        buf = _or_nibble(buf, codes[:cut], off, False)
                    if b - cut:
                        buf = _or_nibble(
                            buf, codes[cut:], off + cut - half, True
                        )
                else:
                    buf = _write_rows(buf, codes, off)
            else:
                buf = _write_rows(
                    buf, batch.astype(buf.dtype), off
                )
            off += b
        if buf is None:
            raise ValueError("The batches iterable must not be empty.")
        if off != num_rows:
            raise ValueError(
                f"Batches supplied {off} rows, expected num_rows="
                f"{num_rows}."
            )
        self._num_candidates = num_rows
        self._candidates = buf
        self._scales = scales
        self._identifiers = identifiers
        return self

    def __call__(
        self, queries: Array, k: Optional[int] = None
    ) -> Tuple[Array, Array]:
        from recommenders_tpu.ops import scoring

        k = k if k is not None else self._k
        if self._candidates is None:
            raise ValueError(
                "The `index` method must be called first to "
                "create the retrieval index."
            )
        if self.query_fn is not None:
            queries = self.query_fn(queries)
        k = min(k, self._num_candidates)
        if self._corpus_dtype is not None:
            queries = queries.astype(self._corpus_dtype)
        packed4 = self._quantize == "int4"
        if jax.default_backend() == "cpu":
            scores, rows = scoring.bucketed_top_k_reference(
                queries.astype(jnp.float32),
                self._candidates
                if self._quantize
                else self._candidates.astype(jnp.float32),
                k,
                buckets=self._buckets,
                scales=self._scales,
                packed4=packed4,
                valid_rows=self._num_candidates,
            )
        else:
            scores, rows = scoring.bucketed_top_k(
                queries,
                self._candidates,
                k,
                buckets=self._buckets,
                chunk=self._chunk,
                query_tile=self._query_tile,
                scales=self._scales,
                packed4=packed4,
                valid_rows=self._num_candidates,
            )
        if self._identifiers is not None:
            return scores, jnp.take(self._identifiers, rows)
        return self._decode(scores, rows)

    def is_exact(self) -> bool:
        return False


@functools.partial(jax.jit, static_argnames=("k",))
def _streaming_merge_step(queries, emb, ids, state, k):
    scores = (queries @ emb.T).astype(jnp.float32)
    kk = min(k, scores.shape[1])
    chunk_scores, idx = jax.lax.top_k(scores, kk)
    chunk_ids = jnp.take(ids, idx)
    return topk_ops.topk_merge(state, (chunk_scores, chunk_ids), k)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def __getattr__(name):
    # Lazy re-export for API parity with the reference, where ScaNN lives
    # in the same module (layers/factorized_top_k.py:613). Deferred to
    # avoid a circular import (approximate imports the TopK base here).
    if name == "ScaNN":
        from recommenders_tpu.layers import approximate

        return approximate.ScaNN
    raise AttributeError(
        f"module {__name__!r} has no attribute {name!r}"
    )
