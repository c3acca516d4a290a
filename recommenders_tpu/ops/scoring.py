"""Fused corpus-scoring kernels (Pallas/TPU) for retrieval serving.

The hot serving op is `queries [Q, D] × corpus [N, D] → top-k`, the
counterpart of the reference's BruteForce matmul+top_k and of ScaNN's C++
scorer (`tensorflow_recommenders/layers/factorized_top_k.py:586-607,
764-788`). Two device paths:

  - `exact_top_k`: XLA matmul + `lax.top_k`. XLA already tiles the matmul
    onto the MXU and fuses the partial sort; best for moderate corpora.
  - `bucketed_top_k`: a Pallas kernel that streams corpus chunks
    HBM→VMEM (auto double-buffered by the pipeline), scores a query tile
    on the MXU, and folds scores into a per-bucket running argmax held in
    VMEM — the `[Q, N]` score matrix never exists. A final exact
    `lax.top_k` over the `[Q, B]` bucket state yields the results.
    Scores are exact; recall < 1 only from top-k items colliding in one
    bucket (birthday bound ≈ `1 - k²/2B` for the top-k set — B=4096
    gives ~0.99 recall@100 on 1M candidates). This is the TPU-native
    analogue of ScaNN's approximate scoring: same speed/recall dial, no
    host round-trips.

`lax.top_k` does not lower inside Pallas TPU kernels (no Mosaic support),
which is why selection is bucketed-argmax in-kernel + exact top-k outside.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

MIN_FLOAT = np.finfo(np.float32).min / 100.0

# Lane width: bucket counts, chunk sizes, and dims pad to this.
_LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("k",))
def exact_top_k(
    queries: Array, candidates: Array, k: int, valid: Optional[Array] = None
) -> Tuple[Array, Array]:
    """Exact scoring: one `[Q, N]` MXU matmul + `lax.top_k`."""
    scores = (queries @ candidates.T).astype(jnp.float32)
    if valid is not None:
        scores = jnp.where(valid[None, :], scores, MIN_FLOAT)
    return jax.lax.top_k(scores, k)


def _bucket_kernel(
    q_ref, c_ref, vr_ref, vals_ref, ids_ref, run_vals, run_ids,
    *, chunk: int, buckets: int, num_chunks: int,
):
    """One (query-tile, corpus-chunk) grid step.

    Grid is (num_q_tiles, num_chunks) with chunks minor, so the VMEM
    running state accumulates across a full corpus sweep per query tile.
    `vr_ref` is the valid-row count as an SMEM scalar — dynamic so one
    compiled kernel serves any corpus size at a padded shape, and so the
    count may differ per shard under `shard_map` (sharded serving pads
    every shard to the same shape but only the last shard is short).
    """
    j = pl.program_id(1)
    valid_rows = vr_ref[0]

    @pl.when(j == 0)
    def _():
        run_vals[:] = jnp.full_like(run_vals, MIN_FLOAT)
        run_ids[:] = jnp.zeros_like(run_ids)

    # [TQ, C] scores on the MXU (rhs contracted on its feature dim — no
    # explicit transpose materialized).
    scores = jax.lax.dot_general(
        q_ref[:],
        c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    tq = scores.shape[0]
    base = j * chunk
    # Mask padding rows (global row id >= valid_rows) to MIN_FLOAT.
    col_ids = base + jax.lax.broadcasted_iota(jnp.int32, (tq, chunk), 1)
    scores = jnp.where(col_ids < valid_rows, scores, MIN_FLOAT)

    # Fold the chunk into per-bucket running argmax: bucket = column % B.
    for g in range(chunk // buckets):
        sub = scores[:, g * buckets:(g + 1) * buckets]
        sub_ids = col_ids[:, g * buckets:(g + 1) * buckets]
        upd = sub > run_vals[:]
        run_vals[:] = jnp.where(upd, sub, run_vals[:])
        run_ids[:] = jnp.where(upd, sub_ids, run_ids[:])

    @pl.when(j == num_chunks - 1)
    def _():
        vals_ref[:] = run_vals[:]
        ids_ref[:] = run_ids[:]


def _bucket_kernel_quantized(
    q_ref, c_ref, s_ref, vr_ref, vals_ref, ids_ref, run_vals, run_ids,
    *, chunk: int, buckets: int, num_chunks: int,
):
    """Quantized variant: int8 corpus rows, per-row f32 scales.

    For per-row scale `s_c`, `q·(s_c·v_c) = s_c·(q·v_c)` — the int8
    rows convert once in VMEM, feed the MXU, and the scale folds in as
    one multiply per output element. HBM corpus traffic is 4× less
    than f32 (1.28 GB per 10M×128 sweep). The dot runs in bf16: int8
    codes are EXACT in bf16 (|code| ≤ 127 < 2^8 significands), so only
    the query rounds (≤ 2^-8 relative — an order below the int8
    quantization error), and the MXU runs at full bf16 rate instead of
    multi-pass f32."""
    j = pl.program_id(1)
    valid_rows = vr_ref[0]

    @pl.when(j == 0)
    def _():
        run_vals[:] = jnp.full_like(run_vals, MIN_FLOAT)
        run_ids[:] = jnp.zeros_like(run_ids)

    scores = jax.lax.dot_general(
        q_ref[:].astype(jnp.bfloat16),
        c_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * s_ref[:]  # [TQ, C] * [1, C] broadcast.
    tq = scores.shape[0]
    base = j * chunk
    col_ids = base + jax.lax.broadcasted_iota(jnp.int32, (tq, chunk), 1)
    scores = jnp.where(col_ids < valid_rows, scores, MIN_FLOAT)

    for g in range(chunk // buckets):
        sub = scores[:, g * buckets:(g + 1) * buckets]
        sub_ids = col_ids[:, g * buckets:(g + 1) * buckets]
        upd = sub > run_vals[:]
        run_vals[:] = jnp.where(upd, sub, run_vals[:])
        run_ids[:] = jnp.where(upd, sub_ids, run_ids[:])

    @pl.when(j == num_chunks - 1)
    def _():
        vals_ref[:] = run_vals[:]
        ids_ref[:] = run_ids[:]


def _bucket_kernel_packed4(
    q_ref, c_ref, s_lo_ref, s_hi_ref, vr_ref, vals_ref, ids_ref,
    run_vals, run_ids,
    *, chunk: int, buckets: int, num_chunks: int, half_rows: int,
):
    """Packed-int4 variant: two 4-bit codes per byte, paired across the
    row axis at stride `half_rows` (`ops/quantization.pack_nibbles`).

    Decode is two bitwise ops per nibble in int32 (`(p<<28)>>28` sign-
    extends the low nibble, an arithmetic `>>4` the high one); each
    half feeds its own bf16 MXU dot (int4 codes are exact in bf16; only
    the query rounds, far below the int4 quantization error, and bf16
    avoids the multi-pass f32 MXU rate). The two `[TQ, chunk/2]` score tiles
    fold into the bucket state SEPARATELY (the low half covers global
    rows `[j·c/2, (j+1)·c/2)`, the high half the same range shifted by
    `half_rows`; both ranges map to buckets `lane % buckets` since
    `buckets | chunk/2` and `buckets | half_rows`) — no lane concat or
    sublane slice, which Mosaic's vector layout cannot lower. HBM sweep
    traffic is 8× less than f32, 2× less than int8."""
    j = pl.program_id(1)
    valid_rows = vr_ref[0]

    @pl.when(j == 0)
    def _():
        run_vals[:] = jnp.full_like(run_vals, MIN_FLOAT)
        run_ids[:] = jnp.zeros_like(run_ids)

    ch2 = chunk // 2
    p = c_ref[:].astype(jnp.int32)  # [ch2, D]
    lo = ((p << 28) >> 28).astype(jnp.bfloat16)
    hi = (p >> 4).astype(jnp.bfloat16)
    q = q_ref[:].astype(jnp.bfloat16)
    dims = (((1,), (1,)), ((), ()))
    tq = q.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (tq, ch2), 1)

    for half, s_half in ((lo, s_lo_ref), (hi, s_hi_ref)):
        scores = jax.lax.dot_general(
            q, half, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        ) * s_half[:]               # [TQ, ch2] · [1, ch2]
        base = j * ch2 if half is lo else half_rows + j * ch2
        col_ids = base + iota
        scores = jnp.where(col_ids < valid_rows, scores, MIN_FLOAT)
        for g in range(ch2 // buckets):
            sub = scores[:, g * buckets:(g + 1) * buckets]
            sub_ids = col_ids[:, g * buckets:(g + 1) * buckets]
            upd = sub > run_vals[:]
            run_vals[:] = jnp.where(upd, sub, run_vals[:])
            run_ids[:] = jnp.where(upd, sub_ids, run_ids[:])

    @pl.when(j == num_chunks - 1)
    def _():
        vals_ref[:] = run_vals[:]
        ids_ref[:] = run_ids[:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "buckets", "chunk", "query_tile", "interpret", "packed4",
    ),
)
def bucketed_scores(
    queries: Array,
    candidates: Array,
    scales: Optional[Array] = None,
    buckets: int = 2048,
    chunk: int = 2048,
    query_tile: int = 256,
    interpret: bool = False,
    valid_rows=None,
    packed4: bool = False,
) -> Tuple[Array, Array]:
    """Streams the corpus once; returns per-bucket `([Q, B], [Q, B])`
    max scores and their candidate row ids.

    `candidates` rows beyond the true corpus size must be zero-padded by
    the caller via `pad_to_multiple`; padding is masked in-kernel.

    `valid_rows` (int or traced int32 scalar) is the true corpus size;
    it reaches the kernel as an SMEM scalar, so one compiled kernel
    serves any corpus size at a padded shape — and the count may differ
    per shard under `shard_map` (`parallel.ann`), where a static value
    could not.

    With `packed4`, `candidates` is `[n/2, D]` int8 holding two 4-bit
    codes per byte (`ops/quantization.pack_nibbles` layout: row `c`
    pairs with row `c + n/2`), `scales` stays `[n]` in natural row
    order, and `valid_rows` is required (the logical row count cannot
    be inferred from the packed shape when padding was applied).

    VMEM budget ≈ `2·tq·B·8 + tq·C·4 + 2·C·D·4 + tq·D·4` bytes (state +
    out blocks, score tile, double-buffered chunk, query tile) — the
    defaults fit a 16 MB-VMEM core; for B=4096 drop `query_tile` to 128.
    """
    qn, d = queries.shape
    n = candidates.shape[0] * 2 if packed4 else candidates.shape[0]
    if valid_rows is None:
        if packed4:
            raise ValueError("packed4 requires explicit valid_rows")
        valid_rows = n
    vr = jnp.asarray(valid_rows, jnp.int32).reshape((1,))
    if n % chunk != 0:
        raise ValueError(f"corpus rows {n} not a multiple of chunk {chunk}")
    if chunk % buckets != 0:
        raise ValueError(
            f"chunk ({chunk}) must be a multiple of buckets ({buckets})"
        )
    if packed4 and (chunk // 2) % _LANES != 0:
        raise ValueError(
            f"packed4 needs chunk/2 to be a multiple of {_LANES} (lane-"
            f"aligned half-chunk score tiles); got chunk={chunk}"
        )
    if packed4 and (chunk // 2) % buckets != 0:
        # Bucket of global row r must stay r % buckets (the natural
        # semantics shared with the reference); with the concat'd tile
        # that holds iff buckets divides the half-chunk.
        raise ValueError(
            f"packed4 needs buckets ({buckets}) to divide chunk/2 "
            f"({chunk // 2})"
        )
    if d % _LANES != 0:
        raise ValueError(f"embedding dim {d} must be a multiple of {_LANES}")
    tq = min(query_tile, _round_up(qn, 8))
    if qn % tq != 0:
        raise ValueError(f"num queries {qn} not a multiple of tile {tq}")
    num_chunks = n // chunk
    grid = (qn // tq, num_chunks)

    quantized = scales is not None
    if packed4 and not quantized:
        raise ValueError("packed4 requires per-row scales")
    if packed4:
        kernel = functools.partial(
            _bucket_kernel_packed4,
            chunk=chunk,
            buckets=buckets,
            num_chunks=num_chunks,
            half_rows=n // 2,
        )
    else:
        kernel = functools.partial(
            _bucket_kernel_quantized if quantized else _bucket_kernel,
            chunk=chunk,
            buckets=buckets,
            num_chunks=num_chunks,
        )
    corpus_block = chunk // 2 if packed4 else chunk
    in_specs = [
        pl.BlockSpec((tq, d), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((corpus_block, d), lambda i, j: (j, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [queries, candidates]
    if quantized:
        if scales.shape[0] != n:
            raise ValueError(
                f"scales rows {scales.shape[0]} != corpus rows {n}"
            )
        if packed4:
            # Natural-order scales split at n/2: the first half scales
            # the low-nibble rows, the second the high-nibble ones.
            # Two separate refs (not one [2, n/2] block) — the kernel
            # must not sublane-slice, Mosaic cannot lower that.
            s2 = scales.astype(jnp.float32).reshape(2, n // 2)
            spec = pl.BlockSpec((1, chunk // 2), lambda i, j: (0, j),
                                memory_space=pltpu.VMEM)
            in_specs += [spec, spec]
            inputs += [s2[0:1], s2[1:2]]
        else:
            in_specs.append(
                pl.BlockSpec((1, chunk), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM)
            )
            inputs.append(scales.astype(jnp.float32)[None, :])
    in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    inputs.append(vr)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((tq, buckets), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, buckets), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((qn, buckets), jnp.float32),
            jax.ShapeDtypeStruct((qn, buckets), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tq, buckets), jnp.float32),
            pltpu.VMEM((tq, buckets), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * qn * n * d,
            bytes_accessed=candidates.size * candidates.dtype.itemsize
            + qn * d * queries.dtype.itemsize
            + 2 * qn * buckets * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*inputs)


def bucketed_top_k(
    queries: Array,
    candidates: Array,
    k: int,
    buckets: int = 2048,
    chunk: int = 2048,
    query_tile: int = 256,
    interpret: bool = False,
    scales: Optional[Array] = None,
    packed4: bool = False,
    valid_rows: Optional[int] = None,
) -> Tuple[Array, Array]:
    """Approximate top-k with exact scores via the bucketed Pallas sweep.

    Returns `([Q, k] scores, [Q, k] candidate-row ids)`, descending.
    Recall is controlled by `buckets` (see module docstring). With
    `scales`, `candidates` holds int8 per-row codes dequantized
    in-kernel (`s_c·(q·v_c)`) — 4× less HBM sweep traffic. With
    `packed4`, `candidates` holds packed 4-bit codes (`[n/2, D]`,
    `pack_nibbles` layout, already padded to a chunk multiple by the
    index build — packing bakes in the pairing stride) and
    `valid_rows` gives the true corpus size — 8× less sweep traffic.

    `valid_rows` may also be given for UNpacked corpora whose rows are
    already padded to the chunk grid (the streamed index build pre-pads
    so no corpus-sized copy happens at query time; sharded serving pads
    every shard equally) — int or traced int32 scalar.
    """
    if packed4:
        if valid_rows is None:
            raise ValueError("packed4 requires valid_rows")
        padded = candidates
        logical = candidates.shape[0] * 2
        if scales.shape[0] != logical:
            raise ValueError(
                f"scales rows {scales.shape[0]} != padded logical rows "
                f"{logical}"
            )
    else:
        if valid_rows is None:
            valid_rows = candidates.shape[0]
        padded = pad_to_multiple(candidates, chunk)
        if scales is not None:
            n = scales.shape[0]
            scales = jnp.pad(scales, (0, padded.shape[0] - n))
    qn = queries.shape[0]
    tq = min(query_tile, _round_up(qn, 8))
    padded_q = _round_up(qn, tq)
    if padded_q != qn:
        queries = jnp.pad(queries, ((0, padded_q - qn), (0, 0)))
    vals, ids = bucketed_scores(
        queries,
        padded,
        scales,
        buckets=buckets,
        chunk=chunk,
        query_tile=tq,
        interpret=interpret,
        valid_rows=valid_rows,
        packed4=packed4,
    )
    vals, ids = vals[:qn], ids[:qn]
    if isinstance(valid_rows, int):
        k = min(k, valid_rows)
    k = min(k, buckets)
    top_vals, idx = jax.lax.top_k(vals, k)
    return top_vals, jnp.take_along_axis(ids, idx, axis=1)


def bucketed_top_k_reference(
    queries: Array,
    candidates: Array,
    k: int,
    buckets: int = 2048,
    scales: Optional[Array] = None,
    packed4: bool = False,
    valid_rows: Optional[int] = None,
) -> Tuple[Array, Array]:
    """Pure-jnp oracle with identical bucket semantics (runs anywhere).

    `valid_rows` (int or traced int32 scalar) masks trailing padding
    rows to MIN_FLOAT, matching the kernel's SMEM-scalar masking.
    """
    if packed4:
        from recommenders_tpu.ops import quantization

        # Unpacking restores natural row order, so padded rows (if any)
        # are the trailing [valid_rows, n) slice — masked below like
        # plain int8 codes.
        candidates = quantization.unpack_nibbles(candidates)
        return bucketed_top_k_reference(
            queries, candidates, k, buckets=buckets, scales=scales,
            valid_rows=valid_rows,
        )
    n = candidates.shape[0]
    padded_n = _round_up(n, buckets)
    if scales is not None:
        # int8 codes: bf16 matmul (codes exact in bf16; mirrors the
        # kernel's MXU dtype) + per-row scale after the dot.
        scores = jax.lax.dot_general(
            queries.astype(jnp.bfloat16),
            candidates.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scales[None, :].astype(jnp.float32)
    else:
        scores = (queries @ candidates.T).astype(jnp.float32)
    if valid_rows is not None:
        col = jnp.arange(n, dtype=jnp.int32)[None, :]
        scores = jnp.where(
            col < jnp.asarray(valid_rows, jnp.int32), scores, MIN_FLOAT
        )
    scores = jnp.pad(
        scores, ((0, 0), (0, padded_n - n)), constant_values=MIN_FLOAT
    )
    ids = jnp.broadcast_to(
        jnp.arange(padded_n, dtype=jnp.int32), scores.shape
    )
    groups = padded_n // buckets
    gv = scores.reshape(-1, groups, buckets)
    gi = ids.reshape(-1, groups, buckets)
    best = jnp.argmax(gv, axis=1)
    bucket_vals = jnp.take_along_axis(gv, best[:, None, :], axis=1)[:, 0]
    bucket_ids = jnp.take_along_axis(gi, best[:, None, :], axis=1)[:, 0]
    if isinstance(valid_rows, int):
        k = min(k, valid_rows)
    k = min(k, min(buckets, n))
    top_vals, idx = jax.lax.top_k(bucket_vals, k)
    return top_vals, jnp.take_along_axis(bucket_ids, idx, axis=1)


def pad_to_multiple(candidates: Array, multiple: int) -> Array:
    """Zero-pads corpus rows up to a multiple (padding masked in-kernel)."""
    n = candidates.shape[0]
    padded = _round_up(n, multiple)
    if padded == n:
        return candidates
    return jnp.pad(candidates, ((0, padded - n), (0, 0)))
