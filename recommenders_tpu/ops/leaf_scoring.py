"""Pallas leaf-scoring kernels for the ScaNN-style probed search.

The naive probed search gathers `leaf_embs[probes]` into a
`[Q, P, cap, D]` tensor before scoring (17 GB at 1M×128 corpus with the
module defaults — it cannot run). Two kernels score probed leaves IN
PLACE instead, with the probe table scalar-prefetched and leaf blocks
streamed HBM→VMEM (double-buffered by the Pallas pipeline):

  - `probed_leaf_scores`: one `[1, D] × [D, cap]` dot per (query,
    probe), writing the full `[Q, P·cap]` score matrix for the caller's
    `lax.top_k`. HBM traffic is exactly the probed bytes,
    `Q·P·cap·D·itemsize`; exact scores for every probed slot.
  - `probed_bucketed_scores`: same streaming, but scores fold into
    `B` per-bucket running-argmax cells in VMEM (the `Bucketed`
    full-scan reduction of `ops/scoring.py` applied to probed leaves),
    so only `[Q, B]` scores + global row ids leave the kernel and the
    final top-k is over B columns — at large P this removes a
    `[Q, P·cap]` top-k and two same-shaped id gathers. Probes are per
    query-TILE: a sorted, probe-coherent query batch shares each leaf
    fetch across the whole tile (the pipeline elides the HBM copy when
    consecutive grid steps revisit the same block), dividing scan
    traffic by the tile width.

Per-row quantization scales fold in AFTER the dot: for per-row scale
`s_c`, `q·(s_c·v_c) = s_c·(q·v_c)`, so the integer rows go straight
into the MXU-feeding convert and one multiply per output element.

The counterpart in the reference stack is ScaNN's C++ asymmetric-hash
scorer (`tensorflow_recommenders/layers/factorized_top_k.py:688-707` →
scann `score_ah`); these are its TPU-resident equivalents.

Requirements: `D % 128 == 0`, `cap % 128 == 0` (lane/sublane tiling;
`cap % buckets == 0` for the bucketed kernel); callers fall back to the
`*_reference` twins otherwise (CPU always uses the reference path).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from recommenders_tpu.ops import topk as topk_ops

Array = jax.Array

MIN_FLOAT = topk_ops.MIN_FLOAT

_LANES = 128


def _kernel_f32(probes_ref, q_ref, leaf_ref, out_ref):
    scores = jax.lax.dot_general(
        q_ref[0],            # [1, D] (block [1, 1, D])
        leaf_ref[0],         # [cap, D]
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                        # [1, cap]
    out_ref[0] = scores


def _kernel_quantized(probes_ref, q_ref, leaf_ref, scale_ref, out_ref):
    # int8 → bf16 in VMEM: codes are exact in bf16 and the MXU runs at
    # full bf16 rate (f32 dots decompose into multiple passes); only the
    # query rounds, far below the int8 quantization error.
    e = leaf_ref[0].astype(jnp.bfloat16)  # [cap, D]
    scores = jax.lax.dot_general(
        q_ref[0].astype(jnp.bfloat16),
        e,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                        # [1, cap]
    out_ref[0] = scores * scale_ref[0]


def _decode_nibbles_scores(q, packed):
    """Shared int4 decode+score: `packed` `[cap/2, D]` int8 holding two
    4-bit codes per byte (`ops/quantization.pack_nibbles`: slot `s` in
    the low nibble, slot `s + cap/2` in the high one). Sign-extend each
    nibble in int32 (two bitwise ops), run one bf16 MXU dot per half
    (int4 codes are exact in bf16; queries round by ≤ 2^-8 relative,
    far below the int4 quantization error), and concatenate along
    lanes — natural slot order, no interleave."""
    p = packed.astype(jnp.int32)
    lo = ((p << 28) >> 28).astype(jnp.bfloat16)
    hi = (p >> 4).astype(jnp.bfloat16)
    qb = q.astype(jnp.bfloat16)
    dims = (((1,), (1,)), ((), ()))
    s_lo = jax.lax.dot_general(
        qb, lo, dimension_numbers=dims, preferred_element_type=jnp.float32
    )
    s_hi = jax.lax.dot_general(
        qb, hi, dimension_numbers=dims, preferred_element_type=jnp.float32
    )
    return jnp.concatenate([s_lo, s_hi], axis=1)  # [tq, cap]


def _kernel_quantized4(probes_ref, q_ref, leaf_ref, scale_ref, out_ref):
    scores = _decode_nibbles_scores(q_ref[0], leaf_ref[0])  # [1, cap]
    out_ref[0] = scores * scale_ref[0]


@functools.partial(jax.jit, static_argnames=("interpret", "packed4"))
def probed_leaf_scores(
    queries: Array,
    leaf_embs: Array,
    leaf_scales: Optional[Array],
    probes: Array,
    interpret: bool = False,
    packed4: bool = False,
) -> Array:
    """Scores each query against its probed leaves' rows.

    Args:
      queries: `[Q, D]` f32 (D a multiple of 128).
      leaf_embs: `[L, cap, D]` f32/bf16 or int8 (cap a multiple of 128),
        or — with `packed4` — `[L, cap/2, D]` int8 nibble-packed codes
        (`pack_nibbles` per leaf; cap/2 a multiple of 128).
      leaf_scales: `[L, cap]` f32 per-row dequantization scales, or None.
      probes: `[Q, P]` int32 leaf ids probed per query.
      interpret: Run the kernel interpreted (tests on CPU).
      packed4: Leaves hold two 4-bit codes per byte.

    Returns:
      `[Q, P·cap]` f32 scores, laid out probe-major (probe p's rows at
      `[p·cap, (p+1)·cap)`), matching
      `leaf_valid[probes].reshape(Q, -1)` masking downstream.
    """
    qn, d = queries.shape
    num_leaves, cap, d2 = leaf_embs.shape
    if packed4:
        cap = cap * 2
    assert d == d2, (d, d2)
    if d % _LANES or (cap // (2 if packed4 else 1)) % _LANES:
        raise ValueError(
            f"probed_leaf_scores needs dim and leaf capacity (cap/2 "
            f"when packed4) to be multiples of {_LANES}; got dim={d}, "
            f"cap={cap}. Use probed_scores_reference instead."
        )
    num_probes = probes.shape[1]
    grid = (qn, num_probes)

    quantized = leaf_scales is not None
    if packed4 and not quantized:
        raise ValueError("packed4 requires per-row scales")
    if packed4:
        kernel = _kernel_quantized4
    else:
        kernel = _kernel_quantized if quantized else _kernel_f32
    # Mosaic requires the last two block dims to be (8k, 128k) or equal
    # to the array dims; singleton middle axes make the size-1 blocks
    # legal ([Q, 1, D] block (1, 1, D) etc.).
    leaf_block = cap // 2 if packed4 else cap
    in_specs = [
        pl.BlockSpec((1, 1, d), lambda q, p, probes_ref: (q, 0, 0)),
        pl.BlockSpec(
            (1, leaf_block, d),
            lambda q, p, probes_ref: (probes_ref[q, p], 0, 0),
        ),
    ]
    inputs = [queries[:, None, :], leaf_embs]
    if quantized:
        in_specs.append(
            pl.BlockSpec(
                (1, 1, cap),
                lambda q, p, probes_ref: (probes_ref[q, p], 0, 0),
            )
        )
        inputs.append(leaf_scales[:, None, :])

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, 1, cap), lambda q, p, probes_ref: (q, 0, p)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (qn, 1, num_probes * cap), jnp.float32
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * qn * num_probes * cap * d,
            bytes_accessed=(
                qn * num_probes * leaf_block * d
                * leaf_embs.dtype.itemsize
                + qn * d * 4
                + qn * num_probes * cap * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(probes, *inputs)
    return out.reshape(qn, num_probes * cap)


def _fold_buckets(
    scores, rows, run_vals, run_rows, buckets: int, num_probes: int
):
    """Shared body of the bucketed probed kernels: mask invalid slots,
    fold `[tq, cap]` scores into per-bucket running argmax (bucket =
    slot % buckets) — the Bucketed full-scan reduction
    (`ops/scoring._bucket_kernel`) applied to probed leaves."""
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        run_vals[:] = jnp.full_like(run_vals, MIN_FLOAT)
        run_rows[:] = jnp.full_like(run_rows, -1)

    cap = scores.shape[1]
    scores = jnp.where(rows >= 0, scores, MIN_FLOAT)
    # Sublane-broadcast the [1, cap] row ids to [tq, cap] BEFORE any
    # lane slicing: Mosaic rejects vector.broadcast on a lane-offset
    # source ("Invalid input layout" at offset 128). A plain
    # jnp.broadcast_to is canonicalized straight through the slices
    # below (slice-of-broadcast → broadcast-of-slice), re-creating the
    # invalid op, so force materialization with the tpu repeat
    # primitive, which the folder leaves alone.
    if scores.shape[0] > 1:
        rows = pltpu.repeat(rows, scores.shape[0], 0)
    for g in range(cap // buckets):
        sub = scores[:, g * buckets:(g + 1) * buckets]
        sub_rows = rows[:, g * buckets:(g + 1) * buckets]
        upd = sub > run_vals[:]
        run_vals[:] = jnp.where(upd, sub, run_vals[:])
        run_rows[:] = jnp.where(upd, sub_rows, run_rows[:])
    # Partial tail group (cap need only be 128-aligned, not a bucket
    # multiple — padding leaves to the bucket grain would inflate scan
    # traffic): the last cap % buckets slots fold into the leading
    # buckets of the running state.
    tail = cap % buckets
    if tail:
        start = (cap // buckets) * buckets
        sub = scores[:, start:]
        sub_rows = rows[:, start:]
        upd = sub > run_vals[:, :tail]
        run_vals[:, :tail] = jnp.where(upd, sub, run_vals[:, :tail])
        run_rows[:, :tail] = jnp.where(upd, sub_rows, run_rows[:, :tail])


def _kernel_bucketed_f32(
    probes_ref, q_ref, leaf_ref, rows_ref, out_vals, out_rows,
    run_vals, run_rows, *, buckets: int, num_probes: int,
):
    scores = jax.lax.dot_general(
        q_ref[0],                           # [tq, D]
        leaf_ref[0],                        # [cap, D] (f32/bf16)
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                       # [tq, cap]
    _fold_buckets(
        scores, rows_ref[0], run_vals, run_rows, buckets, num_probes
    )

    @pl.when(pl.program_id(1) == num_probes - 1)
    def _():
        out_vals[0] = run_vals[:]
        out_rows[0] = run_rows[:]


def _kernel_bucketed_quantized(
    probes_ref, q_ref, leaf_ref, rows_ref, scale_ref, out_vals, out_rows,
    run_vals, run_rows, *, buckets: int, num_probes: int,
):
    scores = jax.lax.dot_general(
        q_ref[0].astype(jnp.bfloat16),
        leaf_ref[0].astype(jnp.bfloat16),   # int8 exact in bf16
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale_ref[0]                        # [tq, cap] · [1, cap]
    _fold_buckets(
        scores, rows_ref[0], run_vals, run_rows, buckets, num_probes
    )

    @pl.when(pl.program_id(1) == num_probes - 1)
    def _():
        out_vals[0] = run_vals[:]
        out_rows[0] = run_rows[:]


def _kernel_bucketed_quantized4(
    probes_ref, q_ref, leaf_ref, rows_ref, scale_ref, out_vals, out_rows,
    run_vals, run_rows, *, buckets: int, num_probes: int,
):
    """Nibble-packed int4 leaves: decode lo/hi halves, score each on
    the MXU, lane-concat back to natural slot order (see
    `_decode_nibbles_scores`), then the shared bucket fold."""
    scores = _decode_nibbles_scores(q_ref[0], leaf_ref[0]) * scale_ref[0]
    _fold_buckets(
        scores, rows_ref[0], run_vals, run_rows, buckets, num_probes
    )

    @pl.when(pl.program_id(1) == num_probes - 1)
    def _():
        out_vals[0] = run_vals[:]
        out_rows[0] = run_rows[:]


@functools.partial(
    jax.jit,
    static_argnames=("buckets", "query_tile", "interpret", "packed4"),
)
def probed_bucketed_scores(
    queries: Array,
    leaf_embs: Array,
    leaf_scales: Optional[Array],
    leaf_rows: Array,
    probes: Array,
    buckets: int,
    query_tile: int = 8,
    interpret: bool = False,
    packed4: bool = False,
) -> tuple:
    """Scores probed leaves with in-kernel per-bucket argmax reduction.

    Where `probed_leaf_scores` writes the full `[Q, P·cap]` score matrix
    (whose `lax.top_k` and `[Q, P·cap]` id gathers dominate at large P),
    this kernel folds every probed slot into `buckets` running argmax
    cells — the `Bucketed` full-scan trick — so only `[Q, B]` scores and
    global row ids leave VMEM and the final top-k is over `B` columns.

    Probes are per query-TILE (`probes: [Q/query_tile, P]`): all
    `query_tile` queries of a tile share one probe list, so each probed
    leaf streams HBM→VMEM once per TILE, dividing scan traffic by the
    tile width. Callers exploit it by sorting queries so tiles are
    probe-coherent (`layers/approximate.ScaNN(probe_tile=...)`);
    `query_tile=1` recovers exact per-query probing.

    Args:
      queries: `[Q, D]` f32, `Q` a multiple of `query_tile`.
      leaf_embs: `[L, cap, D]` f32/bf16 or int8 (`cap % 128 == 0`; a
        partial tail group folds into the leading buckets, so cap need
        NOT be a bucket multiple), or — with `packed4` —
        `[L, cap/2, D]` int8 nibble-packed codes (cap/2 % 128 == 0).
      leaf_scales: `[L, cap]` f32 per-row dequant scales, or None.
      leaf_rows: `[L, cap]` int32 global row per slot, -1 for padding.
      probes: `[Q // query_tile, P]` int32 leaf ids per tile.
      buckets: Reduction width `B` (multiple of 128, ≤ cap).
      query_tile: Queries per probe tile.
      interpret: Run interpreted (tests on CPU).
      packed4: Leaves hold two 4-bit codes per byte.

    Returns:
      `([Q, B] f32 scores, [Q, B] int32 global rows)`; empty buckets
      carry `MIN_FLOAT` / row -1.
    """
    qn, d = queries.shape
    num_leaves, cap, d2 = leaf_embs.shape
    if packed4:
        cap = cap * 2
    assert d == d2, (d, d2)
    tiles, num_probes = probes.shape
    tq = query_tile
    if qn != tiles * tq:
        raise ValueError(
            f"queries rows ({qn}) must equal tiles ({tiles}) × "
            f"query_tile ({tq})."
        )
    half_grain = cap // (2 if packed4 else 1)
    if d % _LANES or buckets % _LANES or half_grain % _LANES \
            or buckets > cap:
        raise ValueError(
            f"needs dim, buckets and cap (cap/2 when packed4) "
            f"% {_LANES} == 0 and buckets <= cap; got dim={d}, "
            f"buckets={buckets}, cap={cap}."
        )
    grid = (tiles, num_probes)

    quantized = leaf_scales is not None
    if packed4 and not quantized:
        raise ValueError("packed4 requires per-row scales")
    if packed4:
        base_kernel = _kernel_bucketed_quantized4
    elif quantized:
        base_kernel = _kernel_bucketed_quantized
    else:
        base_kernel = _kernel_bucketed_f32
    kernel = functools.partial(
        base_kernel,
        buckets=buckets,
        num_probes=num_probes,
    )
    leaf_block = cap // 2 if packed4 else cap
    in_specs = [
        pl.BlockSpec((1, tq, d), lambda i, p, probes_ref: (i, 0, 0)),
        pl.BlockSpec(
            (1, leaf_block, d),
            lambda i, p, probes_ref: (probes_ref[i, p], 0, 0),
        ),
        pl.BlockSpec(
            (1, 1, cap),
            lambda i, p, probes_ref: (probes_ref[i, p], 0, 0),
        ),
    ]
    inputs = [
        queries.reshape(tiles, tq, d),
        leaf_embs,
        leaf_rows[:, None, :],
    ]
    if quantized:
        in_specs.append(
            pl.BlockSpec(
                (1, 1, cap),
                lambda i, p, probes_ref: (probes_ref[i, p], 0, 0),
            )
        )
        inputs.append(leaf_scales[:, None, :])

    vals, rows = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec(
                    (1, tq, buckets), lambda i, p, probes_ref: (i, 0, 0)
                ),
                pl.BlockSpec(
                    (1, tq, buckets), lambda i, p, probes_ref: (i, 0, 0)
                ),
            ),
            scratch_shapes=[
                pltpu.VMEM((tq, buckets), jnp.float32),
                pltpu.VMEM((tq, buckets), jnp.int32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((tiles, tq, buckets), jnp.float32),
            jax.ShapeDtypeStruct((tiles, tq, buckets), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * tiles * num_probes * tq * cap * d,
            bytes_accessed=(
                tiles * num_probes
                * (leaf_block * d * leaf_embs.dtype.itemsize
                   + cap * (4 + (4 if quantized else 0)))
                + qn * d * 4
                + 2 * qn * buckets * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(probes, *inputs)
    return vals.reshape(qn, buckets), rows.reshape(qn, buckets)


def probed_bucketed_reference(
    queries: Array,
    leaf_embs: Array,
    leaf_scales: Optional[Array],
    leaf_rows: Array,
    probes: Array,
    buckets: int,
    query_tile: int = 1,
    packed4: bool = False,
) -> tuple:
    """Pure-jnp oracle for `probed_bucketed_scores` (any backend)."""
    if packed4:
        from recommenders_tpu.ops import quantization

        leaf_embs = quantization.unpack_nibbles(leaf_embs)
    qn, d = queries.shape
    tiles, num_probes = probes.shape
    tq = query_tile
    cap = leaf_embs.shape[1]
    embs = leaf_embs[probes]  # [T, P, cap, D]
    qt = queries.reshape(tiles, tq, d)
    if leaf_scales is not None:
        # Mirror the kernel: bf16 dot (integer codes exact in bf16),
        # per-row scale folded in AFTER the dot.
        scores = jnp.einsum(
            "tqd,tpcd->tqpc",
            qt.astype(jnp.bfloat16),
            embs.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ) * leaf_scales[probes][:, None]
    else:
        scores = jnp.einsum(
            "tqd,tpcd->tqpc", qt, embs,
            preferred_element_type=jnp.float32,
        )                                   # [T, tq, P, cap]
    rows = leaf_rows[probes]                # [T, P, cap]
    scores = jnp.where(rows[:, None] >= 0, scores, MIN_FLOAT)
    # Within each probed leaf, slot c folds into bucket c % buckets —
    # pad cap up to a bucket multiple so the partial tail group
    # reshapes cleanly (the kernel handles the tail with a sliced
    # update instead).
    pad = (-cap) % buckets
    if pad:
        scores = jnp.pad(
            scores, ((0, 0), (0, 0), (0, 0), (0, pad)),
            constant_values=MIN_FLOAT,
        )
        rows = jnp.pad(
            rows, ((0, 0), (0, 0), (0, pad)), constant_values=-1
        )
    groups = num_probes * (cap + pad) // buckets
    gv = scores.reshape(tiles, tq, groups, buckets)
    gr = jnp.broadcast_to(
        rows.reshape(tiles, 1, groups, buckets), gv.shape
    )
    best = jnp.argmax(gv, axis=2)
    vals = jnp.take_along_axis(gv, best[:, :, None], axis=2)[:, :, 0]
    out_rows = jnp.take_along_axis(gr, best[:, :, None], axis=2)[:, :, 0]
    out_rows = jnp.where(vals <= MIN_FLOAT, -1, out_rows)
    return vals.reshape(qn, buckets), out_rows.reshape(qn, buckets)


def probed_scores_reference(
    queries: Array,
    leaf_embs: Array,
    leaf_scales: Optional[Array],
    probes: Array,
    packed4: bool = False,
) -> Array:
    """Pure-jnp oracle (the original gather formulation; any backend).

    Materializes the `[Q, P, cap, D]` gather — fine for tests and small
    CPU corpora, the exact thing the kernel exists to avoid at scale.
    """
    if packed4:
        from recommenders_tpu.ops import quantization

        leaf_embs = quantization.unpack_nibbles(leaf_embs)
    embs = leaf_embs[probes]  # [Q, P, cap, D]
    if leaf_scales is not None:
        # Mirror the kernel: bf16 dot, per-row scale after the dot.
        scores = jnp.einsum(
            "qd,qpcd->qpc",
            queries.astype(jnp.bfloat16),
            embs.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ) * leaf_scales[probes]
    else:
        scores = jnp.einsum(
            "qd,qpcd->qpc", queries, embs,
            preferred_element_type=jnp.float32,
        )
    q = queries.shape[0]
    return scores.reshape(q, -1)
