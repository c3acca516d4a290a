"""Learned-codebook product quantization (LUT16-style asymmetric hashing).

The reference's ScaNN `score_ah(2)` stage
(`tensorflow_recommenders/layers/factorized_top_k.py:688-707`) is 4-bit
product quantization: dimensions split into subspaces, a 16-entry
codebook is K-MEANS-LEARNED per subspace, and each row stores one 4-bit
code per subspace. The CPU library scores codes against a per-query
lookup table with PSHUFB in-register shuffles (LUT16).

A TPU has no in-register gather, so scoring here rides the MXU instead:
the per-query LUT `lut[q, s, k] = q_s · c_{s,k}` is one batched matmul,
and the code lookup becomes a second matmul against the codes' one-hot
expansion (built on the fly from the stored 4-bit codes — one broadcast
compare), with the subspace sum falling out of the contraction:

    scores = lut.reshape(Q, S·K) @ one_hot(codes).reshape(C, S·K)ᵀ

This is `ops/quantization.py`'s scalar-int4 sibling with LEARNED,
vector-valued quantization cells: at `subspace_dim=1` it spends the same
4 bits/dim on a learned 16-point grid per dimension (strictly better
cells than uniform int4); at `subspace_dim=2` it matches `score_ah(2)`'s
2 bits/dim, halving index bytes again. The trade is arithmetic: the
one-hot contraction depth is `S·K` = `D·K/ds` versus the direct decode's
`D`, i.e. K/ds (8–16×) more MXU work per candidate — the reason the
scalar-int4 design is the default sweep kernel and PQ is the
capacity/recall dial (see docs/PARITY.md for the measured comparison).

Codebooks are trained with per-subspace Lloyd iterations fully on
device, vectorized across subspaces (one `[N, S, K]` assignment einsum
per block, one one-hot reduction for the centroid update).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

MIN_FLOAT = np.finfo(np.float32).min / 100.0


def normalize_rows(
    embs: Array, mode: Optional[str] = "max"
) -> Tuple[Array, Array]:
    """Per-row scale factored out before codebook training/encoding.

    PQ codebooks are SHARED across rows, so without a per-row scale the
    cells must cover every row magnitude at once — which is exactly
    where `ops/quantization.py`'s per-row scaled int4 wins (measured:
    on clustered data, plain marginal-k-means PQ at 4 bits/dim has ~40%
    higher reconstruction error than scaled uniform int4; the same
    codebooks trained on max-normalized rows have ~25% LOWER error).
    `mode="max"` divides by the row's abs-max (int4's normalization),
    `"l2"` by the row norm, `None` returns unit scales.

    Returns `(scales [N] f32, normalized [N, D] f32)` with
    `normalized · scale = embs`.
    """
    v = jnp.asarray(embs, jnp.float32)
    if mode is None:
        return jnp.ones((v.shape[0],), jnp.float32), v
    if mode == "max":
        s = jnp.maximum(jnp.abs(v).max(axis=-1), 1e-12)
    elif mode == "l2":
        s = jnp.maximum(jnp.linalg.norm(v, axis=-1), 1e-12)
    else:
        raise ValueError(f"Unknown normalize mode {mode!r}")
    return s, v / s[:, None]


def _split(x: Array, num_subspaces: int) -> Array:
    n, d = x.shape
    if d % num_subspaces:
        raise ValueError(
            f"dim {d} is not divisible into {num_subspaces} subspaces"
        )
    return x.reshape(n, num_subspaces, d // num_subspaces)


@functools.partial(jax.jit, static_argnames=("num_codes",))
def _assign_codes_block(x: Array, codebooks: Array, num_codes: int) -> Array:
    """`x [N, S, ds]`, `codebooks [S, K, ds]` → argmin-distance `[N, S]`."""
    # ‖x−c‖² = ‖x‖² − 2x·c + ‖c‖²; ‖x‖² is constant in the argmin.
    dots = jnp.einsum(
        "nsd,skd->nsk", x, codebooks, preferred_element_type=jnp.float32
    )
    c2 = jnp.sum(jnp.square(codebooks), axis=-1)  # [S, K]
    return jnp.argmin(c2[None] - 2.0 * dots, axis=-1).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("num_codes",))
def _kmeans_accumulate(
    x: Array, codebooks: Array, num_codes: int
) -> Tuple[Array, Array]:
    """One block's (Σx per cell `[S, K, ds]`, counts `[S, K]`)."""
    assign = _assign_codes_block(x, codebooks, num_codes)
    onehot = jax.nn.one_hot(assign, num_codes, dtype=jnp.float32)
    sums = jnp.einsum("nsk,nsd->skd", onehot, x)
    counts = jnp.sum(onehot, axis=0)
    return sums, counts


@functools.partial(jax.jit, static_argnames=("k",))
def _kmeans_pp_init(x: Array, k: int, rng: Array) -> Array:
    """k-means++ seeding, vectorized over subspaces.

    `x [N, S, ds]` → centers `[S, K, ds]`. Each subspace draws its next
    center with probability ∝ squared distance to its nearest chosen
    center — the D²-sampling that guarantees every occupied region gets
    a seed (plain random-row init leaves duplicate-valued seeds and
    dead cells that Lloyd cannot split).
    """
    n, s, ds = x.shape
    xt = jnp.swapaxes(x, 0, 1)  # [S, N, ds]
    first = jax.random.randint(rng, (s,), 0, n)
    c0 = jnp.take_along_axis(xt, first[:, None, None], axis=1)[:, 0]

    def step(carry, key):
        centers, mind2, j = carry  # [S, K, ds], [S, N], count
        logits = jnp.log(jnp.maximum(mind2, 1e-30))
        # Degenerate subspace (all points coincide): fall back uniform.
        logits = jnp.where(
            jnp.all(mind2 <= 1e-30, axis=1, keepdims=True), 0.0, logits
        )
        pick = jax.random.categorical(key, logits, axis=1)  # [S]
        new = jnp.take_along_axis(
            xt, pick[:, None, None], axis=1
        )[:, 0]  # [S, ds]
        centers = jax.lax.dynamic_update_index_in_dim(
            centers, new, j, axis=1
        )
        d2 = jnp.sum(jnp.square(xt - new[:, None, :]), axis=-1)
        return (centers, jnp.minimum(mind2, d2), j + 1), None

    centers = jnp.zeros((s, k, ds)).at[:, 0].set(c0)
    mind2 = jnp.sum(jnp.square(xt - c0[:, None, :]), axis=-1)
    keys = jax.random.split(jax.random.fold_in(rng, 1), k - 1)
    (centers, _, _), _ = jax.lax.scan(
        step, (centers, mind2, jnp.int32(1)), keys
    )
    return centers


def train_codebooks(
    sample: Array,
    num_subspaces: int,
    num_codes: int = 16,
    iterations: int = 10,
    rng: Optional[Array] = None,
    block: int = 1 << 16,
) -> Array:
    """K-means codebooks `[S, K, ds]` from a `[N, D]` training sample.

    Per-subspace Lloyd from a k-means++ seeding, all subspaces in
    parallel on device; the sample is processed in `block`-row blocks so
    the one-hot intermediate stays `[block, S, K]`. Empty cells keep
    their previous centroid (ScaNN's behaviour for dead AH centers).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    x = _split(jnp.asarray(sample, jnp.float32), num_subspaces)
    n, s, ds = x.shape
    k = num_codes
    if n < k:
        raise ValueError(f"need ≥ {k} sample rows, got {n}")
    codebooks = _kmeans_pp_init(x, k, rng)

    nblocks = -(-n // block)
    pad = nblocks * block - n
    # Padding rows carry zero weight via a validity lane.
    xp = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    valid = jnp.pad(jnp.ones((n,), jnp.float32), (0, pad))
    xb = xp.reshape(nblocks, block, s, ds)
    vb = valid.reshape(nblocks, block)

    # The sample blocks enter as ARGUMENTS, not closure captures: a jit
    # constant is serialized into the program itself, which for a large
    # training sample means shipping the corpus with every compile
    # request (fatal through a remote-compile tunnel; wasteful anywhere).
    @jax.jit
    def one_iteration(codebooks, xb, vb):
        def body(carry, blk):
            sums, counts = carry
            xi, vi = blk
            assign = _assign_codes_block(xi, codebooks, k)
            onehot = jax.nn.one_hot(assign, k, dtype=jnp.float32)
            onehot = onehot * vi[:, None, None]
            sums = sums + jnp.einsum("nsk,nsd->skd", onehot, xi)
            counts = counts + jnp.sum(onehot, axis=0)
            return (sums, counts), None

        (sums, counts), _ = jax.lax.scan(
            body,
            (jnp.zeros((s, k, ds)), jnp.zeros((s, k))),
            (xb, vb),
        )
        return jnp.where(
            (counts > 0)[..., None], sums / jnp.maximum(counts, 1.0)[..., None],
            codebooks,
        )

    for _ in range(iterations):
        codebooks = one_iteration(codebooks, xb, vb)
    return codebooks


@functools.partial(jax.jit, static_argnames=("chunk",))
def encode(embs: Array, codebooks: Array, chunk: int = 1 << 18) -> Array:
    """Encodes `[N, D]` rows → `[N, S]` int8 codes in `[0, K)`, blocked.

    Row-independent, so the `[chunk, S, K]` distance intermediate never
    exceeds the block size (a 10M-row encode would otherwise allocate
    tens of GB).
    """
    s, k, ds = codebooks.shape
    n, d = embs.shape
    if d != s * ds:
        raise ValueError(f"dim {d} != {s}×{ds} codebook layout")
    if n <= chunk:
        return _assign_codes_block(_split(embs, s), codebooks, k)
    pad = (-n) % chunk
    xp = jnp.pad(embs.astype(jnp.float32), ((0, pad), (0, 0)))
    blocks = xp.reshape(-1, chunk, d)

    def body(_, blk):
        return None, _assign_codes_block(_split(blk, s), codebooks, k)

    _, codes = jax.lax.scan(body, None, blocks)
    return codes.reshape(-1, s)[:n]


@jax.jit
def pack_codes(codes: Array) -> Array:
    """Packs `[N, S]` 4-bit codes (values 0–15) two-per-byte → `[N, S/2]`.

    Pairs along the SUBSPACE axis: byte `j` holds subspace `2j` in the
    low nibble, `2j+1` in the high nibble (codes are unsigned, so no
    sign games — contrast `quantization.pack_nibbles`' signed row-axis
    pairing for the scalar kernels).
    """
    n, s = codes.shape
    if s % 2:
        raise ValueError(f"pack_codes needs an even subspace count, got {s}")
    c = codes.astype(jnp.int32).reshape(n, s // 2, 2)
    return (c[..., 0] | (c[..., 1] << 4)).astype(jnp.int8)


@jax.jit
def unpack_codes(packed: Array) -> Array:
    """Inverse of `pack_codes`: `[N, S/2]` int8 → `[N, S]` (0–15)."""
    p = packed.astype(jnp.int32) & 0xFF
    lo = p & 15
    hi = p >> 4
    return jnp.stack([lo, hi], axis=-1).reshape(p.shape[0], -1).astype(
        jnp.int8
    )


@jax.jit
def decode(codes: Array, codebooks: Array) -> Array:
    """Reconstructs `[N, D]` rows from `[N, S]` codes (tests/reorder)."""
    s, k, ds = codebooks.shape
    sub_idx = jnp.arange(s)[None, :]
    recon = codebooks[sub_idx, codes.astype(jnp.int32)]  # [N, S, ds]
    return recon.reshape(codes.shape[0], s * ds)


@jax.jit
def query_lut(queries: Array, codebooks: Array) -> Array:
    """Per-query code scores `lut[q, s, k] = q_s · c_{s,k}` → `[Q, S, K]`."""
    s, k, ds = codebooks.shape
    q = _split(queries.astype(jnp.float32), s)
    return jnp.einsum(
        "qsd,skd->qsk", q, codebooks, preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("num_codes",))
def score_block(lut: Array, packed_codes: Array, num_codes: int = 16) -> Array:
    """Scores a code block: `lut [Q, S, K]` × `[C, S/2]` packed → `[Q, C]`.

    The LUT16 gather becomes an MXU contraction over the one-hot code
    expansion (built in bf16 — exact for 0/1 — from one broadcast
    compare). The LUT side also rounds to bf16: |lut error| ≤ 2⁻⁸·|lut|,
    an order below the quantization error PQ already accepted.
    """
    q, s, k = lut.shape
    codes = unpack_codes(packed_codes)  # [C, S]
    onehot = (
        codes[:, :, None] == jnp.arange(k, dtype=jnp.int8)[None, None, :]
    )
    c = onehot.reshape(codes.shape[0], s * k).astype(jnp.bfloat16)
    return jax.lax.dot_general(
        lut.reshape(q, s * k).astype(jnp.bfloat16),
        c,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(
    jax.jit, static_argnames=("k", "buckets", "chunk", "exact_merge")
)
def pq_top_k(
    queries: Array,
    packed_codes: Array,
    codebooks: Array,
    k: int,
    row_scales: Optional[Array] = None,
    valid_rows: Optional[int] = None,
    buckets: int = 4096,
    chunk: int = 8192,
    exact_merge: bool = False,
) -> Tuple[Array, Array]:
    """Full-scan PQ top-k: streams packed codes, scores on the MXU.

    Selection matches `ops/scoring.bucketed_top_k`: per-chunk scores
    fold into a `[Q, buckets]` running argmax (bucket = row % buckets)
    and one exact `lax.top_k` finishes — identical birthday-bound
    recall dial. `exact_merge=True` instead merges per-chunk exact
    top-k (slower; isolates PQ quantization loss in tests).

    `row_scales` (`[n]` f32, from `normalize_rows`) folds each row's
    stored magnitude back in after the LUT contraction — asymmetric
    scoring stays one multiply per output element, as in the scalar
    quantized kernels.

    Returns `(scores [Q, k], row ids [Q, k])`; scores are the PQ
    approximations `scale · (q · decode(code))`.
    """
    qn = queries.shape[0]
    n = packed_codes.shape[0]
    if valid_rows is None:
        valid_rows = n
    if n % chunk:
        raise ValueError(f"corpus rows {n} not a multiple of chunk {chunk}")
    if not exact_merge and chunk % buckets:
        raise ValueError(f"chunk {chunk} must be a multiple of {buckets}")
    lut = query_lut(queries, codebooks)
    s2 = packed_codes.shape[1]
    blocks = packed_codes.reshape(n // chunk, chunk, s2)
    if row_scales is None:
        scale_blocks = jnp.ones((n // chunk, 1, chunk), jnp.float32)
    else:
        scale_blocks = row_scales.astype(jnp.float32).reshape(
            n // chunk, 1, chunk
        )
    nc = codebooks.shape[1]

    if exact_merge:
        def body(carry, blk_sc):
            blk, sc = blk_sc
            vals, ids, base = carry
            scores = score_block(lut, blk, nc) * sc
            col = base + jnp.arange(chunk, dtype=jnp.int32)[None]
            scores = jnp.where(col < valid_rows, scores, MIN_FLOAT)
            bv, bi = jax.lax.top_k(scores, k)
            bids = jnp.take_along_axis(
                jnp.broadcast_to(col, scores.shape), bi, axis=1
            )
            mv = jnp.concatenate([vals, bv], axis=1)
            mi = jnp.concatenate([ids, bids], axis=1)
            nv, sel = jax.lax.top_k(mv, k)
            return (nv, jnp.take_along_axis(mi, sel, axis=1),
                    base + chunk), None

        init = (
            jnp.full((qn, k), MIN_FLOAT),
            jnp.zeros((qn, k), jnp.int32),
            jnp.int32(0),
        )
        (vals, ids, _), _ = jax.lax.scan(
            body, init, (blocks, scale_blocks)
        )
        return vals, ids

    def body(carry, blk_sc):
        blk, sc = blk_sc
        run_vals, run_ids, base = carry
        scores = score_block(lut, blk, nc) * sc
        col = base + jnp.arange(chunk, dtype=jnp.int32)[None]
        scores = jnp.where(col < valid_rows, scores, MIN_FLOAT)
        sc = scores.reshape(qn, chunk // buckets, buckets)
        ci = jnp.broadcast_to(col, scores.shape).reshape(
            qn, chunk // buckets, buckets
        )
        g = jnp.argmax(sc, axis=1, keepdims=True)
        bv = jnp.take_along_axis(sc, g, axis=1)[:, 0]
        bi = jnp.take_along_axis(ci, g, axis=1)[:, 0]
        upd = bv > run_vals
        return (
            jnp.where(upd, bv, run_vals),
            jnp.where(upd, bi, run_ids),
            base + chunk,
        ), None

    init = (
        jnp.full((qn, buckets), MIN_FLOAT),
        jnp.zeros((qn, buckets), jnp.int32),
        jnp.int32(0),
    )
    (run_vals, run_ids, _), _ = jax.lax.scan(
        body, init, (blocks, scale_blocks)
    )
    vals, sel = jax.lax.top_k(run_vals, k)
    return vals, jnp.take_along_axis(run_ids, sel, axis=1)
