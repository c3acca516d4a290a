"""Pallas sorted sparse-apply: fast row-sparse optimizer updates.

XLA's `scatter` on TPU lowers to a sequential per-row loop (~150 ns per
updated row on v5e, independent of row width), so an embedding-engine
step whose update path is scatter-shaped — dedupe segment-sums, slot
scatter, table scatter, per table — costs ~1.8 ms at a 4096 batch and
dominates training. (The gather direction is vectorized and ~7× faster;
only writes are slow.) This is the reason the reference offloads sparse
updates to dedicated hardware (the SparseCore engine behind
`tensorflow_recommenders/layers/embedding/tpu_embedding_layer.py:40-76`).

This module is the TensorCore-native replacement. Updates arrive SORTED
by row id, so the touched table rows cluster into a small set of
`block_rows`-row blocks, and within a block the update becomes DENSE
math the MXU/VPU can chew:

  - A Pallas kernel sweeps exactly the touched blocks (dynamic block
    indices via scalar prefetch; untouched blocks are never read or
    written).
  - Each block's slice of the sorted update list streams HBM→VMEM in
    chunks via manual DMA. Per-row dynamic VMEM writes are SLOW
    (~130 ns each, same as XLA scatter — measured), so the kernel never
    writes rows individually: it builds the chunk's one-hot routing
    matrix `onehotT[u, row] = (id_u − base == row)` with one broadcast
    compare and DENSIFIES the updates with one MXU matmul
    `G += onehotTᵀ @ [g_hi | g_lo | ones?]` — duplicates sum
    automatically, and the bf16 hi+lo gradient split rides the SAME
    pass (near-f32 exact sums at single-pass cost).
  - After the last chunk, the whole block updates vectorized:
    `new_blocks = block_update(state_blocks, G, count)` where `count`
    (per-row update multiplicity, from a ones lane packed into the same
    matmul — shipped only when the rule needs it) lets decay-style
    rules (Adam) mask untouched rows.
  - Every state array (table + slot planes) updates in one pass, in
    place (`input_output_aliases`).

HBM traffic is `touched_blocks · block_rows · row_bytes · 2` plus the
update rows — the floor for a blocked update — and the arithmetic is
one `[block_rows, chunk] × [chunk, D]` matmul per chunk.

Duplicate ids need NOT be pre-folded (the matmul sums them), but rules
that are nonlinear in the gradient (everything except SGD) require one
combined update per row, so callers still dedupe first (`dedupe_sum` /
`dedupe_cumsum` in `embedding/sparse_optimizer.py`), matching the
engine contract.

`sorted_block_apply_reference` is the pure-jnp twin used on CPU and in
tests.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Vectorized per-block rule: (state_blocks [S][R, D], grad_block [R, D],
# count [R, 1]) -> new state blocks. `grad_block` holds the summed
# update for each row (zero for untouched rows); `count` the number of
# update entries that hit the row. Must be jnp-only; traced inline.
# When `scalars` is passed to `sorted_block_apply`, the rule receives a
# fourth argument: a tuple of traced f32 scalars (e.g. the learning rate
# at this step) smuggled into the kernel through SMEM.
BlockUpdate = Callable[[Sequence[Array], Array, Array], Sequence[Array]]

_LANES = 128


def counter_random_u32(
    seed: Array, stream: Array, shape: Tuple[int, ...]
) -> Array:
    """Stateless counter-based random bits (murmur3 finalizer).

    Position-hashed, so it needs no PRNG state and lowers everywhere
    (including CPU interpret mode, where `pltpu.prng_seed` has no
    lowering) — the INTERPRET-mode randomness source for stochastic
    rounding. Compiled kernels use the on-core hardware PRNG instead
    (~10× cheaper; the hash cost ~130 us/step at the headline shape),
    so SR output parity between compiled and interpreted runs is
    statistical, not bitwise. Hash quality is far beyond what unbiased
    rounding needs (the finalizer passes SmallCrush); NOT for
    cryptography or model-rng.
    """
    r, c = shape
    pos = (
        lax.broadcasted_iota(jnp.int32, shape, 0) * jnp.int32(c)
        + lax.broadcasted_iota(jnp.int32, shape, 1)
    ).astype(jnp.uint32)
    x = pos * jnp.uint32(0x9E3779B9)
    x = x ^ (
        seed.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)
        + stream.astype(jnp.uint32) * jnp.uint32(0xC2B2AE35)
    )
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def stochastic_round_bf16(x: Array, random_u32: Array) -> Array:
    """f32 → bf16 with probabilistic rounding (unbiased: E[out] = x).

    Adds 16 uniform random bits below the bf16 mantissa boundary, then
    truncates — the carry into the kept bits fires with probability
    equal to the discarded fraction. Low-magnitude updates into a bf16
    table survive IN EXPECTATION instead of being swallowed by
    round-to-nearest (the standard recipe for half-precision embedding
    training; ±inf inputs are not handled — weights are finite).
    """
    u = lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    u = u + (random_u32.astype(jnp.uint32) & jnp.uint32(0xFFFF))
    u = u & jnp.uint32(0xFFFF0000)
    return lax.bitcast_convert_type(u, jnp.float32).astype(jnp.bfloat16)


def _pick_block_rows(v: int, preferred: int) -> int:
    b = preferred
    while b > 8:
        if v % b == 0:
            return b
        b //= 2
    return b if v % b == 0 else 0


def _kernel(
    block_ref, chunk_ref, s_ref, e_ref, sc_ref, seed_ref,  # SMEM prefetch
    aug_ref,                                    # [chunk, d_aug] pipelined
    *refs,
    block_update: BlockUpdate,
    num_state: int,
    num_scalars: int,
    block_rows: int,
    chunk: int,
    d: int,
    d_grad: int,
    num_pairs: int,
    use_sr: bool,
    use_hw_rng: bool,
    exact_routing: bool,
    need_count: bool,
    sub_pack: int,
    out_dtypes: Tuple,
):
    ins = refs[:num_state]
    outs = refs[num_state:2 * num_state]
    g_acc = refs[2 * num_state]         # [R, P] f32 (raw routed sums)
    p = pl.program_id(0)
    s = s_ref[p]
    e = e_ref[p]
    # `block_rows` counts PHYSICAL rows; with lane packing
    # (sub_pack > 1) each physical row holds `sub_pack` logical rows,
    # so a block covers block_rows·sub_pack logical ids.
    base = block_ref[p] * (block_rows * sub_pack)
    is_first = jnp.logical_or(p == 0, block_ref[p] != block_ref[p - 1])
    is_last = jnp.logical_or(
        p == num_pairs - 1, block_ref[p] != block_ref[p + 1]
    )

    # The augmented stream arrives as INT32 (bit-identical container)
    # and the grad lanes bitcast back to f32 here. Row ids ride in lane
    # d of the one augmented lane group (not a separate group: at d=64
    # that halves the update stream's DMA and VMEM footprint).
    # The container must not be f32: every vocab id bitcasts to an f32
    # DENORMAL (ids < 2^23 have a zero exponent), and the compiled f32
    # load path flushes denormals to zero — on hardware every id read
    # back 0 and all of a block's updates routed to its row 0
    # (interpret mode preserved bits, so CPU tests never saw it).
    ids = aug_ref[:, d:d + 1]                    # [chunk, 1] int32
    # Entries outside this block's [s, e) range (edge entries of a
    # shared chunk, padding, sentinel pairs) route to no row.
    idx = chunk_ref[p] * chunk + lax.broadcasted_iota(
        jnp.int32, (chunk, 1), 0
    )
    local = jnp.where((idx >= s) & (idx < e), ids - base, -1)
    dp = sub_pack * d                   # physical (packed) row width
    if sub_pack > 1:
        # Lane-packed routing: logical row `l` lives at physical row
        # l // sub_pack, lane group l % sub_pack. The one-hot compares
        # PHYSICAL rows — sub_pack× fewer compare/select elements than
        # routing logical rows, the term that dominated the kernel at
        # narrow dims (V·chunk routing work; docs/PARITY.md round 5) —
        # and the gradient operand widens to the full 128-lane tile by
        # placing each update at its lane group, so the routing matmul
        # runs at full MXU tile utilization where the unpacked d=32
        # form filled only a quarter tile. Masked entries (local = -1)
        # get phys = -1, matching no row.
        phys = lax.div(local, sub_pack)
        sub = local - phys * sub_pack
        rows = lax.broadcasted_iota(jnp.int32, (chunk, block_rows), 1)
        onehot_t = (phys == rows).astype(jnp.bfloat16)  # [chunk, R]
        gd = lax.bitcast_convert_type(aug_ref[:, :d], jnp.float32)
        g_hi = gd.astype(jnp.bfloat16)
        group = lax.div(
            lax.broadcasted_iota(jnp.int32, (chunk, dp), 1), d
        )
        in_group = group == sub                  # [chunk, dp]
        zero = jnp.zeros((), jnp.bfloat16)
        tile_hi = jnp.concatenate([g_hi] * sub_pack, axis=1)
        parts = [jnp.where(in_group, tile_hi, zero)]
        if exact_routing:
            g_lo = (gd - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            tile_lo = jnp.concatenate([g_lo] * sub_pack, axis=1)
            parts.append(jnp.where(in_group, tile_lo, zero))
        if need_count:
            # Per-LOGICAL-row multiplicity: a one-hot of the lane
            # group, sub_pack lanes wide.
            cnt_iota = lax.broadcasted_iota(
                jnp.int32, (chunk, sub_pack), 1
            )
            parts.append((cnt_iota == sub).astype(jnp.bfloat16))
        packed = jnp.concatenate(parts, axis=1)
    else:
        rows = lax.broadcasted_iota(jnp.int32, (chunk, block_rows), 1)
        onehot_t = (local == rows).astype(jnp.bfloat16)  # [chunk, R]
        # Near-f32 routing at ONE MXU pass: the one-hot side is EXACT in
        # bf16 (0.0/1.0), so only the gradient side needs splitting —
        # g = hi + lo with both parts bf16 gives each product exactly and
        # ~16 mantissa bits on the sum (f32 accumulation). hi and lo PACK
        # into the same matmul operand (lanes [0, d) and [d, 2d)), so at
        # d = 64 exact routing fills exactly one 128-lane tile and costs
        # what a single lossy bf16 pass otherwise would. The ones lane
        # (per-row multiplicity for decay rules' count mask) ships only
        # when the rule reads it — SGD/Adagrad are gradient-homogeneous
        # (g = 0 is already an identity), so their headline path skips it.
        gd = lax.bitcast_convert_type(aug_ref[:, :d], jnp.float32)
        g_hi = gd.astype(jnp.bfloat16)
        parts = [g_hi]
        if exact_routing:
            parts.append(
                (gd - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            )
        if need_count:
            parts.append(jnp.ones((chunk, 1), jnp.bfloat16))
        packed = parts[0] if len(parts) == 1 else jnp.concatenate(
            parts, axis=1
        )
    contrib = lax.dot_general(
        onehot_t,
        packed,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                            # [R, P] f32

    def finish(acc):
        # The raw routed lanes fold here, ONCE per block (the per-chunk
        # path above only ever accumulates them): hi + lo sum and the
        # count lane(s) split out. Under lane packing `g` stays in the
        # packed [R, sub_pack·d] layout — the state blocks are packed
        # the same way, so elementwise rules apply unchanged — and
        # `count` is [R, sub_pack], one lane per logical row.
        g = acc[:, :dp]
        if exact_routing:
            g = g + acc[:, dp:2 * dp]
        if need_count:
            count = acc[:, acc.shape[1] - sub_pack:]
        else:
            count = jnp.zeros((block_rows, sub_pack), jnp.float32)
        # Rules always compute in f32; sub-f32 state (bf16 tables)
        # upcasts here and rounds on write-back below.
        args = [[i[...].astype(jnp.float32) for i in ins], g, count]
        if num_scalars:
            args.append(tuple(sc_ref[k] for k in range(num_scalars)))
        new_blocks = block_update(*args)
        if use_sr and use_hw_rng:
            # On-core hardware PRNG, seeded per (step-seed, block):
            # sequential draws below give each bf16 array distinct
            # bits, and the write happens once per block (is_last), so
            # no position is rounded twice with the same bits. ~10×
            # cheaper than the murmur counter hash, which cost
            # ~130 us/step at the headline shape (12.6M written
            # elements × ~12 VPU ops each).
            pltpu.prng_seed(seed_ref[0], block_ref[p])
        for idx, (o, nb, dt) in enumerate(
            zip(outs, new_blocks, out_dtypes)
        ):
            if use_sr and dt == jnp.bfloat16:
                if use_hw_rng:
                    bits = lax.bitcast_convert_type(
                        pltpu.prng_random_bits(nb.shape), jnp.uint32
                    )
                else:
                    # Counter hash: position-deterministic, lowers in
                    # CPU interpret mode where prng_seed does not.
                    # Stream = (block index, state array).
                    bits = counter_random_u32(
                        seed_ref[0],
                        block_ref[p] * jnp.int32(num_state)
                        + jnp.int32(idx),
                        nb.shape,
                    )
                o[...] = stochastic_round_bf16(nb, bits)
            else:
                o[...] = nb.astype(dt)

    # Single-visit blocks (all their updates in this one chunk — the
    # common case when updates are sparse) finish straight from the
    # routing registers; the VMEM scratch accumulator is only read or
    # written when a block genuinely spans several chunks, and the
    # first visit stores instead of zero-then-accumulate.
    single = jnp.logical_and(is_first, is_last)

    @pl.when(single)
    def _():
        finish(contrib)

    multi = jnp.logical_not(single)

    @pl.when(jnp.logical_and(multi, is_first))
    def _():
        g_acc[...] = contrib

    @pl.when(jnp.logical_and(multi, jnp.logical_not(is_first)))
    def _():
        g_acc[...] = g_acc[...] + contrib

    @pl.when(jnp.logical_and(multi, is_last))
    def _():
        finish(g_acc[...])


def sorted_block_apply(
    states: Tuple[Array, ...],
    sorted_ids: Array,
    sorted_grads: Array,
    block_update: BlockUpdate,
    *,
    scalars: Optional[Array] = None,
    block_rows: int = 512,
    chunk: int = 128,
    stochastic_round_seed: Optional[Array] = None,
    exact_routing: bool = True,
    need_count: bool = True,
    grad_dim: Optional[int] = None,
    sub_pack: int = 1,
    interpret: bool = False,
    _alias: bool = True,
) -> Tuple[Array, ...]:
    """Applies a row-sparse optimizer update through the blocked kernel.

    Args:
      states: state arrays (table first, then slots); the table is
        `[V, D]`, slot planes are `[V, d_s]` with `1 ≤ d_s ≤ D` (e.g.
        rowwise Adagrad's `[V, 1]` scalar accumulator); all updated in
        place (donated — do not reuse the inputs).
      sorted_ids: `[n]` int32 row ids, ASCENDING; entries `>= V` are
        padding/dropped rows and must sort last.
      sorted_grads: `[n, D]` update rows aligned with `sorted_ids`
        (duplicates are summed by the kernel; nonlinear rules should
        receive deduped input).
      block_update: vectorized per-block rule
        `(state_blocks, grad_block, count) -> new blocks`. MUST be an
        identity for rows with `count == 0` (untouched rows inside a
        touched block pass through it with zero grad/count) — rules
        where a zero gradient still mutates state (Adam's decay) must
        mask with `count > 0`.
      scalars: Optional `[k]` f32 vector of traced runtime scalars
        (learning rate, bias corrections, ...); when given,
        `block_update` receives them as a fourth argument — a k-tuple
        of scalar values read from SMEM.
      stochastic_round_seed: Optional int32 scalar. When given, bf16
        state arrays are written back with stochastic rounding
        (`stochastic_round_bf16`) using the on-core PRNG seeded from
        (seed, grid step); other dtypes round as usual. Pass a
        per-(step, table) seed so streams never repeat.
      exact_routing: route gradients through the MXU as a bf16 hi+lo
        split packed into one matmul (near-f32 exact sums; default) vs
        a single bf16 pass (~8 mantissa bits on the routed sums). At
        d ≤ 63 both fill the same 128-lane tile — exactness is free;
        wider rows pay ~2× routing lanes for the split.
      need_count: whether `block_update` reads its `count` argument.
        With False (correct only for rules where a zero gradient is
        already an identity — SGD/Adagrad) the ones lane is dropped
        from the routing matmul and `count` arrives as zeros; at d = 64
        that keeps exact routing inside one 128-lane MXU tile.
      block_rows: rows per streamed table block (auto-shrunk to divide
        V). Smaller blocks help when updates are sparse relative to V
        (fewer untouched rows streamed); bigger blocks amortize DMA.
      chunk: update rows per DMA / routing matmul.
      sub_pack: logical rows per PHYSICAL state row (lane packing).
        With sub_pack = p > 1 every state array stores p consecutive
        logical rows side by side in one p·d-lane physical row
        (`table.reshape(V // p, p * d)` of the logical layout), ids and
        grads stay LOGICAL ([n] ids in [0, V), [n, d] grads), and the
        kernel routes each update to (physical row, lane group). This
        is the narrow-dim fast path: routing compares physical rows
        (p× less one-hot work) and the routing matmul fills full
        128-lane tiles. Rowwise slot planes pack to [V/p, p].
      interpret: run interpreted (CPU tests).

    Returns:
      Updated state arrays.
    """
    v = states[0].shape[0]          # PHYSICAL rows
    if grad_dim is not None:
        d = grad_dim
    else:
        d = states[0].shape[1] // sub_pack
    n = sorted_ids.shape[0]
    # Slot planes may be NARROWER than the table (e.g. rowwise
    # Adagrad's [V, 1] scalar accumulator — 1/d the slot HBM traffic),
    # and the FIRST state may be WIDER than the gradient (`grad_dim`):
    # a PACKED state array carrying table and slot planes in one lane
    # group, so one block streams per direction instead of one per
    # state (the per-grid-step pipeline cost is per buffer). Every
    # state still covers the same V rows. Only these widths are
    # exercised by the kernel rules; reject others rather than hand an
    # untested shape to `block_update` (ValueError, not assert:
    # user-facing and `-O`-proof).
    if sub_pack > 1:
        for i, st in enumerate(states):
            w_ok = (sub_pack, sub_pack * d)
            if st.shape[0] != v or st.shape[1] not in w_ok:
                raise ValueError(
                    f"Packed state plane shape {st.shape} is not "
                    f"supported: every plane must cover {v} physical "
                    f"rows with width {sub_pack * d} (full) or "
                    f"{sub_pack} (rowwise)."
                )
    else:
        for i, st in enumerate(states):
            w_ok = (1, d, states[0].shape[1]) if i == 0 else (1, d)
            if st.shape[0] != v or st.shape[1] not in w_ok:
                raise ValueError(
                    f"State plane shape {st.shape} is not supported: "
                    f"every plane must cover the table's {v} rows with "
                    f"width {d} (full), 1 (rowwise), or — for the first "
                    f"state — a packed width."
                )
    use_sr = stochastic_round_seed is not None and any(
        st.dtype == jnp.bfloat16 for st in states
    )
    br = _pick_block_rows(v, block_rows)
    if br == 0:
        raise ValueError(
            f"No block size ≤ {block_rows} divides V={v}; pad the "
            "table or use the reference path."
        )
    nb = v // br
    num_t = min(n, nb)
    # Logical ids per block (= physical rows per block under no
    # packing); all boundary math below runs in LOGICAL id space.
    span = br * sub_pack
    v_logical = v * sub_pack

    if nb <= n:
        # Dense boundary path (the common regime: more updates than
        # blocks): ONE searchsorted over all block boundaries gives
        # every block's [start, end) slice directly — blocks with no
        # updates get zero chunks and never enter the pair list, so
        # the touched-block detection (compare + sort + cummax + two
        # more searchsorteds, ~half the pair-list construction's
        # small-op soup per step) disappears.
        bounds = jnp.searchsorted(
            sorted_ids,
            jnp.arange(nb + 1, dtype=sorted_ids.dtype) * span,
            side="left",
        ).astype(jnp.int32)
        starts = bounds[:-1]
        ends = bounds[1:]
        touched_safe = jnp.arange(nb, dtype=jnp.int32)
        real = ends > starts
    else:
        blocks = jnp.where(
            sorted_ids < v_logical, sorted_ids // span, nb
        ).astype(jnp.int32)
        first = jnp.concatenate(
            [jnp.ones((1,), bool), blocks[1:] != blocks[:-1]]
        )
        touched = jnp.sort(
            jnp.where(first & (blocks < nb), blocks, nb)
        )[:num_t]
        real = touched < nb
        touched_safe = lax.cummax(jnp.where(real, touched, 0))
        starts = jnp.searchsorted(
            sorted_ids, touched_safe * span, side="left"
        ).astype(jnp.int32)
        ends = jnp.searchsorted(
            sorted_ids, (touched_safe + 1) * span, side="left"
        ).astype(jnp.int32)
        starts = jnp.where(real, starts, 0)
        ends = jnp.where(real, ends, 0)

    # Flatten (touched block, aligned update chunk) pairs: the grid
    # walks pairs, so the Mosaic pipeline prefetches BOTH the chunk of
    # update rows and the state blocks — no manual DMA, no exposed
    # latency. Chunks sit on an absolute chunk-aligned grid (adjacent
    # blocks may share an edge chunk; out-of-range entries self-mask).
    first_chunk = lax.div(starts, chunk)
    nch = jnp.where(
        real, lax.div(ends + chunk - 1, chunk) - first_chunk, 0
    )
    nch = jnp.maximum(nch, 0)
    offs = jnp.cumsum(nch)                      # inclusive
    total = offs[-1] if num_t else jnp.int32(0)
    num_pairs = num_t + n // chunk + 1          # static bound
    pidx = jnp.arange(num_pairs, dtype=jnp.int32)
    t_of = jnp.searchsorted(offs, pidx, side="right").astype(jnp.int32)
    t_of = jnp.minimum(t_of, num_t - 1)
    excl = offs - nch                           # exclusive prefix
    in_range = pidx < total
    block_list = touched_safe[t_of]
    chunk_list = jnp.where(
        in_range, first_chunk[t_of] + (pidx - excl[t_of]), 0
    )
    # Sentinel pairs repeat the final (block, chunk) pair — fully
    # revisit-elided — with an empty [s, e) so they contribute nothing.
    last_real = jnp.maximum(total - 1, 0)
    block_list = jnp.where(
        in_range, block_list, block_list[last_real]
    )
    chunk_list = jnp.where(
        in_range, chunk_list, chunk_list[last_real]
    )
    s_pair = jnp.where(in_range, starts[t_of], 0)
    e_pair = jnp.where(in_range, ends[t_of], 0)

    # Augmented update rows: [grad (d) | row id | zero pad to a
    # 128-multiple] — ONE lane group when d ≤ 127, so the update
    # stream (DMA + VMEM) carries no all-padding group. The container
    # is INT32 (grad lanes bitcast) because the compiled f32 load path
    # flushes denormals — which every bitcast id would be (see the id
    # read in `_kernel`).
    d_grad = -(-(d + 1) // _LANES) * _LANES
    d_aug = d_grad
    # The id lane rides IN the concatenate (lane d), not as a
    # second `.at[:, d].set` pass — that rewrote the whole [n, d_aug]
    # stream once more per step (~22 us at the headline shape,
    # trace-measured as its own dynamic-update-slice op).
    parts = [
        lax.bitcast_convert_type(
            sorted_grads.astype(jnp.float32), jnp.int32
        ),
        sorted_ids.astype(jnp.int32)[:, None],
    ]
    if d_grad - d - 1:
        parts.append(jnp.zeros((n, d_grad - d - 1), jnp.int32))
    aug = jnp.concatenate(parts, axis=1)
    pad_rows = (-n) % chunk
    aug = jnp.pad(aug, ((0, pad_rows), (0, 0)))

    num_state = len(states)
    num_scalars = 0 if scalars is None else int(scalars.shape[0])
    sc = (
        jnp.zeros((1,), jnp.float32)
        if scalars is None
        else scalars.astype(jnp.float32)
    )
    seed = (
        jnp.zeros((1,), jnp.int32)
        if stochastic_round_seed is None
        else jnp.asarray(stochastic_round_seed, jnp.int32).reshape((1,))
    )
    kernel = functools.partial(
        _kernel,
        block_update=block_update,
        num_state=num_state,
        num_scalars=num_scalars,
        block_rows=br,
        chunk=chunk,
        d=d,
        d_grad=d_grad,
        num_pairs=num_pairs,
        use_sr=use_sr,
        use_hw_rng=not interpret,
        exact_routing=exact_routing,
        need_count=need_count,
        sub_pack=sub_pack,
        out_dtypes=tuple(st.dtype for st in states),
    )
    # Routed lane count: [hi | lo?] grads + optional count lane(s). The
    # scratch accumulator holds RAW routed sums (hi/lo fold at block
    # finish), so multi-chunk accumulation touches exactly P lanes.
    dp = sub_pack * d
    p_lanes = (2 * dp if exact_routing else dp) + (
        sub_pack if need_count else 0
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(num_pairs,),
        in_specs=[
            pl.BlockSpec(
                (chunk, d_aug),
                lambda p, bl, cl, sp, ep, sr, sd: (cl[p], 0),
            )
        ] + [
            pl.BlockSpec(
                (br, st.shape[1]),
                lambda p, bl, cl, sp, ep, sr, sd: (bl[p], 0),
            )
            for st in states
        ],
        out_specs=tuple(
            pl.BlockSpec(
                (br, st.shape[1]),
                lambda p, bl, cl, sp, ep, sr, sd: (bl[p], 0),
            )
            for st in states
        ),
        scratch_shapes=[
            pltpu.VMEM((br, p_lanes), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct(st.shape, st.dtype) for st in states
        ),
        # Operand order: 6 scalar-prefetch refs, the aug chunks (6),
        # then the state arrays (7..). `_alias=False` is a measurement
        # knob (benchmarks/_alias_probe.py): it doubles HBM footprint
        # to expose whether in-place aliasing serializes the block DMAs.
        input_output_aliases=(
            {7 + i: i for i in range(num_state)} if _alias else {}
        ),
        interpret=interpret,
    )(
        block_list, chunk_list, s_pair, e_pair, sc, seed,
        aug, *states,
    )


def sorted_block_apply_reference(
    states: Tuple[Array, ...],
    sorted_ids: Array,
    sorted_grads: Array,
    block_update: BlockUpdate,
    *,
    scalars: Optional[Array] = None,
    stochastic_round_seed: Optional[Array] = None,
) -> Tuple[Array, ...]:
    """Pure-jnp twin of `sorted_block_apply` (any backend).

    Densifies per-row sums/counts with a segment-sum, gathers the
    touched rows, applies `block_update` on the gathered "block"
    (rules are elementwise over rows, so gathering is equivalent),
    and scatters back — the slow formulation the kernel replaces.
    bf16 states round stochastically when a seed is given (same
    semantics as the kernel; the random stream differs — SR parity is
    statistical, not bitwise).
    """
    v, d = states[0].shape
    n = sorted_ids.shape[0]
    valid = sorted_ids < v
    safe = jnp.where(valid, sorted_ids, 0)
    g = jnp.where(valid[:, None], sorted_grads, 0.0)
    # Duplicates fold exactly as in the kernel's routing matmul.
    seg = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum((safe[1:] != safe[:-1]).astype(jnp.int32))]
    )
    gsum = jax.ops.segment_sum(g, seg, num_segments=n)
    cnt = jax.ops.segment_sum(
        valid.astype(jnp.float32), seg, num_segments=n
    )
    first = jnp.concatenate(
        [jnp.ones((1,), bool), safe[1:] != safe[:-1]]
    ) & valid
    rows = [st[safe].astype(jnp.float32) for st in states]
    args = [rows, gsum[seg], cnt[seg][:, None]]
    if scalars is not None:
        args.append(tuple(scalars[k] for k in range(scalars.shape[0])))
    new_rows = block_update(*args)
    use_sr = stochastic_round_seed is not None
    out = []
    for i, (st, nr) in enumerate(zip(states, new_rows)):
        if use_sr and st.dtype == jnp.bfloat16:
            # Same hash family as the kernel, positioned by TABLE row
            # id (stable under duplicates; only `first` entries write).
            col = lax.broadcasted_iota(jnp.int32, nr.shape, 1)
            pos = safe[:, None] * jnp.int32(d) + col
            x = pos.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
            x = x ^ (
                jnp.asarray(stochastic_round_seed, jnp.uint32)
                * jnp.uint32(0x85EBCA6B)
                + jnp.uint32(i) * jnp.uint32(0xC2B2AE35)
            )
            x = x ^ (x >> 16)
            x = x * jnp.uint32(0x85EBCA6B)
            x = x ^ (x >> 13)
            x = x * jnp.uint32(0xC2B2AE35)
            x = x ^ (x >> 16)
            nr = stochastic_round_bf16(nr, x)
        write = jnp.where(first, sorted_ids, v)
        out.append(
            st.at[write].set(
                jnp.where(first[:, None], nr, 0).astype(st.dtype),
                mode="drop",
                unique_indices=True,
            )
        )
    return tuple(out)
