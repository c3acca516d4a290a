"""Shard-local sparse optimizers for embedding tables.

The reference delegates sparse optimization to the TF TPU embedding
engine's on-device C++ updaters (SGD/Adagrad/Adam/FTRL with slot
variables, `tensorflow_recommenders/layers/embedding/tpu_embedding_layer.py:
40-76,1014-1082`), plus rowwise Adagrad (one accumulator scalar per row,
the FBGEMM/TorchRec DLRM default — exceeds the reference's optimizer
set). These are their JAX equivalents: pure functions that
apply row-sparse updates `(table, slots, ids, row_grads) -> (table, slots)`
via scatter ops, touching only the looked-up rows — no dense
vocabulary-sized gradient is ever materialized.

Under `shard_map`/GSPMD each device applies these to its table shard with
the ids/grads routed to it, making the update shard-local exactly like the
SparseCore engine.

Duplicate ids within a batch are handled exactly: `dedupe_sum` folds
duplicate rows' gradients together (static-shape sort + segment-sum) before
the update, so decay-style rules (Adam, FTRL) see each row once.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from recommenders_tpu.embedding import config as config_lib
from recommenders_tpu.ops import sparse_apply

Array = jax.Array
Slots = Dict[str, Array]

PAD_ID = config_lib.PAD_ID

# Optimizer kinds the blocked Pallas apply supports. Clippy needs a
# GLOBAL scalar (min clipping factor across every touched row), which a
# per-block rule cannot compute — it stays on the scatter path.
KERNEL_KINDS = ("sgd", "adagrad", "rowwise_adagrad", "adam", "ftrl")


def dedupe_sum(
    ids: Array, grads: Array, max_unique: Optional[int] = None
) -> Tuple[Array, Array]:
    """Folds gradients of duplicate ids into one entry each.

    Returns `(ids, grads)` where each unique id appears exactly once with
    the summed gradient; the remaining slots are `PAD_ID` with zero
    gradients. `PAD_ID` entries in the input are preserved as padding.

    With `max_unique` set, the output is compacted to that fixed length —
    the TF SparseCore's `max_unique_ids_per_partition` bound
    (tpu_embedding_layer.py's mid-level API config): every downstream
    gather/scatter then works over `max_unique` rows instead of the full
    occurrence count, which is the win when batches are heavily
    duplicated (e.g. 8k-row batches touching a few hundred ids). If a
    step has more unique ids than the bound, the excess rows' updates are
    DROPPED (deterministically: the largest ids, since slots are
    id-sorted) — size the bound for the worst expected step.

    Args:
      ids: `[n]` int row ids (may contain PAD_ID).
      grads: `[n, dim]` per-occurrence gradients.
      max_unique: Optional fixed output length (< n to compact).
    """
    n = ids.shape[0]
    order = jnp.argsort(ids)
    sid = ids[order]
    sgrad = grads[order]
    first = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    segment = jnp.cumsum(first) - 1  # [n] segment index per entry
    # PAD_ID inputs sort first and form segment 0; shift them out so
    # real ids start at slot 0 (otherwise padding burns a bounded slot).
    has_pad = sid[0] == PAD_ID
    segment = jnp.where(has_pad, segment - 1, segment)
    m = n if max_unique is None or max_unique >= n else max_unique
    summed = jax.ops.segment_sum(
        sgrad, segment, num_segments=m, indices_are_sorted=True
    )
    # All entries in a segment share the same id.
    seg_ids = jax.ops.segment_max(
        sid, segment, num_segments=m, indices_are_sorted=True
    )
    slot_valid = jnp.arange(m) <= segment[-1]
    out_ids = jnp.where(slot_valid, seg_ids, PAD_ID)
    out_grads = jnp.where((out_ids != PAD_ID)[:, None], summed, 0.0)
    return out_ids, out_grads


def _unique_ids(ids: Array, num_rows) -> Array:
    """Maps PAD slots to DISTINCT out-of-range rows.

    After `dedupe_sum` every real id appears once; padding slots all carry
    `PAD_ID`, which would otherwise alias one row and force XLA to assume
    duplicate scatter indices (serializing the scatter). Distinct
    out-of-range sentinels keep every index unique, and `mode="drop"` /
    `mode="fill"` make the out-of-range accesses no-ops.
    """
    slot = jnp.arange(ids.shape[0], dtype=ids.dtype)
    return jnp.where(ids == PAD_ID, num_rows + slot, ids)


def init_slots(
    spec: config_lib.OptimizerSpec, table: Array, dtype=None, pack: int = 1
) -> Slots:
    """Creates the slot variables for one table.

    `dtype` defaults to f32 regardless of the table dtype: accumulators
    sum many small squared-gradient increments, which round-to-nearest
    bf16 silently drops once the running value outgrows them (the
    moment adaptive learning rates stop adapting). Storage-constrained
    deployments can pass `jnp.bfloat16` explicitly — with the engine's
    stochastic rounding the accumulation stays unbiased.

    `pack` is the lane-packing factor of `table` (logical rows per
    physical row): full-width slots inherit the packed shape from
    `table.shape` automatically; rowwise slots become `[V/pack, pack]`
    (one scalar lane per logical row).
    """
    dtype = jnp.float32 if dtype is None else dtype
    full = lambda v: jnp.full(table.shape, v, dtype)  # noqa: E731
    if spec.kind == "sgd":
        return {}
    if spec.kind == "adagrad":
        return {"accumulator": full(spec.initial_accumulator_value)}
    if spec.kind == "rowwise_adagrad":
        # ONE accumulator scalar per row (the FBGEMM/TorchRec DLRM
        # default): 1/dim the slot memory and, through the blocked
        # kernel, 1/dim the slot HBM traffic of per-element Adagrad —
        # the update step's usual bound. Adapts the whole row by the
        # mean squared gradient; quality is task-equivalent for
        # embedding rows, whose elements share a scale.
        return {
            "accumulator": jnp.full(
                (table.shape[0], pack),
                spec.initial_accumulator_value,
                dtype,
            )
        }
    if spec.kind == "adam":
        return {"m": full(0.0), "v": full(0.0)}
    if spec.kind == "ftrl":
        return {
            "accumulator": full(spec.initial_accumulator_value),
            "linear": full(0.0),
        }
    if spec.kind == "clippy":
        return {
            "accumulator": full(spec.initial_accumulator_value),
            # Last step's scalar clipping factor (the reference's
            # export_clipping_factors equivalent).
            "clipping_factor": jnp.ones((), dtype),
        }
    raise ValueError(f"Unknown optimizer kind {spec.kind!r}")


def _group_matrix(dp: int, pack: int, dtype=jnp.float32) -> Array:
    """`[dp, pack]` 0/1 matrix with `M[l, s] = (l // (dp/pack) == s)`.

    The lane-packed rules' bridge between per-LOGICAL-row scalars
    ([R, pack]) and packed row lanes ([R, dp]): `x @ M` sums each
    logical row's lane group; `y @ M.T` broadcasts a per-logical-row
    scalar across its group. Built from iota so it traces inside the
    Pallas kernel (no captured constants)."""
    d = dp // pack
    lane = jax.lax.broadcasted_iota(jnp.int32, (dp, pack), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (dp, pack), 1)
    return (lane // d == grp).astype(dtype)


def _kernel_rule(
    spec: config_lib.OptimizerSpec, step: Array, pack: int = 1
):
    """(slot_names, scalars, block_update, needs_count) for the blocked
    Pallas apply.

    Each rule reproduces the scatter path's per-row math exactly, with
    runtime scalars (LR at this step, Adam bias corrections) computed
    outside the kernel and smuggled in through SMEM. Rules must be
    identities for rows with `count == 0` (untouched rows inside a
    touched block). `needs_count` is True for rules that read `count`
    (decay-style rules where zero-grad is not an identity) — returned
    here, next to each rule's definition, so the kernel caller never
    passes `count=0` to a rule that depends on it.

    `pack` > 1 selects the lane-packed variants: blocks arrive in the
    packed [R, pack·d] layout (elementwise rules are unchanged by
    construction), `count` is [R, pack] (one lane per logical row, so
    decay masks expand through `_group_matrix`), and rowwise Adagrad's
    per-logical-row reduction/broadcast runs as two small constant
    matmuls instead of an axis-1 mean.
    """
    lr = jnp.asarray(spec.lr_at(step), jnp.float32)

    if spec.kind == "sgd":

        def rule(states, g, count, sc):
            (table,) = states
            return [table - sc[0] * g]

        return (), jnp.stack([lr]), rule, False

    if spec.kind == "adagrad":

        def rule(states, g, count, sc):
            table, accum = states
            new_accum = accum + jnp.square(g)
            scale = jax.lax.rsqrt(new_accum + 1e-12)
            return [table - sc[0] * g * scale, new_accum]

        return ("accumulator",), jnp.stack([lr]), rule, False

    if spec.kind == "rowwise_adagrad":
        if pack > 1:

            def rule(states, g, count, sc, pack=pack):
                table, accum = states       # accum: [R, pack]
                dp = g.shape[1]
                grp = _group_matrix(dp, pack)
                # HIGHEST precision: the MXU's default f32 matmul
                # runs bf16 passes, which compiled-vs-interpret
                # divergence on the chip exposed at 3e-4 (the on-chip
                # packed-rules gate); these matmuls are tiny.
                mean = jax.lax.dot_general(
                    jnp.square(g), grp,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                ) * (pack / dp)
                new_accum = accum + mean
                scale = jax.lax.rsqrt(new_accum + 1e-12)
                scale_b = jax.lax.dot_general(
                    scale, grp,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                return [table - sc[0] * g * scale_b, new_accum]

        else:

            def rule(states, g, count, sc):
                table, accum = states           # accum: [R, 1]
                new_accum = accum + jnp.mean(
                    jnp.square(g), axis=1, keepdims=True
                )
                scale = jax.lax.rsqrt(new_accum + 1e-12)
                return [table - sc[0] * g * scale, new_accum]

        return ("accumulator",), jnp.stack([lr]), rule, False

    def expand_count(count, dp, pack=pack):
        """[R, pack] per-logical-row counts → [R, dp] lane mask."""
        if pack == 1:
            return count            # [R, 1] broadcasts over lanes
        return jax.lax.dot_general(
            count, _group_matrix(dp, pack),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    if spec.kind == "adam":
        t = step.astype(jnp.float32) + 1.0
        scalars = jnp.stack(
            [lr, 1.0 - spec.beta1**t, 1.0 - spec.beta2**t]
        )

        def rule(states, g, count, sc, spec=spec):
            table, m, v = states
            lr_t, bc1, bc2 = sc
            touched = expand_count(count, g.shape[1]) > 0
            m_rows = spec.beta1 * m + (1 - spec.beta1) * g
            v_rows = spec.beta2 * v + (1 - spec.beta2) * jnp.square(g)
            delta = -lr_t * (m_rows / bc1) / (
                jnp.sqrt(v_rows / bc2) + spec.epsilon
            )
            return [
                table + jnp.where(touched, delta, 0.0),
                jnp.where(touched, m_rows, m),
                jnp.where(touched, v_rows, v),
            ]

        return ("m", "v"), scalars, rule, True

    if spec.kind == "ftrl":

        def rule(states, g, count, sc, spec=spec):
            table, accum, linear = states
            lr_t = sc[0]
            lrp = spec.learning_rate_power
            l1 = spec.l1_regularization_strength
            l2 = spec.l2_regularization_strength
            touched = expand_count(count, g.shape[1]) > 0
            n_new = accum + jnp.square(g)
            sigma = (
                jnp.power(n_new, -lrp) - jnp.power(accum, -lrp)
            ) / lr_t
            z_new = linear + g - sigma * table
            denom = jnp.power(n_new, -lrp) / lr_t + 2 * l2
            w_new = jnp.where(
                jnp.abs(z_new) > l1,
                (jnp.sign(z_new) * l1 - z_new) / denom,
                0.0,
            )
            return [
                jnp.where(touched, w_new, table),
                jnp.where(touched, n_new, accum),
                jnp.where(touched, z_new, linear),
            ]

        return ("accumulator", "linear"), jnp.stack([lr]), rule, True

    raise ValueError(f"No kernel rule for optimizer kind {spec.kind!r}")


def _apply_sparse_kernel(
    spec: config_lib.OptimizerSpec,
    table: Array,
    slots: Slots,
    ids: Array,
    grads: Array,
    step: Array,
    max_unique: Optional[int],
    block_rows: Optional[int] = None,
    chunk: Optional[int] = None,
    sr_seed: Optional[Array] = None,
    exact_routing: bool = True,
    pack: int = 1,
) -> Optional[Tuple[Array, Slots]]:
    """Blocked-kernel formulation of `apply_sparse`; None if unsupported.

    Skips the scatter pipeline entirely: the kernel's routing matmul
    sums duplicate ids itself, so (unless `max_unique` bounds the update
    size) no `dedupe_sum`/segment-sum runs — just one id sort. Off-TPU
    the kernel runs interpreted (tests); real deployments hit this path
    on TPU via `apply_sparse(use_kernel=True)`.

    `pack` > 1 means `table`/full slots are lane-packed `[V/pack,
    pack·d]` (rowwise slots `[V/pack, pack]`) while `ids`/`grads` stay
    logical — see `sparse_apply.sorted_block_apply(sub_pack=...)`.
    """
    v = table.shape[0] * pack           # LOGICAL rows
    slot_names, scalars, rule, needs_count = _kernel_rule(
        spec, step, pack
    )
    if chunk is None:
        # Larger chunks amortize per-grid-step overhead once the update
        # list is long (v5e probe at the headline shape: c256 329 us vs
        # c128 340 us); short lists keep c128 so chunk padding stays
        # bounded. The kernel runs over the POST-dedupe list when
        # max_unique compacts it, so size the chunk to that length.
        n_eff = ids.shape[0]
        if max_unique is not None:
            n_eff = min(n_eff, max_unique)
        chunk = 256 if n_eff >= 2048 else 128
    if block_rows is None:
        import os

        env_br = os.environ.get("RTPU_SPARSE_BLOCK_ROWS")
        if env_br:
            # Perf escape hatch for A/B tuning on real hardware; the
            # auto model below picks well, but the tunnel's session
            # variance makes controlled same-session sweeps valuable.
            block_rows = int(env_br)
    if block_rows is None:
        # Largest power-of-two ≤ 4096 whose modeled VMEM working set
        # fits a 12 MB budget (16 MB VMEM minus aug-chunk buffers and
        # Mosaic overheads). The model accounts per state array with
        # its REAL dtype and VMEM lane padding (a [br, w] block
        # occupies ceil(w/128)·128 lanes in VMEM regardless of w), in
        # + out double-buffered, plus the f32 routing scratch — which
        # reproduces Mosaic's measured allocations: br=4096 d=64 f32
        # 2-state predicts 18.9 MB vs 19.4 measured (the old f32-only
        # model called it 10.5 and needed a fudge factor), and the
        # round-5 packed bf16-slot configs predict ~10.5 MB at
        # br=4096, which compiles and measures FASTEST (26-table
        # packed sweep: br=4096 3191 us vs the old pick's 3571,
        # /tmp-probe round 5; headline re-benched below). Fewer,
        # bigger blocks win because per-grid-step pipeline overhead is
        # ~0.7 us/pair (benchmarks/_kernel_floor_probe.py).
        d_phys = table.shape[1]
        p_lanes = (2 * d_phys if exact_routing else d_phys) + (
            pack if needs_count else 0
        )

        def lane_pad(w):
            return -(-w // 128) * 128

        def plane_bytes(arr):
            w = arr.shape[-1]
            if w > 8:
                # Validated against real Mosaic allocations: d=64 f32
                # 2-state at br=4096 predicts 18.9 MB vs 19.4 measured.
                # itemsize clamps to 4: Mosaic stages bf16 state blocks
                # at ~f32 cost — a bf16 2-state kernel modeled at
                # 10.5 MB by true itemsize compiled at 16.07 MB scoped
                # VMEM, 68 KB from the 16 MB cliff (one same-shape
                # compile DID trip it, round 5); the clamp lands the
                # same configs on br=3072, measured perf-neutral
                # (same-session A/B tie) and ~4 MB clear of the limit.
                return 4 * lane_pad(w) * max(arr.dtype.itemsize, 4)
            # Very narrow planes (rowwise slots, w = pack ≤ 8) measure
            # FAR above the padded-lane model: a [6144, 2] bf16 slot
            # plane pushed the kernel's real scoped-VMEM to 25.1 MB
            # where full-width accounting predicts 15 (compile-time
            # OOM, round 5). Charge them at f32 full-lane cost plus
            # slack — empirical, calibrated so the rowwise headline
            # picks br=3072 (fits, measured) and not 4096 (OOMs).
            return 4 * 128 * 4 + 1024

        row_bytes = sum(
            plane_bytes(arr)
            for arr in (table, *(slots[nm] for nm in slot_names))
        ) + 4 * lane_pad(p_lanes)
        # 15 MB of the 16 MB VMEM: round 4 shipped br=3072 at d=64
        # f32 slots — 14.6 MB by this model — for a full round of
        # on-chip runs; the aug-chunk buffers are ~0.25 MB.
        budget = 15 << 20
        block_rows = 4096
        while block_rows > 8 and block_rows * row_bytes > budget:
            block_rows //= 2
        # 3/2× upgrade: a 3·2^k block size that divides V cuts the
        # sweep's grid-step count 33% vs the 2^k pick (headline shape,
        # measured round 4: br=3072 307.8 us vs br=2048 328.1 us).
        v_phys = table.shape[0]
        pick = sparse_apply._pick_block_rows(v_phys, block_rows)
        up = pick * 3 // 2
        if (
            pick
            and up % 8 == 0
            and v_phys % up == 0
            and up * row_bytes <= budget
        ):
            block_rows = up
    if sparse_apply._pick_block_rows(table.shape[0], block_rows) == 0:
        return None
    if max_unique is not None and max_unique < ids.shape[0]:
        # Bounded dedupe first: output ids are ascending with PAD_ID
        # (which maps to the dropped row V) in the trailing slots.
        ids, grads = dedupe_sum(ids, grads, max_unique)
        sorted_ids = jnp.where(ids == PAD_ID, v, ids).astype(jnp.int32)
        sorted_grads = grads
    else:
        mapped = jnp.where(
            (ids < 0) | (ids >= v), v, ids
        ).astype(jnp.int32)
        n = mapped.shape[0]
        nbits = max(1, (n - 1).bit_length())
        if (v + 1) << nbits <= 1 << 32:
            # Single-operand sort: pack (id, position) into one uint32
            # key — `lax.sort` then moves ONE array through the sorting
            # network instead of argsort's (key, iota) pair, roughly
            # halving the per-step sort traffic (~60 us at the headline
            # shape). Exact while (V+1)·2^ceil(log2 n) fits 32 bits —
            # any realistic (vocab, batch) pair; else plain argsort.
            key = (
                mapped.astype(jnp.uint32) << nbits
            ) | jnp.arange(n, dtype=jnp.uint32)
            key = jax.lax.sort(key)
            sorted_ids = (key >> nbits).astype(jnp.int32)
            order = (key & ((1 << nbits) - 1)).astype(jnp.int32)
        else:
            order = jnp.argsort(mapped)
            sorted_ids = mapped[order]
        sorted_grads = grads[order]
    states = (table,) + tuple(slots[nm] for nm in slot_names)
    new_states = sparse_apply.sorted_block_apply(
        states,
        sorted_ids,
        sorted_grads.astype(jnp.float32),
        rule,
        scalars=scalars,
        block_rows=block_rows,
        chunk=chunk,
        stochastic_round_seed=sr_seed,
        exact_routing=exact_routing,
        # SGD/Adagrad are gradient-homogeneous (zero grad is already an
        # identity), so the routing matmul drops the ones lane — at
        # d = 64 exact hi+lo routing then fits one 128-lane MXU tile.
        need_count=needs_count,
        sub_pack=pack,
        interpret=jax.default_backend() != "tpu",
    )
    new_slots = dict(slots)
    for nm, arr in zip(slot_names, new_states[1:]):
        new_slots[nm] = arr
    return new_states[0], new_slots


def apply_sparse(
    spec: config_lib.OptimizerSpec,
    table: Array,
    slots: Slots,
    ids: Array,
    grads: Array,
    step: Array,
    max_unique: Optional[int] = None,
    use_kernel: bool = False,
    sr_seed: Optional[Array] = None,
    exact_routing: bool = True,
    pack: int = 1,
) -> Tuple[Array, Slots]:
    """Applies one sparse update. `ids: [n]`, `grads: [n, dim]`.

    `sr_seed` (int32 scalar, unique per step and table) enables
    stochastic rounding of bf16 state on the kernel path; the scatter
    path rounds to nearest (GSPMD deployments wanting unbiased bf16
    should keep tables f32 or route through the kernel).

    Duplicate ids are folded first, so each row receives exactly one
    update regardless of how many batch elements touched it; all scatters
    then carry `unique_indices=True` (padding slots map to distinct
    out-of-range rows dropped by the scatter), letting XLA parallelize
    the row updates. `max_unique` (TableConfig.max_unique_ids) compacts
    the deduplicated update to a fixed length — see `dedupe_sum`.

    With `use_kernel=True` (and a supported optimizer kind / table
    shape) the update runs through the sorted blocked Pallas kernel
    (`ops/sparse_apply.py`) instead of XLA scatters — same math, but the
    update is dense block-wise MXU/VPU work instead of a sequential
    per-row scatter loop. Intended for unsharded (shard-local) tables on
    TPU; under GSPMD auto-sharding keep the scatter path.
    """
    if pack > 1:
        # Lane-packed state exists only for the kernel path; the
        # scatter formulation below reads/writes LOGICAL rows and
        # cannot express sub-row lane updates without read-modify-write
        # hazards between logical rows sharing a physical row.
        if not (use_kernel and spec.kind in KERNEL_KINDS):
            raise ValueError(
                f"Lane-packed tables (pack={pack}) require the blocked "
                f"update kernel and a supported optimizer kind "
                f"{KERNEL_KINDS}; got use_kernel={use_kernel}, "
                f"kind={spec.kind!r}. Build the engine with "
                f"lane_pack=False for the scatter path."
            )
        result = _apply_sparse_kernel(
            spec, table, slots, ids, grads, step, max_unique,
            sr_seed=sr_seed, exact_routing=exact_routing, pack=pack,
        )
        if result is None:
            raise ValueError(
                "Lane-packed update kernel found no block size dividing "
                f"the packed table's {table.shape[0]} physical rows; "
                "pad the table or build with lane_pack=False."
            )
        return result
    if use_kernel and spec.kind in KERNEL_KINDS:
        result = _apply_sparse_kernel(
            spec, table, slots, ids, grads, step, max_unique,
            sr_seed=sr_seed, exact_routing=exact_routing,
        )
        if result is not None:
            return result
    ids, grads = dedupe_sum(ids, grads, max_unique)
    uids = _unique_ids(ids, table.shape[0])
    # Learning rate at this step (float, or the schedule evaluated on the
    # traced step counter — the reference's dynamic-LR translation,
    # tpu_embedding_layer.py:1014-1082).
    lr = spec.lr_at(step)

    def read(buf, fill=0.0):
        return buf.at[uids].get(mode="fill", fill_value=fill)

    def add(buf, rows):
        # Explicit round-to-nearest for bf16 state: scatters with
        # mismatched dtypes are a FutureWarning (soon an error) in JAX.
        rows = rows.astype(buf.dtype)
        return buf.at[uids].add(rows, mode="drop", unique_indices=True)

    def put(buf, rows):
        rows = rows.astype(buf.dtype)
        return buf.at[uids].set(rows, mode="drop", unique_indices=True)

    if spec.kind == "sgd":
        return add(table, -lr * grads), slots

    if spec.kind == "adagrad":
        accum = add(slots["accumulator"], jnp.square(grads))
        scale = jax.lax.rsqrt(read(accum, fill=1.0) + 1e-12)
        table = add(table, -lr * grads * scale)
        return table, {"accumulator": accum}

    if spec.kind == "rowwise_adagrad":
        # [V, 1] scalar accumulator per row (see `init_slots`).
        accum = add(
            slots["accumulator"],
            jnp.mean(jnp.square(grads), axis=1, keepdims=True),
        )
        scale = jax.lax.rsqrt(read(accum, fill=1.0) + 1e-12)
        table = add(table, -lr * grads * scale)
        return table, {"accumulator": accum}

    if spec.kind == "adam":
        # Lazy Adam: moments decay only on touched rows (like the TPU
        # embedding engine's sparse Adam).
        m, v = slots["m"], slots["v"]
        m_rows = spec.beta1 * read(m) + (1 - spec.beta1) * grads
        v_rows = spec.beta2 * read(v) + (1 - spec.beta2) * jnp.square(
            grads
        )
        t = step.astype(jnp.float32) + 1.0
        m_hat = m_rows / (1 - spec.beta1**t)
        v_hat = v_rows / (1 - spec.beta2**t)
        delta = -lr * m_hat / (
            jnp.sqrt(v_hat) + spec.epsilon
        )
        return add(table, delta), {"m": put(m, m_rows), "v": put(v, v_rows)}

    if spec.kind == "clippy":
        # Sparse ClippyAdagrad: the reference's IndexedSlices path
        # (experimental/optimizers/clippy_adagrad.py:188-254). The
        # clipping factor is a single scalar over the touched rows;
        # padding slots contribute delta == 0, whose per-element scale is
        # defined as 1 (shrink_by_references semantics), so they never
        # tighten the clip.
        accum = slots["accumulator"]
        if spec.use_standard_accumulator_update:
            accum = add(accum, jnp.square(grads))
        w = read(table)
        a = read(accum, fill=1.0)
        precondition = jax.lax.rsqrt(a + spec.epsilon)
        delta = lr * grads * precondition
        max_delta = (
            spec.absolute_threshold
            + jnp.abs(w) * spec.variable_relative_threshold
            + precondition * spec.accumulator_relative_threshold
        )
        abs_delta = jnp.abs(delta)
        per_element = jnp.where(
            delta == 0.0,
            1.0,
            jnp.where(abs_delta > 0.0, max_delta / abs_delta, 1.0),
        )
        factor = jnp.minimum(1.0, jnp.min(per_element))
        if not spec.use_standard_accumulator_update:
            acc_update = (
                grads * factor if spec.clip_accumulator_update else grads
            )
            accum = add(accum, jnp.square(acc_update))
        table = add(table, -delta * factor)
        return table, {
            "accumulator": accum,
            "clipping_factor": factor.astype(table.dtype),
        }

    if spec.kind == "ftrl":
        accum, linear = slots["accumulator"], slots["linear"]
        lrp = spec.learning_rate_power
        l1 = spec.l1_regularization_strength
        l2 = spec.l2_regularization_strength
        w = read(table)
        n_old = read(accum, fill=1.0)
        n_new = n_old + jnp.square(grads)
        sigma = (jnp.power(n_new, -lrp) - jnp.power(n_old, -lrp)) / lr
        z_new = read(linear) + grads - sigma * w
        denom = jnp.power(n_new, -lrp) / lr + 2 * l2
        w_new = jnp.where(
            jnp.abs(z_new) > l1,
            (jnp.sign(z_new) * l1 - z_new) / denom,
            0.0,
        )
        return (
            put(table, w_new),
            {"accumulator": put(accum, n_new), "linear": put(linear, z_new)},
        )

    raise ValueError(f"Unknown optimizer kind {spec.kind!r}")
