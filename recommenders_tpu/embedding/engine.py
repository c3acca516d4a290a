"""Decoupled embedding engine: sparse lookups and updates outside autodiff.

TPU-native counterpart of the TF TPU embedding engine's architecture
(`tensorflow_recommenders/layers/embedding/tpu_embedding_layer.py:757-856`
and SURVEY.md §3.4): embedding tables are *not* ordinary autodiffed
parameters. The reference bridges lookup/update into the Keras step with
enqueue/dequeue host channels and a `tf.custom_gradient` trap around a
dummy variable; in JAX the same decoupling is purely functional:

    engine = EmbeddingEngine(feature_configs, mesh=mesh)
    estate = engine.init(rng)
    acts = engine.lookup(estate, features)             # gather + combine

    def loss_fn(dense_params, acts):
        ...                                            # dense model
    (loss, _), (dgrads, agrads) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(dense_params, acts)

    estate = engine.update(estate, features, agrads)   # row-sparse update

`update` converts activation gradients back to per-row gradients
(inverting the combiner), folds duplicates, and applies the per-table
sparse optimizer (SGD/Adagrad/rowwise-Adagrad/Adam/FTRL with slot state,
`recommenders_tpu.embedding.sparse_optimizer`) through scatter ops that
touch only looked-up rows — a dense `[vocab, dim]` gradient is never
materialized, which is what makes 100M-row tables trainable.

Tables are row-sharded over the mesh's model axis; XLA's GSPMD inserts the
cross-shard id/gradient routing for the gathers and scatter-adds (the role
of the SparseCore's internal all-to-all). The whole step stays inside one
`jit`, so lookup, dense compute, and update fuse into one program.

Use the autodiff path (`embedding.TpuEmbedding`) when tables are small
enough that dense gradients are acceptable; the engine is the scale path.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from recommenders_tpu.embedding import config as config_lib
from recommenders_tpu.embedding import embedding as embedding_lib
from recommenders_tpu.embedding import sparse_optimizer
from recommenders_tpu.parallel import mesh as mesh_lib

Array = jax.Array
FeatureInput = embedding_lib.FeatureInput

PAD_ID = config_lib.PAD_ID


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EngineState:
    """All engine state: one pytree, checkpointable with orbax."""

    tables: Dict[str, Array]
    slots: Dict[str, Dict[str, Array]]
    step: Array


def _split_feature(
    feature: FeatureInput,
) -> Tuple[Array, Optional[Array]]:
    if isinstance(feature, tuple):
        return feature
    return feature, None


class EmbeddingEngine:
    """Sharded embedding tables with decoupled sparse optimization.

    Attributes:
      feature_configs: Feature declarations (tables may be shared).
      optimizer: Default `OptimizerSpec` for tables that don't set one.
      mesh: Device mesh; None runs unsharded (single device / CPU).
      table_axis: Mesh axis name over which table rows shard.
      dtype: Table dtype.
      row_sharding: How logical rows map to shards: "div" (contiguous
        blocks, the GSPMD default) or "mod" (row r on shard r % S, the TF
        TPU embedding engine's layout — spreads hot low-id rows across
        shards for skewed id distributions). "mod" stores tables in a
        physically permuted layout and translates ids on lookup/update;
        use `logical_tables` to read rows in logical order.
      sparse_update_kernel: Apply sparse optimizer updates through the
        sorted blocked Pallas kernel (`ops/sparse_apply.py`) instead of
        XLA scatters — the TensorCore stand-in for the reference's
        SparseCore update hardware. Default (None) auto-enables on TPU
        for unsharded engines. On a MESHED engine, True runs the
        kernel SHARD-LOCAL inside shard_map (each shard rebases the
        gathered id/grad list to its contiguous row range and sweeps
        its own table shard — the SparseCore SPMD architecture;
        pallas_call does not partition under plain GSPMD, which is why
        the meshed default stays the scatter path).
      slot_dtype: Optimizer-slot dtype; None → f32 even for bf16 tables
        (accumulator sums must not be swallowed by bf16 rounding). Pass
        `jnp.bfloat16` to halve slot memory — safe with stochastic
        rounding, which keeps the accumulation unbiased.
      stochastic_rounding: Round bf16 state writes stochastically on the
        kernel update path (unbiased: tiny updates land in expectation
        instead of vanishing — the production recipe for half-precision
        embedding training). No effect on f32 state. The GSPMD scatter
        path rounds to nearest regardless.
      exact_grad_routing: The update kernel's grad-routing matmul uses
        a bf16 hi+lo split (near-f32 exact duplicate sums; default).
        Both lanes pack into ONE matmul, so at dim ≤ 63 (plus SGD /
        Adagrad's count-free path at dim = 64) exactness fills the same
        128-lane MXU tile a single lossy pass would — free. False =
        hi lane only (~8 mantissa bits on the routed sums); only worth
        considering for wider rows, where the split doubles routing
        lanes.
      stack_tables: Store tables that share (dim, optimizer) as row
        ranges of ONE physical array — the TF TPU embedding engine's
        table stacking (the reference's backing API stacks compatible
        tables per SparseCore to amortize per-table overheads;
        tpu_embedding_layer.py:757-856 delegates to it). Here it means
        one id sort, one pair-list construction, and one blocked-kernel
        sweep per step for the whole group instead of per table — the
        per-table fixed costs dominate for many-small-table models
        (DLRM-style). Lookups/updates translate ids by the member's row
        offset; `logical_tables` returns per-table views. Requires
        `row_sharding="div"`; tables with `max_unique_ids` stay solo
        (the bound is per-table). Checkpoints store the stacked layout —
        move between layouts with `logical_state`/`state_from_logical`
        (slots included). Measured (v5e): +3% on a 2-table step;
        at 26 Criteo-style tables stacking won 1.57× in round 4, but
        lane packing (round 5) shrank the per-table fixed costs it
        amortizes and FLIPPED the regime — 26 independent per-table
        kernels now beat the single serialized stacked sweep (4.39 vs
        5.64 ms/step, docs/PARITY.md round 5). Measure your shape;
        group storage pads so the update kernel's block size never
        collapses either way.
      lane_pack: Store narrow-dim tables (d < 128, d | 128) lane-packed:
        128/d consecutive logical rows per physical 128-lane storage row
        (`[V·d/128, 128]` arrays; rowwise slots `[V·d/128, 128/d]`).
        Forward gathers move full-lane rows (no narrow-dim layout
        pathologies), and the blocked update kernel routes against
        128/d× fewer physical rows at full MXU tile width — the
        dominant cost of the many-table step (docs/PARITY.md round 5).
        Default (None) auto-enables wherever the kernel path runs
        (unsharded, div sharding, supported optimizer kinds); packed
        state requires the kernel (no scatter fallback). Checkpoints
        store the packed layout — move between layouts with
        `logical_state`/`state_from_logical` (slots included).
    """

    def __init__(
        self,
        feature_configs,
        optimizer: Optional[config_lib.OptimizerSpec] = None,
        mesh: Optional[Mesh] = None,
        table_axis: str = mesh_lib.MODEL_AXIS,
        dtype=jnp.float32,
        row_sharding: str = "div",
        sparse_update_kernel: Optional[bool] = None,
        slot_dtype=None,
        stochastic_rounding: bool = True,
        stack_tables: bool = False,
        exact_grad_routing: bool = True,
        lane_pack: Optional[bool] = None,
    ) -> None:
        if row_sharding not in ("div", "mod"):
            raise ValueError(
                f"row_sharding must be 'div' or 'mod', got {row_sharding!r}"
            )
        if stack_tables and row_sharding == "mod":
            raise ValueError(
                "stack_tables requires row_sharding='div' (the mod "
                "permutation is per-table)."
            )
        if lane_pack and row_sharding == "mod":
            raise ValueError(
                "lane_pack requires row_sharding='div' (packed rows "
                "must stay contiguous per shard)."
            )
        if lane_pack and mesh is not None and sparse_update_kernel is not True:
            raise ValueError(
                "lane_pack on a meshed engine requires "
                "sparse_update_kernel=True: packed state updates only "
                "through the blocked kernel, which runs shard-local "
                "inside shard_map (the GSPMD scatter path cannot "
                "express sub-row lane writes)."
            )
        self.feature_configs = tuple(feature_configs)
        self.default_optimizer = optimizer or config_lib.OptimizerSpec()
        self.mesh = mesh
        self.table_axis = table_axis
        self.dtype = dtype
        self.row_sharding = row_sharding
        self.sparse_update_kernel = sparse_update_kernel
        self.slot_dtype = slot_dtype  # None → f32 (see init_slots)
        self.stochastic_rounding = stochastic_rounding
        self.stack_tables = stack_tables
        self.exact_grad_routing = exact_grad_routing
        # Lane packing stores a narrow table's rows side by side in
        # full 128-lane physical rows ([V·d/128, 128] storage): the
        # forward gather moves full-lane rows (no layout pathologies at
        # d < 64 — round 4 paid a per-step whole-table retile for the
        # same effect), and the update kernel routes against 128/d×
        # fewer physical rows at full MXU tile width (the V·chunk
        # routing-compare term dominated the many-table step; see
        # docs/PARITY.md round 5). Auto-enables where the blocked
        # kernel path runs ON TPU (unsharded, div, kernel on); CPU
        # runs — interpret-mode tests — opt in explicitly so layouts
        # stay inspection-friendly there.
        if lane_pack is None:
            kernel_on = (
                sparse_update_kernel
                if sparse_update_kernel is not None
                else (mesh is None)
            )
            lane_pack = bool(
                kernel_on
                and mesh is None
                and row_sharding == "div"
                and jax.default_backend() == "tpu"
            )
        self.lane_pack = lane_pack

        self._tables: Dict[str, config_lib.TableConfig] = {}
        for fc in self.feature_configs:
            existing = self._tables.get(fc.table.name)
            if existing is not None and existing != fc.table:
                raise ValueError(
                    f"Two different TableConfigs share the name "
                    f"{fc.table.name!r}."
                )
            self._tables[fc.table.name] = fc.table
        self._configs = {fc.name: fc for fc in self.feature_configs}

        # Physical storage map: every logical table lives at a row
        # offset inside a storage array (its own, unless stacked).
        # _storage: table name -> (storage name, row offset);
        # _storage_members: storage name -> [table names], in offset
        # order. Iteration order (and so rng-consumption order in
        # `init`) follows feature declaration order either way, keeping
        # stacked and unstacked initializations identical per table.
        self._storage: Dict[str, Tuple[str, int]] = {}
        self._storage_members: Dict[str, list] = {}
        self._stack_pad: Dict[str, int] = {}
        self._pack: Dict[str, int] = {}
        if stack_tables:
            groups: Dict = {}
            for name, tc in self._tables.items():
                if tc.max_unique_ids is not None:
                    groups[("solo", name)] = [name]
                else:
                    key = ("stack", tc.dim, self._spec(tc))
                    groups.setdefault(key, []).append(name)
            for key, members in groups.items():
                if len(members) == 1:
                    name = members[0]
                    self._storage[name] = (name, 0)
                    self._storage_members[name] = [name]
                    continue
                sname = "stacked:" + "+".join(members)
                off = 0
                for name in members:
                    self._storage[name] = (sname, off)
                    off += self._padded_rows(self._tables[name])
                self._storage_members[sname] = list(members)
        else:
            for name in self._tables:
                self._storage[name] = (name, 0)
                self._storage_members[name] = [name]
        for sname, members in self._storage_members.items():
            tc = self._tables[members[0]]
            self._pack[sname] = self._pack_of(tc)
        for sname, members in self._storage_members.items():
            rows = sum(
                self._padded_rows(self._tables[m]) for m in members
            )
            pack = self._pack[sname]
            # Pad storage rows so the blocked update kernel keeps a
            # power-of-two PHYSICAL block size that DIVIDES the storage:
            # an unpadded many-table group (row multiple 128) can force
            # block_rows down to 128 — at 26 Criteo-style tables that is
            # ~35k grid steps of ~0.7 us pipeline overhead each, the
            # whole reason stacking measured SLOWER than per-table in
            # round 3 (docs/PARITY.md). Lane packing divides rows by
            # `pack`, so packed storage pads to a 2048·pack multiple
            # (128·pack for small tables — full 2048-blocks would be
            # mostly padding there). Tail rows are unaddressable (ids
            # map inside member tables) and never stream: the kernel's
            # pair list only includes touched blocks.
            if len(members) > 1 or pack > 1:
                # Packed storage pads to a 6144·pack multiple (lcm of
                # the 2048 base block and the 3/2-upgraded 3072 block,
                # per physical row): the auto-picker's 3·2^k upgrade
                # then always divides, ≤0.5% extra rows at the scales
                # where full blocks matter.
                target = (6144 if pack > 1 else 2048) * pack
                if rows < target:
                    target = 128 * pack
                self._stack_pad[sname] = -rows % target

    def _spec(self, tc: config_lib.TableConfig) -> config_lib.OptimizerSpec:
        return tc.optimizer or self.default_optimizer

    def _pack_of(self, tc: config_lib.TableConfig) -> int:
        """Lane-packing factor for a table's storage (1 = unpacked).

        Packs only dims that tile 128 lanes exactly and optimizers the
        blocked kernel supports (packed state cannot take the scatter
        path — see `sparse_optimizer.apply_sparse`)."""
        if not self.lane_pack:
            return 1
        d = tc.dim
        if d >= 128 or 128 % d != 0:
            return 1
        if self._spec(tc).kind not in sparse_optimizer.KERNEL_KINDS:
            return 1
        return 128 // d

    def _sharding(self) -> Optional[NamedSharding]:
        if self.mesh is None:
            return None
        return NamedSharding(self.mesh, P(self.table_axis, None))

    # --- Mod-sharding row permutation -------------------------------------
    #
    # "mod" places logical row r on shard r % S. Implemented as a physical
    # permutation under ordinary contiguous GSPMD sharding: with P padded
    # rows and rows-per-shard R = P / S,
    #     physical(r) = (r % S) * R + r // S
    # so shard s's contiguous block [s·R, (s+1)·R) holds exactly the rows
    # {r : r % S == s}. Ids translate with two integer ops; everything
    # downstream (gather, scatter, slots) is layout-agnostic.

    def _num_shards(self) -> int:
        if self.mesh is None:
            return 1
        return self.mesh.shape[self.table_axis]

    def _padded_rows(self, tc: config_lib.TableConfig) -> int:
        return embedding_lib._pad_vocab(tc.vocabulary_size)

    def _to_physical(self, ids: Array, tc: config_lib.TableConfig) -> Array:
        """Logical → physical ids within the table's storage array:
        the mod-sharding permutation (identity under div) plus the
        table's row offset when stacked. PAD_ID and other negatives
        pass through untouched."""
        s = self._num_shards()
        if self.row_sharding == "mod" and s > 1:
            rows_per_shard = self._padded_rows(tc) // s
            phys = (ids % s) * rows_per_shard + ids // s
            return jnp.where(ids < 0, ids, phys)
        _, offset = self._storage[tc.name]
        if offset:
            return jnp.where(ids < 0, ids, ids + offset)
        return ids

    def _physical_permutation(self, tc: config_lib.TableConfig) -> Array:
        """`perm[p] = logical row stored at physical slot p`."""
        s = self._num_shards()
        padded = self._padded_rows(tc)
        rows_per_shard = padded // s
        p = jnp.arange(padded, dtype=jnp.int32)
        return (p % rows_per_shard) * s + p // rows_per_shard

    def logical_tables(self, state: "EngineState") -> Dict[str, Array]:
        """Tables with rows in logical id order (for export/inspection).

        Under "div" sharding this is the stored layout; under "mod" the
        physical permutation is inverted. Mod-sharded `EngineState`
        checkpoints are topology-dependent (the physical layout bakes in
        the shard count, like the TF engine's sharded checkpoints,
        tpu_embedding_layer.py:940-957); round-trip through this method
        to move between topologies.
        """
        if self.row_sharding == "mod" and self._num_shards() > 1:
            out = {}
            for name, tc in self._tables.items():
                inverse = self._to_physical(
                    jnp.arange(self._padded_rows(tc), dtype=jnp.int32), tc
                )
                out[name] = jnp.take(state.tables[name], inverse, axis=0)
            return out
        out = {}
        for name, tc in self._tables.items():
            sname, offset = self._storage[name]
            arr = state.tables[sname]
            pack = self._pack[sname]
            if pack > 1:
                # Inverse of the init-time row-major packing.
                arr = arr.reshape(arr.shape[0] * pack, tc.dim)
            rows = self._padded_rows(tc)
            if sname != name or arr.shape[0] != rows:
                arr = jax.lax.slice_in_dim(
                    arr, offset, offset + rows, axis=0
                )
            out[name] = arr
        return out

    # --- Cross-layout state movement --------------------------------------
    #
    # Engine state layout bakes in stacking, lane packing, and padding;
    # `logical_state` / `state_from_logical` convert to and from a
    # layout-free per-table representation so checkpoints move between
    # engines with different layouts (stacked ↔ unstacked, packed ↔
    # unpacked) WITHOUT losing optimizer slots — the counterpart of the
    # reference engine's checkpoint-layout compatibility machinery
    # (tpu_embedding_layer.py:499-533,940-967).

    def _unpack_plane(self, arr: Array, sname: str, width: int) -> Array:
        """Packed storage plane → logical row layout."""
        pack = self._pack[sname]
        if pack > 1:
            arr = arr.reshape(arr.shape[0] * pack, width)
        return arr

    def logical_state(self, state: EngineState) -> Dict:
        """`{"tables": {name: [V, d]}, "slots": {name: {slot: rows}},
        "step": step}` — per-LOGICAL-table arrays, layout-free.

        Rowwise slots come back `[V, 1]`, full-width slots `[V, d]`.
        Scalar slots (clippy's clipping_factor) are per-storage and are
        replicated to each member table. Requires "div" sharding (mod
        layouts go through `logical_tables`' permutation instead).
        """
        if self.row_sharding == "mod" and self._num_shards() > 1:
            raise ValueError(
                "logical_state supports row_sharding='div'; mod "
                "layouts are topology-bound (see logical_tables)."
            )
        tables = self.logical_tables(state)
        slots: Dict[str, Dict[str, Array]] = {name: {} for name in tables}
        for sname, members in self._storage_members.items():
            storage_rows = state.tables[sname].shape[0]
            for slot_name, arr in state.slots[sname].items():
                if arr.ndim != 2 or arr.shape[0] != storage_rows:
                    for name in members:   # scalar slot: replicate.
                        slots[name][slot_name] = arr
                    continue
                pack = self._pack[sname]
                width = arr.shape[1] // pack if pack > 1 else arr.shape[1]
                flat = self._unpack_plane(arr, sname, width)
                for name in members:
                    tc = self._tables[name]
                    _, offset = self._storage[name]
                    slots[name][slot_name] = jax.lax.slice_in_dim(
                        flat, offset, offset + self._padded_rows(tc),
                        axis=0,
                    )
        return {"tables": tables, "slots": slots, "step": state.step}

    def state_from_logical(self, logical: Dict) -> EngineState:
        """Assembles THIS engine's `EngineState` from `logical_state`
        output (possibly produced by an engine with a different
        stacking/packing layout). Feature/table declarations and
        optimizer specs must match."""
        if self.row_sharding == "mod" and self._num_shards() > 1:
            raise ValueError(
                "state_from_logical supports row_sharding='div'."
            )
        tables: Dict[str, Array] = {}
        slots: Dict[str, Dict[str, Array]] = {}
        for sname, members in self._storage_members.items():
            pack = self._pack[sname]
            pad = self._stack_pad.get(sname, 0)
            dim = self._tables[members[0]].dim

            def assemble(parts, width, pad_rows=pad, pack=pack):
                if pad_rows:
                    parts = parts + [
                        jnp.zeros((pad_rows, width), parts[0].dtype)
                    ]
                arr = parts[0] if len(parts) == 1 else jnp.concatenate(
                    parts, axis=0
                )
                if pack > 1:
                    arr = arr.reshape(arr.shape[0] // pack, width * pack)
                return arr

            tables[sname] = assemble(
                [logical["tables"][m] for m in members], dim
            )
            slot_names = set()
            for m in members:
                slot_names |= set(logical["slots"][m])
            sdict = {}
            for slot_name in sorted(slot_names):
                planes = [logical["slots"][m][slot_name] for m in members]
                if planes[0].ndim != 2:
                    sdict[slot_name] = planes[0]     # scalar slot.
                    continue
                sdict[slot_name] = assemble(planes, planes[0].shape[1])
            slots[sname] = sdict
            if self._sharding() is not None:
                sharding = self._sharding()
                tables[sname] = jax.device_put(tables[sname], sharding)
                slots[sname] = {
                    k: (jax.device_put(v, sharding) if v.ndim == 2 else v)
                    for k, v in slots[sname].items()
                }
        return EngineState(
            tables=tables,
            slots=slots,
            step=jnp.asarray(logical["step"], jnp.int32),
        )

    # --- State ------------------------------------------------------------

    def init(self, rng: Array) -> EngineState:
        """Initializes sharded tables and optimizer slots."""
        sharding = self._sharding()
        # Per-table make closures, rng consumed in declaration order so
        # a table initializes identically whether or not it is stacked.
        makes: Dict[str, callable] = {}
        for name, tc in self._tables.items():
            rng, key = jax.random.split(rng)
            init = tc.initializer or config_lib.default_initializer(tc.dim)
            padded = embedding_lib._pad_vocab(tc.vocabulary_size)

            def make(key=key, init=init, padded=padded, tc=tc):
                table = init(key, (padded, tc.dim), self.dtype)
                if self.row_sharding == "mod" and self._num_shards() > 1:
                    # Store physically permuted so contiguous GSPMD
                    # sharding realizes the mod layout; stays faithful to
                    # deterministic per-row initializers.
                    table = jnp.take(
                        table, self._physical_permutation(tc), axis=0
                    )
                return table

            makes[name] = make

        tables: Dict[str, Array] = {}
        slots: Dict[str, Dict[str, Array]] = {}
        for sname, members in self._storage_members.items():
            pack = self._pack[sname]

            def make_storage(members=members, sname=sname, pack=pack):
                parts = [makes[m]() for m in members]
                pad = self._stack_pad.get(sname, 0)
                if pad:
                    dim = self._tables[members[0]].dim
                    parts.append(jnp.zeros((pad, dim), self.dtype))
                arr = parts[0] if len(parts) == 1 else jnp.concatenate(
                    parts, axis=0
                )
                if pack > 1:
                    # Lane-packed physical layout: `pack` consecutive
                    # logical rows per 128-lane row (row-major reshape,
                    # exactly inverted by `logical_tables`).
                    arr = arr.reshape(arr.shape[0] // pack, 128)
                return arr

            if sharding is not None:
                table = jax.jit(make_storage, out_shardings=sharding)()
            else:
                table = make_storage()
            tables[sname] = table
            spec = self._spec(self._tables[members[0]])
            if sharding is not None:
                slots[sname] = jax.jit(
                    lambda t=table, s=spec, p=pack:
                        sparse_optimizer.init_slots(
                            s, t, self.slot_dtype, pack=p
                        ),
                    out_shardings=None,
                )()
            else:
                slots[sname] = sparse_optimizer.init_slots(
                    spec, table, self.slot_dtype, pack=pack
                )
        return EngineState(
            tables=tables, slots=slots, step=jnp.zeros((), jnp.int32)
        )

    # --- Forward ----------------------------------------------------------

    @staticmethod
    def _wide_row_gather(table: Array, ids: Array) -> Array:
        """Row gather through a `[V·d/128, 128]` full-lane view.

        At narrow dims (d < 128) XLA's layout assignment can prefer a
        TRANSPOSED table operand for `jnp.take` and insert a per-step
        layout-conversion copy of the whole table — trace-measured at
        d=32 on the 26-table stacked group: a 581 MB transpose every
        step, 2.1 ms of an 18 ms step (docs/PARITY.md round 4).
        Gathering 128-lane rows of a reshaped view keeps the canonical
        layout and full DMA lanes; the row's d-lane slice is picked
        with one select_n. Values are exactly `table[ids]` with
        PAD/negative ids zeroed (the engine lookup contract).

        The wide view is a per-step RETILE of the whole table under the
        bf16 (8,128)(2,1) tiling (~2.3 ms at 4.5M×32), so the path only
        pays off where the transpose pathology exists: d < 64
        (trace-verified at d=64 the plain gather keeps the canonical
        layout and the retile is a pure ~65 us/step regression —
        measured on the headline bench).
        """
        v, d = table.shape
        per = 128 // d if d and 128 % d == 0 else 0
        safe = jnp.maximum(ids, 0)
        if per <= 1 or v % per or d >= 64:
            out = jnp.take(table, safe, axis=0)
            return jnp.where((ids != PAD_ID)[:, None], out, 0.0)
        wide = table.reshape(v // per, per * d)
        g = jnp.take(wide, safe // per, axis=0)      # [n, 128]
        sub = (safe % per).astype(jnp.int32)
        parts = [g[:, i * d:(i + 1) * d] for i in range(per)]
        out = jax.lax.select_n(
            jnp.broadcast_to(sub[:, None], parts[0].shape), *parts
        )
        return jnp.where((ids != PAD_ID)[:, None], out, 0.0)

    @staticmethod
    def _packed_row_gather(table: Array, ids: Array, pack: int) -> Array:
        """Row gather from lane-packed `[V/pack, pack·d]` storage.

        The storage IS the wide full-lane view `_wide_row_gather` pays a
        per-step retile to build (trace-measured 2.3 ms at 4.5M×32,
        round 4): gather the 128-lane physical row, pick the logical
        row's d-lane group with one select_n. Values are exactly
        `logical_table[ids]` with PAD/negative ids zeroed."""
        d = table.shape[1] // pack
        safe = jnp.maximum(ids, 0)
        g = jnp.take(table, safe // pack, axis=0)
        sub = (safe % pack).astype(jnp.int32)
        parts = [g[:, i * d:(i + 1) * d] for i in range(pack)]
        out = jax.lax.select_n(
            jnp.broadcast_to(sub[:, None], parts[0].shape), *parts
        )
        return jnp.where((ids != PAD_ID)[:, None], out, 0.0)

    def _lookup_feature_packed(
        self,
        table: Array,
        fc: config_lib.FeatureConfig,
        feature: FeatureInput,
        pack: int,
    ) -> Array:
        """`embedding.lookup_feature` semantics on packed storage:
        flatten → packed gather → reshape, then the shared sequence
        masking / combiner reduction."""
        ids, weights = _split_feature(feature)
        if ids.ndim == 1:
            return self._packed_row_gather(table, ids, pack)
        if ids.ndim != 2:
            raise ValueError(
                f"Feature {fc.name!r} ids must be rank 1 or 2, got "
                f"shape {ids.shape}."
            )
        d = table.shape[1] // pack
        flat = self._packed_row_gather(table, ids.reshape(-1), pack)
        gathered = flat.reshape(ids.shape + (d,))
        if fc.max_sequence_length > 0:
            mask = (ids != PAD_ID)[..., None].astype(gathered.dtype)
            return gathered * mask
        return embedding_lib.combine(
            gathered, ids, fc.table.combiner, weights
        )

    def lookup(
        self, state: EngineState, features: Mapping[str, FeatureInput]
    ) -> Dict[str, Array]:
        """Gather + combine activations for each feature. Differentiate the
        *result* (activations), not this function."""
        unknown = set(features) - set(self._configs)
        if unknown:
            raise ValueError(
                f"Features {sorted(unknown)} have no FeatureConfig. "
                f"Known: {sorted(self._configs)}."
            )
        out = {}
        # Fused fast path: rank-1 plain features sharing one storage
        # array (table stacking) gather TOGETHER — one XLA row-gather
        # per storage instead of one per feature. TPU gathers cost
        # ~20 ns/row plus per-op overhead; at 26 stacked Criteo-style
        # tables the 26 separate gather ops are a measurable slice of
        # the step. Values are bit-identical to the per-feature path
        # (same rows through the same gather, split afterwards).
        groups: Dict = {}
        rest = []
        for fname, feature in features.items():
            fc = self._configs[fname]
            sname, _ = self._storage[fc.table.name]
            plain = (
                not isinstance(feature, tuple)
                and getattr(feature, "ndim", None) == 1
                and fc.max_sequence_length == 0
            )
            if plain:
                groups.setdefault(
                    (sname, feature.shape[0]), []
                ).append((fname, fc, feature))
            else:
                rest.append((fname, fc, feature))
        for (sname, b), members in groups.items():
            table = jax.lax.stop_gradient(state.tables[sname])
            pack = self._pack[sname]
            gather = (
                functools.partial(self._packed_row_gather, pack=pack)
                if pack > 1 else self._wide_row_gather
            )
            if len(members) == 1:
                fname, fc, feature = members[0]
                out[fname] = gather(
                    table,
                    self._to_physical(
                        _split_feature(feature)[0], fc.table
                    ),
                )
                continue
            ids = jnp.concatenate([
                self._to_physical(f, fc.table) for _, fc, f in members
            ])
            gathered = gather(table, ids)
            for i, (fname, fc, _) in enumerate(members):
                out[fname] = jax.lax.slice_in_dim(
                    gathered, i * b, (i + 1) * b, axis=0
                )
        for fname, fc, feature in rest:
            sname, _ = self._storage[fc.table.name]
            table = jax.lax.stop_gradient(state.tables[sname])
            pack = self._pack[sname]
            if pack > 1:
                out[fname] = self._lookup_feature_packed(
                    table, fc, self._physical_feature(fc, feature), pack
                )
            else:
                out[fname] = embedding_lib.lookup_feature(
                    table, fc, self._physical_feature(fc, feature)
                )
        return out

    def _physical_feature(
        self, fc: config_lib.FeatureConfig, feature: FeatureInput
    ) -> FeatureInput:
        ids, weights = _split_feature(feature)
        ids = self._to_physical(ids, fc.table)
        return ids if weights is None else (ids, weights)

    # --- Backward ---------------------------------------------------------

    def _row_grads(
        self,
        fc: config_lib.FeatureConfig,
        feature: FeatureInput,
        act_grad: Array,
    ) -> Tuple[Array, Array]:
        """Inverts the combiner: activation grads → flat (ids, row grads)."""
        ids, weights = _split_feature(feature)
        if ids.ndim == 1:
            grads = jnp.where((ids != PAD_ID)[:, None], act_grad, 0.0)
            return ids, grads

        valid = (ids != PAD_ID).astype(act_grad.dtype)
        if fc.max_sequence_length > 0:
            # Sequence output [B, L, dim]: row grad is the position's grad.
            grads = act_grad * valid[..., None]
            return ids.reshape(-1), grads.reshape(-1, act_grad.shape[-1])

        if weights is None:
            w = valid
        else:
            w = weights.astype(act_grad.dtype) * valid
        combiner = fc.table.combiner
        if combiner == "sum":
            scale = w
        elif combiner == "mean":
            denom = jnp.maximum(jnp.sum(w, axis=1), 1e-12)
            scale = w / denom[:, None]
        elif combiner == "sqrtn":
            denom = jnp.maximum(
                jnp.sqrt(jnp.sum(jnp.square(w), axis=1)), 1e-12
            )
            scale = w / denom[:, None]
        else:
            raise ValueError(f"Unknown combiner {combiner!r}")
        # d(loss)/d(row e_{b,l}) = scale_{b,l} · d(loss)/d(act_b)
        grads = scale[..., None] * act_grad[:, None, :]
        return ids.reshape(-1), grads.reshape(-1, act_grad.shape[-1])

    def _sharded_kernel_apply(
        self,
        sname: str,
        spec: config_lib.OptimizerSpec,
        table: Array,
        slots: Dict[str, Array],
        ids: Array,
        grads: Array,
        step: Array,
        sr_seed: Optional[Array],
        max_unique: Optional[int],
    ):
        """Blocked-kernel update on a MESHED engine: shard_map wraps the
        shard-local kernel, the SPMD architecture of the reference's
        SparseCore engine (tpu_embedding_layer.py:40-76,808,835 — ids
        route between chips, each core updates only the rows it owns).

        Every shard receives the full (id, grad) list (GSPMD inserts
        the all-gather when the caller's batch is data-sharded — the
        same `[batch, dim]` exchange `parallel/embedding_lookup.py`
        writes explicitly), rebases ids to its contiguous div-sharded
        row range (foreign rows fall out of range and drop in the
        kernel's routing), sorts, and sweeps its OWN table shard with
        the blocked Pallas kernel. No cross-shard traffic beyond the
        gradient exchange; the sweep stays shard-local.
        """
        mesh = self.mesh
        ta = self.table_axis
        pack = self._pack[sname]

        has_seed = sr_seed is not None

        def fn(table_shard, slot_shards, ids, grads, step, seed):
            rows_logical = table_shard.shape[0] * pack
            base = jax.lax.axis_index(ta) * rows_logical
            # Foreign/negative ids land outside [0, rows_logical) and
            # are dropped by the kernel's routing (sentinel row).
            local = jnp.where(ids < 0, ids, ids - base)
            shard_seed = (
                seed + jax.lax.axis_index(ta).astype(jnp.int32)
                * jnp.int32(7919)
            ) if has_seed else None
            return sparse_optimizer.apply_sparse(
                spec, table_shard, slot_shards, local, grads, step,
                max_unique=max_unique,
                use_kernel=True,
                sr_seed=shard_seed,
                exact_routing=self.exact_grad_routing,
                pack=pack,
            )

        slot_specs = {nm: P(ta, None) for nm in slots}
        seed = sr_seed if has_seed else jnp.int32(0)
        return jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(
                P(ta, None), slot_specs, P(), P(None, None), P(),
                P(),
            ),
            out_specs=(P(ta, None), slot_specs),
            check_vma=False,
        )(table, slots, ids, grads, step, seed)

    def update(
        self,
        state: EngineState,
        features: Mapping[str, FeatureInput],
        activation_grads: Mapping[str, Array],
    ) -> EngineState:
        """Applies one sparse-optimizer step from activation gradients.

        Gradients from features sharing one table — and, with
        `stack_tables`, from tables sharing one storage array — are
        concatenated so the storage sees a single deduplicated update
        (matching the engine semantics of one `apply_gradients` per
        step, tpu_embedding_layer.py:837-845). Ids arrive in storage
        coordinates (`_physical_feature` adds the member's row offset),
        so a stacked group pays ONE sort + pair-list construction +
        blocked-kernel sweep for all member tables.
        """
        per_storage_ids: Dict[str, list] = {}
        per_storage_grads: Dict[str, list] = {}
        for fname, grad in activation_grads.items():
            fc = self._configs[fname]
            ids, grads = self._row_grads(
                fc, self._physical_feature(fc, features[fname]), grad
            )
            sname, _ = self._storage[fc.table.name]
            per_storage_ids.setdefault(sname, []).append(ids)
            per_storage_grads.setdefault(sname, []).append(grads)

        use_kernel = self.sparse_update_kernel
        if use_kernel is None:
            use_kernel = (
                self.mesh is None and jax.default_backend() == "tpu"
            )
        tables = dict(state.tables)
        slots = dict(state.slots)
        for t_idx, (sname, ids_list) in enumerate(
            sorted(per_storage_ids.items())
        ):
            members = self._storage_members[sname]
            tc = self._tables[members[0]]
            spec = self._spec(tc)
            # Stacked groups never carry max_unique_ids (such tables
            # stay solo — the bound is per-table).
            max_unique = tc.max_unique_ids if len(members) == 1 else None
            ids = jnp.concatenate(ids_list, axis=0)
            grads = jnp.concatenate(per_storage_grads[sname], axis=0)
            sr_seed = None
            if self.stochastic_rounding:
                # Unique per (step, storage) so rounding streams never
                # repeat across steps or collide across storages.
                sr_seed = state.step * jnp.int32(1000003) + jnp.int32(
                    t_idx
                )
            if use_kernel and self.mesh is not None:
                # Meshed engines run the kernel shard-local inside
                # shard_map (pallas_call does not partition under
                # GSPMD) — opt in with sparse_update_kernel=True.
                tables[sname], slots[sname] = self._sharded_kernel_apply(
                    sname, spec, tables[sname], slots[sname],
                    ids, grads, state.step, sr_seed, max_unique,
                )
                continue
            tables[sname], slots[sname] = sparse_optimizer.apply_sparse(
                spec, tables[sname], slots[sname], ids, grads, state.step,
                max_unique=max_unique,
                use_kernel=use_kernel,
                sr_seed=sr_seed,
                exact_routing=self.exact_grad_routing,
                pack=self._pack[sname],
            )
        return EngineState(
            tables=tables, slots=slots, step=state.step + 1
        )

    # --- Pipelined (1-step-stale) execution -------------------------------

    def pipelined_grad_and_update(
        self,
        state: EngineState,
        pending,
        features: Mapping[str, FeatureInput],
        loss_of_activations,
    ):
        """One step with SparseCore-style overlap: this step's lookup
        gathers from the tables *before* the previous step's pending
        gradients are scattered in, so inside one jit the scatter and the
        forward pass have no data dependence and XLA schedules them
        concurrently. Lookups therefore see tables one step stale — the
        same trade the reference enables with
        `pipeline_execution_with_tensor_core`
        (tpu_embedding_layer.py:619-622,704-708).

        Args:
          state: Engine state.
          pending: `None` on the first step, else the pending update
            returned by the previous call.
          features: This step's id features.
          loss_of_activations: `acts -> loss` (or `(loss, aux)`).

        Returns:
          `(new_state, new_pending, loss, aux)`. Call `flush` on the last
          pending update after the final step.
        """
        # Gather BEFORE applying the pending scatter: the gather reads the
        # pre-update buffer, so the two ops are data-independent and can
        # overlap. (Applying the update first would serialize the step on
        # the scatter.)
        acts = self.lookup(state, features)

        def wrapped(acts):
            out = loss_of_activations(acts)
            return out if isinstance(out, tuple) else (out, None)

        (loss, aux), agrads = jax.value_and_grad(wrapped, has_aux=True)(
            acts
        )
        if pending is not None:
            state = self.update(
                state, pending["features"], pending["grads"]
            )
        new_pending = {"features": features, "grads": agrads}
        return state, new_pending, loss, aux

    def flush(self, state: EngineState, pending) -> EngineState:
        """Applies the final pending update after the last pipelined step."""
        if pending is None:
            return state
        return self.update(state, pending["features"], pending["grads"])

    # --- Convenience ------------------------------------------------------

    def grad_and_update(
        self,
        state: EngineState,
        features: Mapping[str, FeatureInput],
        loss_of_activations,
    ):
        """One fused step for losses that are functions of activations only.

        `loss_of_activations(acts) -> loss (or (loss, aux))`. Returns
        `(new_state, loss, aux)`. For models with dense parameters, call
        `lookup`/`update` around your own `value_and_grad` instead.
        """
        acts = self.lookup(state, features)

        def wrapped(acts):
            out = loss_of_activations(acts)
            return out if isinstance(out, tuple) else (out, None)

        (loss, aux), agrads = jax.value_and_grad(wrapped, has_aux=True)(
            acts
        )
        return self.update(state, features, agrads), loss, aux
