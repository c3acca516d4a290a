"""Shard-local sparse optimizers for embedding tables.

The reference delegates sparse optimization to the TF TPU embedding
engine's on-device C++ updaters (SGD/Adagrad/Adam/FTRL with slot
variables, `tensorflow_recommenders/layers/embedding/tpu_embedding_layer.py:
40-76,1014-1082`). These are their JAX equivalents: pure functions that
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

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from recommenders_tpu.embedding import config as config_lib

Array = jax.Array
Slots = Dict[str, Array]

PAD_ID = config_lib.PAD_ID


def dedupe_sum(ids: Array, grads: Array) -> Tuple[Array, Array]:
    """Folds gradients of duplicate ids into one entry each.

    Returns `(ids, grads)` of the same static shapes where each unique id
    appears exactly once with the summed gradient; the remaining slots are
    `PAD_ID` with zero gradients. `PAD_ID` entries in the input are
    preserved as padding.

    Args:
      ids: `[n]` int row ids (may contain PAD_ID).
      grads: `[n, dim]` per-occurrence gradients.
    """
    n = ids.shape[0]
    order = jnp.argsort(ids)
    sid = ids[order]
    sgrad = grads[order]
    first = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    segment = jnp.cumsum(first) - 1  # [n] segment index per entry
    summed = jax.ops.segment_sum(sgrad, segment, num_segments=n)
    # All entries in a segment share the same id.
    seg_ids = jax.ops.segment_max(sid, segment, num_segments=n)
    slot_valid = jnp.arange(n) <= segment[-1]
    out_ids = jnp.where(slot_valid, seg_ids, PAD_ID)
    # Zero gradients of unused slots and of PAD_ID inputs (which sort
    # first and form their own segment).
    out_grads = jnp.where((out_ids != PAD_ID)[:, None], summed, 0.0)
    return out_ids, out_grads


def _safe(ids: Array) -> Array:
    """Maps PAD_ID to row 0 (whose delta is zeroed by the caller)."""
    return jnp.maximum(ids, 0)


def _mask_rows(ids: Array, rows: Array) -> Array:
    return jnp.where((ids != PAD_ID)[:, None], rows, 0.0)


def init_slots(
    spec: config_lib.OptimizerSpec, table: Array
) -> Slots:
    """Creates the slot variables for one table."""
    if spec.kind == "sgd":
        return {}
    if spec.kind == "adagrad":
        return {
            "accumulator": jnp.full_like(
                table, spec.initial_accumulator_value
            )
        }
    if spec.kind == "adam":
        return {
            "m": jnp.zeros_like(table),
            "v": jnp.zeros_like(table),
        }
    if spec.kind == "ftrl":
        return {
            "accumulator": jnp.full_like(
                table, spec.initial_accumulator_value
            ),
            "linear": jnp.zeros_like(table),
        }
    raise ValueError(f"Unknown optimizer kind {spec.kind!r}")


def apply_sparse(
    spec: config_lib.OptimizerSpec,
    table: Array,
    slots: Slots,
    ids: Array,
    grads: Array,
    step: Array,
) -> Tuple[Array, Slots]:
    """Applies one sparse update. `ids: [n]`, `grads: [n, dim]`.

    Duplicate ids are folded first, so each row receives exactly one
    update regardless of how many batch elements touched it.
    """
    ids, grads = dedupe_sum(ids, grads)
    safe = _safe(ids)

    if spec.kind == "sgd":
        delta = _mask_rows(ids, -spec.learning_rate * grads)
        return table.at[safe].add(delta), slots

    if spec.kind == "adagrad":
        accum = slots["accumulator"]
        accum = accum.at[safe].add(_mask_rows(ids, jnp.square(grads)))
        scale = jax.lax.rsqrt(accum[safe] + 1e-12)
        delta = _mask_rows(ids, -spec.learning_rate * grads * scale)
        return table.at[safe].add(delta), {"accumulator": accum}

    if spec.kind == "adam":
        # Lazy Adam: moments decay only on touched rows (like the TPU
        # embedding engine's sparse Adam).
        m, v = slots["m"], slots["v"]
        m_rows = spec.beta1 * m[safe] + (1 - spec.beta1) * grads
        v_rows = spec.beta2 * v[safe] + (1 - spec.beta2) * jnp.square(
            grads
        )
        t = step.astype(jnp.float32) + 1.0
        m_hat = m_rows / (1 - spec.beta1**t)
        v_hat = v_rows / (1 - spec.beta2**t)
        delta = -spec.learning_rate * m_hat / (
            jnp.sqrt(v_hat) + spec.epsilon
        )
        valid = (ids != PAD_ID)[:, None]
        m = m.at[safe].set(jnp.where(valid, m_rows, m[safe]))
        v = v.at[safe].set(jnp.where(valid, v_rows, v[safe]))
        table = table.at[safe].add(_mask_rows(ids, delta))
        return table, {"m": m, "v": v}

    if spec.kind == "ftrl":
        accum, linear = slots["accumulator"], slots["linear"]
        lr = spec.learning_rate
        lrp = spec.learning_rate_power
        l1 = spec.l1_regularization_strength
        l2 = spec.l2_regularization_strength
        w = table[safe]
        n_old = accum[safe]
        n_new = n_old + jnp.square(grads)
        sigma = (jnp.power(n_new, -lrp) - jnp.power(n_old, -lrp)) / lr
        z_new = linear[safe] + grads - sigma * w
        denom = jnp.power(n_new, -lrp) / lr + 2 * l2
        w_new = jnp.where(
            jnp.abs(z_new) > l1,
            (jnp.sign(z_new) * l1 - z_new) / denom,
            0.0,
        )
        valid = (ids != PAD_ID)[:, None]
        accum = accum.at[safe].set(jnp.where(valid, n_new, n_old))
        linear = linear.at[safe].set(
            jnp.where(valid, z_new, linear[safe])
        )
        table = table.at[safe].set(jnp.where(valid, w_new, w))
        return table, {"accumulator": accum, "linear": linear}

    raise ValueError(f"Unknown optimizer kind {spec.kind!r}")
