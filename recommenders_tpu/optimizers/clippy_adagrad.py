"""Clippy Adagrad: Adagrad with per-variable adaptive clipping, as optax.

TPU-native counterpart of the reference's `ClippyAdagrad`
(`tensorflow_recommenders/experimental/optimizers/clippy_adagrad.py:74`),
implementing the same math (https://arxiv.org/pdf/2302.09178.pdf) as a pure
`optax.GradientTransformation`: per parameter w, the Adagrad step is scaled
by the largest factor in (0, 1] ensuring

    |Δw| <= |w|·variable_relative_threshold
            + rsqrt(accum)·accumulator_relative_threshold
            + absolute_threshold   (elementwise),

with either delayed (default) or standard accumulator updates, and optional
clipping of the accumulator update itself. Sparse `IndexedSlices` handling
is unnecessary here: embedding-gradient sparsity is handled by the
embedding engine's dedicated sparse optimizer
(`recommenders_tpu.embedding.sparse_optimizer`).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import optax

Array = jax.Array
ScalarOrSchedule = Union[float, Callable[[Array], Array]]


class ClippyAdagradState(NamedTuple):
    accumulator: optax.Updates
    clipping_factors: optax.Updates
    count: Array


class _StepResult(NamedTuple):
    # Distinct type so per-leaf results survive tree flattening even when
    # wrapped by optax.masked (whose MaskedNode is itself an empty tuple).
    update: Array
    accumulator: Array
    factor: Array


def shrink_by_references(
    tensor: Array,
    references,
    relative_factors,
    absolute_factor: float,
):
    """Scales `tensor` to satisfy the elementwise reference bound.

    Returns `(scaled_tensor, scale)` where `scale` is the largest scalar in
    (0, 1] such that `|tensor|·scale <= Σ_j |reference_j|·rel_j + abs`
    elementwise. Matches the reference's `shrink_by_references`
    (clippy_adagrad.py:21).
    """
    if any(rf < 0 for rf in relative_factors):
        raise ValueError("relative_factors must all be non-negative.")
    if absolute_factor < 0:
        raise ValueError("absolute_factor must be non-negative.")
    if len(references) != len(relative_factors):
        raise ValueError(
            "references and relative_factors must have the same length. "
            f"Instead they are {len(references)} and "
            f"{len(relative_factors)}."
        )
    max_delta = absolute_factor
    for ref, rf in zip(references, relative_factors):
        max_delta = max_delta + jnp.abs(ref) * rf
    abs_tensor = jnp.abs(tensor)
    per_element_scale = jnp.where(
        tensor == 0.0,
        1.0,
        jnp.where(abs_tensor > 0.0, max_delta / abs_tensor, 1.0),
    )
    scale = jnp.minimum(1.0, jnp.min(per_element_scale))
    return tensor * scale, scale


def clippy_adagrad(
    learning_rate: ScalarOrSchedule = 0.001,
    initial_accumulator_value: float = 0.1,
    variable_relative_threshold: float = 0.1,
    accumulator_relative_threshold: float = 0.0,
    absolute_threshold: float = 1e-7,
    epsilon: float = 1e-7,
    clip_accumulator_update: bool = False,
    use_standard_accumulator_update: bool = False,
) -> optax.GradientTransformation:
    """Builds the Clippy Adagrad gradient transformation.

    Args:
      learning_rate: Float or schedule `step -> lr`.
      initial_accumulator_value: Starting value of the Adagrad accumulators.
      variable_relative_threshold: Clipping threshold relative to |w|.
      accumulator_relative_threshold: Threshold relative to rsqrt(accum).
      absolute_threshold: Absolute clipping threshold.
      epsilon: Numerical-stability constant inside the rsqrt.
      clip_accumulator_update: Apply the clipping factor to the accumulator
        update too (delayed mode only).
      use_standard_accumulator_update: Update the accumulator *before*
        computing the step, as in classical Adagrad. Mutually exclusive
        with `clip_accumulator_update`.

    Returns:
      An `optax.GradientTransformation` whose state exposes per-variable
      `clipping_factors` (the reference's `export_clipping_factors`
      equivalent — always exported here, it costs one scalar per variable).
    """
    if clip_accumulator_update and use_standard_accumulator_update:
        raise ValueError(
            "clip_accumulator_update and use_standard_accumulator_update "
            "cannot both be set to True."
        )

    def init_fn(params):
        return ClippyAdagradState(
            accumulator=jax.tree_util.tree_map(
                lambda p: jnp.full_like(p, initial_accumulator_value),
                params,
            ),
            clipping_factors=jax.tree_util.tree_map(
                lambda p: jnp.ones((), p.dtype), params
            ),
            count=jnp.zeros((), jnp.int32),
        )

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError(
                "clippy_adagrad requires params to be passed to update()."
            )
        lr = (
            learning_rate(state.count)
            if callable(learning_rate)
            else learning_rate
        )

        def step(g, accum, p):
            if use_standard_accumulator_update:
                accum = accum + jnp.square(g)
            precondition = jax.lax.rsqrt(accum + epsilon)
            delta = lr * g * precondition
            clipped_delta, factor = shrink_by_references(
                delta,
                references=[p, precondition],
                relative_factors=[
                    variable_relative_threshold,
                    accumulator_relative_threshold,
                ],
                absolute_factor=absolute_threshold,
            )
            if not use_standard_accumulator_update:
                acc_update = g * factor if clip_accumulator_update else g
                accum = accum + jnp.square(acc_update)
            return _StepResult(-clipped_delta, accum, factor)

        out = jax.tree_util.tree_map(
            step, updates, state.accumulator, params
        )
        is_result = lambda x: isinstance(x, _StepResult)  # noqa: E731
        new_updates = jax.tree_util.tree_map(
            lambda r: r.update, out, is_leaf=is_result
        )
        new_accum = jax.tree_util.tree_map(
            lambda r: r.accumulator, out, is_leaf=is_result
        )
        new_factors = jax.tree_util.tree_map(
            lambda r: r.factor, out, is_leaf=is_result
        )
        return new_updates, ClippyAdagradState(
            accumulator=new_accum,
            clipping_factors=new_factors,
            count=state.count + 1,
        )

    return optax.GradientTransformation(init_fn, update_fn)
