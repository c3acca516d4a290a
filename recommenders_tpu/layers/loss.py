"""Loss-shaping ops for in-batch sampled-softmax retrieval training.

Functional JAX equivalents of the reference's loss layers
(`tensorflow_recommenders/layers/loss.py:61,114,150`): hard-negative
mining, accidental-hit removal and sampled-softmax log-q correction.

Unlike the reference these are pure functions of arrays — no layer
objects, no implicit state — so they compose freely under `jax.jit`,
`jax.grad` and `shard_map`.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# Matches the reference's sentinels (layers/loss.py:22-23): large-but-finite
# values so arithmetic on masked logits never produces inf/nan.
MAX_FLOAT = np.finfo(np.float32).max / 100.0
MIN_FLOAT = np.finfo(np.float32).min / 100.0


def take_along_rows(data: Array, column_indices: Array) -> Array:
    """Gathers `data[i, column_indices[i, j]]` for each row i.

    Equivalent of the reference's `_gather_elements_along_row`
    (layers/loss.py:26). On TPU this lowers to a single gather.

    Args:
      data: `[N, M]` array.
      column_indices: `[N, K]` integer array of per-row column indices.

    Returns:
      `[N, K]` array of gathered elements.
    """
    if data.ndim != 2 or column_indices.ndim != 2:
        raise ValueError(
            "take_along_rows expects 2D inputs, got "
            f"{data.shape} and {column_indices.shape}."
        )
    return jnp.take_along_axis(data, column_indices, axis=1)


def hard_negative_mining(
    logits: Array, labels: Array, num_hard_negatives: int
) -> Tuple[Array, Array]:
    """Keeps the positive and the `num_hard_negatives` largest negatives per row.

    Semantics match the reference's `HardNegativeMining` (layers/loss.py:61):
    the positive logit is forced into the selection by adding `MAX_FLOAT`
    to it before the top-k, then logits/labels are gathered at the selected
    columns. The number of kept columns is `min(num_hard_negatives + 1,
    num_candidates)` and is static under jit.

    Args:
      logits: `[batch, num_candidates]` logits.
      labels: `[batch, num_candidates]` one-hot labels.
      num_hard_negatives: How many hard negatives to keep.

    Returns:
      Tuple of (`[batch, k+1]` logits, `[batch, k+1]` one-hot labels).
    """
    num_candidates = logits.shape[1]
    num_sampled = min(num_hard_negatives + 1, num_candidates)
    _, col_indices = jax.lax.top_k(
        logits + labels * MAX_FLOAT, k=num_sampled
    )
    return (
        take_along_rows(logits, col_indices),
        take_along_rows(labels, col_indices),
    )


def remove_accidental_hits(
    labels: Array, logits: Array, candidate_ids: Array
) -> Array:
    """Pushes logits of accidental hits to MIN_FLOAT.

    An accidental hit is an in-batch negative whose candidate id equals the
    row's positive candidate id. Mirrors the reference's
    `RemoveAccidentalHits` (layers/loss.py:114): the duplicate mask minus
    the label matrix is scaled by MIN_FLOAT and added to the logits.

    Args:
      labels: `[batch, num_candidates]` one-hot labels.
      logits: `[batch, num_candidates]` logits.
      candidate_ids: `[num_candidates]` candidate id vector (any dtype with
        a well-defined equality, including integer ids).

    Returns:
      `[batch, num_candidates]` adjusted logits.
    """
    positive_indices = jnp.argmax(labels, axis=1)
    positive_candidate_ids = jnp.take(candidate_ids, positive_indices)

    duplicate = jnp.equal(
        positive_candidate_ids[:, None], candidate_ids[None, :]
    ).astype(labels.dtype)
    duplicate = duplicate - labels

    return logits + duplicate * MIN_FLOAT


def sampling_probability_correction(
    logits: Array, candidate_sampling_probability: Array
) -> Array:
    """Corrects logits for the candidate sampling probability (log-q correction).

    `logits - log(clip(p, 1e-6, 1))`, as in the reference's
    `SamplingProbablityCorrection` (layers/loss.py:150).

    Args:
      logits: `[batch, num_candidates]` logits.
      candidate_sampling_probability: `[num_candidates]` probabilities of each
        candidate appearing in the batch.

    Returns:
      Adjusted logits.
    """
    return logits - jnp.log(
        jnp.clip(candidate_sampling_probability, 1e-6, 1.0)
    )
