"""A pointwise ranking task.

Functional JAX counterpart of `tfrs.tasks.Ranking`
(`tensorflow_recommenders/tasks/ranking.py:26`). Default loss is binary
cross-entropy averaged over the batch (matching
`tf.keras.losses.BinaryCrossentropy`'s `sum_over_batch_size` reduction);
metric updates are the caller's responsibility — the task returns the loss
plus the (labels, predictions) pass-through for metric plumbing.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from recommenders_tpu.tasks import base

Array = jax.Array

_EPS = 1e-7


def binary_crossentropy(
    labels: Array,
    predictions: Array,
    sample_weight: Optional[Array] = None,
    from_logits: bool = False,
) -> Array:
    """Binary cross-entropy with `sum_over_batch_size` reduction.

    Per-example BCE (mean over trailing dims if present), optionally
    weighted, then divided by the number of examples — mirroring Keras'
    default `BinaryCrossentropy` behavior used by the reference ranking task
    (tasks/ranking.py:63-64).
    """
    labels = labels.astype(jnp.float32)
    predictions = predictions.astype(jnp.float32)
    if from_logits:
        per_elem = (
            jnp.maximum(predictions, 0.0)
            - predictions * labels
            + jnp.log1p(jnp.exp(-jnp.abs(predictions)))
        )
    else:
        p = jnp.clip(predictions, _EPS, 1.0 - _EPS)
        per_elem = -(labels * jnp.log(p) + (1.0 - labels) * jnp.log1p(-p))
    per_example = per_elem
    if per_elem.ndim > 1:
        per_example = jnp.mean(per_elem, axis=tuple(range(1, per_elem.ndim)))
    if sample_weight is not None:
        per_example = per_example * jnp.reshape(
            sample_weight, per_example.shape
        )
    return jnp.mean(per_example)


def mean_squared_error(
    labels: Array,
    predictions: Array,
    sample_weight: Optional[Array] = None,
) -> Array:
    """MSE with `sum_over_batch_size` reduction (Keras `MeanSquaredError`)."""
    labels = labels.astype(jnp.float32)
    predictions = predictions.astype(jnp.float32)
    per_elem = jnp.square(labels - predictions)
    per_example = per_elem
    if per_elem.ndim > 1:
        per_example = jnp.mean(per_elem, axis=tuple(range(1, per_elem.ndim)))
    if sample_weight is not None:
        per_example = per_example * jnp.reshape(
            sample_weight, per_example.shape
        )
    return jnp.mean(per_example)


class RankingOutput(NamedTuple):
    loss: Array
    labels: Array
    predictions: Array


@dataclasses.dataclass(frozen=True)
class Ranking(base.Task):
    """Pointwise ranking loss.

    Attributes:
      loss_fn: Loss taking `(labels, predictions, sample_weight)` and
        returning a scalar. Defaults to binary cross-entropy.
    """

    loss_fn: Callable[..., Array] = binary_crossentropy

    def __call__(
        self,
        labels: Array,
        predictions: Array,
        sample_weight: Optional[Array] = None,
    ) -> RankingOutput:
        loss = self.loss_fn(labels, predictions, sample_weight)
        return RankingOutput(
            loss=loss, labels=labels, predictions=predictions
        )
