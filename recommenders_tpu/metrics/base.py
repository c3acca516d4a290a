"""Functional, jit-friendly streaming metrics.

The reference delegates metric accumulation to Keras metric objects
(mutable variables updated via side effects). The TPU-native equivalent is
explicit: every metric is a small immutable object with

    state = metric.init()
    state = metric.update(state, ...)   # pure; safe inside jax.jit
    value = metric.result(state)

States are pytrees of arrays, so they thread through jitted train/eval
steps, checkpoint with orbax, and reduce across data-parallel shards with a
plain `psum` (all states here are sum-composable).
"""

from __future__ import annotations

import abc
import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Array = jax.Array
State = Any


class Metric(abc.ABC):
    """Streaming metric interface: init / update / result."""

    name: str

    @abc.abstractmethod
    def init(self) -> State:
        ...

    @abc.abstractmethod
    def update(self, state: State, *args, **kwargs) -> State:
        ...

    @abc.abstractmethod
    def result(self, state: State) -> Array:
        ...


def _weighted(values: Array, sample_weight: Optional[Array]):
    """Broadcasts weights against values; returns (weighted values, weights)."""
    values = jnp.asarray(values, dtype=jnp.float32)
    if sample_weight is None:
        weights = jnp.ones_like(values)
    else:
        weights = jnp.broadcast_to(
            jnp.reshape(
                jnp.asarray(sample_weight, dtype=jnp.float32),
                jnp.shape(sample_weight)
                + (1,) * (values.ndim - jnp.ndim(sample_weight)),
            ),
            values.shape,
        )
    return values * weights, weights


@dataclasses.dataclass(frozen=True)
class Mean(Metric):
    """Weighted streaming mean (Keras `metrics.Mean` analog)."""

    name: str = "mean"

    def init(self) -> State:
        return {
            "total": jnp.zeros((), jnp.float32),
            "count": jnp.zeros((), jnp.float32),
        }

    def update(
        self,
        state: State,
        values: Array,
        sample_weight: Optional[Array] = None,
    ) -> State:
        weighted, weights = _weighted(values, sample_weight)
        return {
            "total": state["total"] + jnp.sum(weighted),
            "count": state["count"] + jnp.sum(weights),
        }

    def result(self, state: State) -> Array:
        return state["total"] / jnp.maximum(state["count"], 1e-12)


@dataclasses.dataclass(frozen=True)
class Sum(Metric):
    """Weighted streaming sum."""

    name: str = "sum"

    def init(self) -> State:
        return {"total": jnp.zeros((), jnp.float32)}

    def update(self, state, values, sample_weight=None) -> State:
        weighted, _ = _weighted(values, sample_weight)
        return {"total": state["total"] + jnp.sum(weighted)}

    def result(self, state) -> Array:
        return state["total"]


@dataclasses.dataclass(frozen=True)
class RootMeanSquaredError(Metric):
    """Streaming RMSE over (labels, predictions)."""

    name: str = "rmse"

    def init(self) -> State:
        return Mean().init()

    def update(self, state, labels, predictions, sample_weight=None) -> State:
        sq = jnp.square(
            jnp.asarray(labels, jnp.float32)
            - jnp.asarray(predictions, jnp.float32)
        )
        return Mean().update(state, sq, sample_weight)

    def result(self, state) -> Array:
        return jnp.sqrt(Mean().result(state))


@dataclasses.dataclass(frozen=True)
class MeanAbsoluteError(Metric):
    name: str = "mae"

    def init(self) -> State:
        return Mean().init()

    def update(self, state, labels, predictions, sample_weight=None) -> State:
        err = jnp.abs(
            jnp.asarray(labels, jnp.float32)
            - jnp.asarray(predictions, jnp.float32)
        )
        return Mean().update(state, err, sample_weight)

    def result(self, state) -> Array:
        return Mean().result(state)


@dataclasses.dataclass(frozen=True)
class BinaryAccuracy(Metric):
    """Fraction of `(pred > threshold) == label`."""

    threshold: float = 0.5
    name: str = "binary_accuracy"

    def init(self) -> State:
        return Mean().init()

    def update(self, state, labels, predictions, sample_weight=None) -> State:
        pred = (
            jnp.asarray(predictions, jnp.float32) > self.threshold
        ).astype(jnp.float32)
        match = (pred == jnp.asarray(labels, jnp.float32)).astype(
            jnp.float32
        )
        return Mean().update(state, match, sample_weight)

    def result(self, state) -> Array:
        return Mean().result(state)


@dataclasses.dataclass(frozen=True)
class CategoricalAccuracy(Metric):
    """argmax(pred) == argmax(label), per row."""

    name: str = "categorical_accuracy"

    def init(self) -> State:
        return Mean().init()

    def update(self, state, labels, predictions, sample_weight=None) -> State:
        match = (
            jnp.argmax(predictions, axis=-1) == jnp.argmax(labels, axis=-1)
        ).astype(jnp.float32)
        return Mean().update(state, match, sample_weight)

    def result(self, state) -> Array:
        return Mean().result(state)


@dataclasses.dataclass(frozen=True)
class TopKCategoricalAccuracy(Metric):
    """Whether the true class is among the k highest-scoring predictions.

    Tie handling follows `tf.math.in_top_k`: the target is in the top k if
    strictly fewer than k entries score higher than it.
    """

    k: int = 5
    name: str = "top_k_categorical_accuracy"

    def init(self) -> State:
        return Mean().init()

    def update(self, state, labels, predictions, sample_weight=None) -> State:
        predictions = jnp.asarray(predictions, jnp.float32)
        target_idx = jnp.argmax(labels, axis=-1)
        target_scores = jnp.take_along_axis(
            predictions, target_idx[:, None], axis=-1
        )
        num_higher = jnp.sum(
            (predictions > target_scores).astype(jnp.int32), axis=-1
        )
        in_top_k = (num_higher < self.k).astype(jnp.float32)
        return Mean().update(state, in_top_k, sample_weight)

    def result(self, state) -> Array:
        return Mean().result(state)


@dataclasses.dataclass(frozen=True)
class AUC(Metric):
    """Thresholded approximation of ROC-AUC (or PR-AUC).

    Keras-style: `num_thresholds` evenly spaced thresholds over [0, 1],
    streaming confusion-matrix counts, trapezoidal interpolation of the
    resulting curve. Predictions must be probabilities in [0, 1].
    """

    num_thresholds: int = 200
    curve: str = "ROC"
    name: str = "auc"

    def _thresholds(self) -> Array:
        eps = 1e-7
        inner = jnp.arange(1, self.num_thresholds - 1, dtype=jnp.float32) / (
            self.num_thresholds - 1
        )
        return jnp.concatenate(
            [jnp.array([-eps], jnp.float32), inner,
             jnp.array([1.0 + eps], jnp.float32)]
        )

    def init(self) -> State:
        # Four distinct buffers: sharing one array would alias leaves of the
        # train-state pytree and break buffer donation in the jitted step.
        def z():
            return jnp.zeros((self.num_thresholds,), jnp.float32)

        return {"tp": z(), "fp": z(), "tn": z(), "fn": z()}

    def update(self, state, labels, predictions, sample_weight=None) -> State:
        labels = jnp.reshape(jnp.asarray(labels, jnp.float32), (-1,))
        predictions = jnp.reshape(
            jnp.asarray(predictions, jnp.float32), (-1,)
        )
        if sample_weight is None:
            w = jnp.ones_like(labels)
        else:
            w = jnp.broadcast_to(
                jnp.reshape(jnp.asarray(sample_weight, jnp.float32), (-1,)),
                labels.shape,
            )
        thr = self._thresholds()
        # [T, N] prediction-above-threshold mask.
        above = predictions[None, :] > thr[:, None]
        pos = labels[None, :] * w[None, :]
        neg = (1.0 - labels[None, :]) * w[None, :]
        return {
            "tp": state["tp"] + jnp.sum(jnp.where(above, pos, 0.0), axis=1),
            "fp": state["fp"] + jnp.sum(jnp.where(above, neg, 0.0), axis=1),
            "fn": state["fn"] + jnp.sum(jnp.where(~above, pos, 0.0), axis=1),
            "tn": state["tn"] + jnp.sum(jnp.where(~above, neg, 0.0), axis=1),
        }

    def result(self, state) -> Array:
        tp, fp, tn, fn = (
            state["tp"], state["fp"], state["tn"], state["fn"]
        )
        if self.curve == "ROC":
            tpr = tp / jnp.maximum(tp + fn, 1e-12)
            fpr = fp / jnp.maximum(fp + tn, 1e-12)
            # Thresholds ascend => rates descend; integrate trapezoidally.
            return jnp.sum(
                (fpr[:-1] - fpr[1:]) * (tpr[:-1] + tpr[1:]) / 2.0
            )
        elif self.curve == "PR":
            # Precision at zero predictions (highest thresholds) is 1 by
            # convention — treating it as 0 truncates the leading area
            # and caps a perfect classifier's PR-AUC below 1.
            precision = jnp.where(
                tp + fp > 0, tp / jnp.maximum(tp + fp, 1e-12), 1.0
            )
            recall = tp / jnp.maximum(tp + fn, 1e-12)
            return jnp.sum(
                (recall[:-1] - recall[1:])
                * (precision[:-1] + precision[1:]) / 2.0
            )
        raise ValueError(f"Unknown curve {self.curve!r}")


@dataclasses.dataclass(frozen=True)
class NDCG(Metric):
    """Streaming NDCG(@k) over `[B, L]` (labels, predictions) lists.

    Standard exponential gains `(2^label − 1) / log2(1 + rank)`; ties
    broken by list position (stable argsort). Ragged lists supported via
    a boolean `mask` argument to `update`.
    """

    k: Optional[int] = None
    name: str = "ndcg"

    def init(self) -> State:
        return Mean().init()

    def update(
        self,
        state,
        labels: Array,
        predictions: Array,
        sample_weight: Optional[Array] = None,
        mask: Optional[Array] = None,
    ) -> State:
        labels = jnp.asarray(labels, jnp.float32)
        predictions = jnp.asarray(predictions, jnp.float32)
        if mask is None:
            mask = jnp.ones(labels.shape, bool)
        length = labels.shape[1]
        cutoff = self.k if self.k is not None else length

        sort_key = jnp.where(mask, predictions, -jnp.inf)
        order = jnp.argsort(-sort_key, axis=1, stable=True)
        gains = jnp.where(mask, jnp.power(2.0, labels) - 1.0, 0.0)
        sorted_gains = jnp.take_along_axis(gains, order, axis=1)
        positions = jnp.arange(1, length + 1, dtype=jnp.float32)
        discounts = jnp.where(
            positions <= cutoff, 1.0 / jnp.log2(1.0 + positions), 0.0
        )
        dcg = jnp.sum(sorted_gains * discounts[None], axis=1)
        ideal_gains = jnp.sort(gains, axis=1)[:, ::-1]
        ideal = jnp.sum(ideal_gains * discounts[None], axis=1)
        ndcg = jnp.where(ideal > 0, dcg / jnp.maximum(ideal, 1e-12), 0.0)
        return Mean().update(state, ndcg, sample_weight)

    def result(self, state) -> Array:
        return Mean().result(state)


def init_all(metrics: Dict[str, Metric]) -> Dict[str, State]:
    """Initializes a dict of metric states keyed like `metrics`."""
    return {name: m.init() for name, m in metrics.items()}


def result_all(
    metrics: Dict[str, Metric], states: Dict[str, State]
) -> Dict[str, Array]:
    return {name: m.result(states[name]) for name, m in metrics.items()}


def merge_states(state_a: State, state_b: State) -> State:
    """Merges two metric states by summation (valid for all metrics here)."""
    return jax.tree_util.tree_map(lambda a, b: a + b, state_a, state_b)
