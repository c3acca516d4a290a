"""Corpus-level factorized top-K retrieval metrics.

Counterpart of `tfrs.metrics.FactorizedTopK`
(`tensorflow_recommenders/metrics/factorized_top_k.py:27,52`): top-K
categorical accuracy at multiple cutoffs, computed against a retrieval
index over the full candidate corpus. Supports both evaluation modes of
the reference:

  - score-based (no true ids): the positive's exact score is compared
    against the scores returned by the index, with `tf.math.in_top_k` tie
    semantics (metrics/factorized_top_k.py:181-192);
  - id-based (true ids given): retrieved ids are matched against the true
    ids, padded entries (MIN_FLOAT-score slots — this package's analog of
    the reference's NaN padding) ignored, multiple matches counted once
    (metrics/factorized_top_k.py:141-180). Required for approximate
    indexes, whose scores are not comparable to exact dot products.

States are pure pytrees (one `Mean` per cutoff), so evaluation loops can
run under jit and merge states across data-parallel shards.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from recommenders_tpu.layers import factorized_top_k as layers_ftk
from recommenders_tpu.metrics import base as metrics_base

Array = jax.Array
State = Any

DEFAULT_KS = (1, 5, 10, 50, 100)


class Factorized:
    """Base class for corpus-level factorized metrics."""


class FactorizedTopK(Factorized):
    """Top-K categorical accuracy over a candidate corpus.

    Example:

    ```python
    metric = FactorizedTopK(
        candidates=BruteForce().index(corpus_embeddings, corpus_ids),
        ks=(1, 5, 10, 50, 100),
    )
    state = metric.init()
    state = metric.update(state, query_embeddings, true_candidate_embeddings)
    print(metric.result(state))  # {"top_1_categorical_accuracy": ..., ...}
    ```
    """

    def __init__(
        self,
        candidates: Union[layers_ftk.TopK, Array, Iterable],
        ks: Sequence[int] = DEFAULT_KS,
        name: str = "factorized_top_k",
    ) -> None:
        if not isinstance(candidates, layers_ftk.TopK):
            # Auto-wrap raw candidate arrays / iterables into a streaming
            # index, like the reference (metrics/factorized_top_k.py:77-81).
            index = layers_ftk.Streaming(k=max(ks))
            if hasattr(candidates, "ndim"):
                index.index(candidates)
            else:
                index.index_from_dataset(candidates)
            candidates = index
        self._ks = tuple(ks)
        self._candidates = candidates
        self.name = name
        self._mean = metrics_base.Mean()

    @property
    def ks(self) -> Sequence[int]:
        return self._ks

    @property
    def candidates(self) -> layers_ftk.TopK:
        return self._candidates

    def metric_names(self) -> Sequence[str]:
        return [
            f"{self.name}/top_{k}_categorical_accuracy" for k in self._ks
        ]

    def init(self) -> State:
        return {k: self._mean.init() for k in self._ks}

    def update(
        self,
        state: State,
        query_embeddings: Array,
        true_candidate_embeddings: Array,
        true_candidate_ids: Optional[Array] = None,
        sample_weight: Optional[Array] = None,
    ) -> State:
        """Updates per-cutoff accuracy states for a batch of queries."""
        if true_candidate_ids is None and not self._candidates.is_exact():
            raise ValueError(
                f"The candidate generation layer ({self._candidates}) does "
                "not return exact results. To perform evaluation using that "
                "layer, you must supply `true_candidate_ids`, which will be "
                "checked against the candidate ids returned from the "
                "candidate generation layer."
            )

        positive_scores = jnp.sum(
            query_embeddings * true_candidate_embeddings,
            axis=1,
            keepdims=True,
        ).astype(jnp.float32)

        top_k_predictions, retrieved_ids = self._candidates(
            query_embeddings, k=max(self._ks)
        )

        new_state = dict(state)
        if true_candidate_ids is not None:
            # Id-based evaluation.
            if true_candidate_ids.ndim == 1:
                true_candidate_ids = true_candidate_ids[:, None]
            # Padding slots (k > corpus, masked leaf slots, …) carry the
            # MIN_FLOAT sentinel in every index in this package — the
            # analog of the reference's NaN padding
            # (metrics/factorized_top_k.py:125-131); without the mask a
            # padded slot's id 0 could spuriously match true id 0.
            padding = top_k_predictions <= layers_ftk.MIN_FLOAT / 2
            ids_match = (
                jnp.equal(true_candidate_ids, retrieved_ids) & ~padding
            ).astype(jnp.float32)
            for k in self._ks:
                match_found = jnp.clip(
                    jnp.sum(ids_match[:, :k], axis=1), 0.0, 1.0
                )
                new_state[k] = self._mean.update(
                    state[k], match_found, sample_weight
                )
        else:
            # Score-based evaluation with in_top_k tie semantics: the
            # positive is in the top k if strictly fewer than k retrieved
            # scores exceed it.
            num_higher = jnp.sum(
                (top_k_predictions > positive_scores).astype(jnp.int32),
                axis=1,
            )
            for k in self._ks:
                in_top_k = (num_higher < k).astype(jnp.float32)
                new_state[k] = self._mean.update(
                    state[k], in_top_k, sample_weight
                )
        return new_state

    def result(self, state: State) -> Dict[str, Array]:
        return {
            name: self._mean.result(state[k])
            for name, k in zip(self.metric_names(), self._ks)
        }
