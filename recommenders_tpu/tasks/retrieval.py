"""A factorized retrieval task: in-batch sampled softmax, TPU-native.

Functional JAX counterpart of the reference's `tfrs.tasks.Retrieval`
(`tensorflow_recommenders/tasks/retrieval.py:29`). The loss math is a pure
function of arrays so it jits/differentiates/shards cleanly; metric updates
(which TFRS performs inside `Retrieval.call`) are returned to the caller as
structured outputs instead of being applied through side effects.

Scoring semantics match the reference exactly:
  - `scores = Q @ Cᵀ`, or maxsim over heads for `[q, heads, d]` queries
    (tasks/retrieval.py:172-180);
  - identity labels `eye(num_queries, num_candidates)` so extra rows of
    `candidate_embeddings` act as shared extra negatives
    (tasks/retrieval.py:182-185);
  - optional temperature, log-q sampling-probability correction,
    accidental-hit removal, score masking, and hard-negative mining
    (tasks/retrieval.py:187-208);
  - softmax cross-entropy with SUM reduction over the batch and optional
    per-query sample weights (tasks/retrieval.py:86-87,210).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from recommenders_tpu.layers import loss as loss_layers
from recommenders_tpu.tasks import base

Array = jax.Array

MIN_FLOAT = loss_layers.MIN_FLOAT


def softmax_cross_entropy(
    labels: Array,
    logits: Array,
    sample_weight: Optional[Array] = None,
) -> Array:
    """Softmax cross-entropy, summed over the batch.

    Matches `tf.keras.losses.CategoricalCrossentropy(from_logits=True,
    reduction=SUM)` as used by the reference retrieval task
    (tasks/retrieval.py:86-87): per-row CE of the (possibly soft) label
    distribution against log-softmax of the logits, weighted per row, then
    summed (not averaged) over rows.
    """
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    per_example = -jnp.sum(labels * log_probs, axis=-1)
    if sample_weight is not None:
        per_example = per_example * jnp.reshape(
            sample_weight, per_example.shape
        )
    return jnp.sum(per_example)


class RetrievalOutput(NamedTuple):
    """Structured output of the retrieval task.

    Attributes:
      loss: Scalar loss (summed over the batch).
      logits: `[num_queries, num_kept]` final logits fed to the loss (after
        temperature / corrections / mining).
      labels: `[num_queries, num_kept]` labels aligned with `logits`.
      scores: `[num_queries, num_candidates]` raw (pre-correction, but
        post-temperature) in-batch scores, useful for batch metrics.

    With `Retrieval(fused=True)` only `loss` is set — logits, labels
    and scores are None because the fused kernel never materializes
    them.
    """

    loss: Array
    logits: Array
    labels: Array
    scores: Array


@dataclasses.dataclass(frozen=True)
class Retrieval(base.Task):
    """In-batch sampled-softmax retrieval loss.

    Example:

    ```python
    task = Retrieval(temperature=0.05, remove_accidental_hits=True)
    out = task(query_embeddings, candidate_embeddings,
               candidate_ids=candidate_ids)
    loss = out.loss
    ```

    Attributes:
      loss_fn: Loss taking `(labels, logits, sample_weight)` and returning a
        scalar. Defaults to softmax CE with SUM reduction.
      temperature: Softmax temperature; scores are divided by it.
      num_hard_negatives: If set, keep only this many highest-scoring
        negatives (plus the positive) per query when computing the loss.
      remove_accidental_hits: If True, in-batch negatives sharing the
        positive's candidate id are masked out (requires `candidate_ids`).
      score_dtype: If set (e.g. `jnp.bfloat16`), embeddings are cast to
        this dtype before the scoring matmul while accumulation stays
        f32 (`preferred_element_type`) — halves the MXU input bandwidth
        on TPU with near-f32 numerics. Loss math downstream is f32.
      fused: If True, the loss is computed by the flash-CE Pallas
        kernel (`ops/fused_retrieval.py`): the `[B, C]` score matrix is
        GUARANTEED never to materialize in HBM (XLA usually fuses the
        unfused path just as well when only `.loss` is consumed — use
        this when that guarantee matters, e.g. very large pooled
        negatives). Same value
        and gradients as the unfused path for temperature / log-q /
        accidental hits / sample weights / extra negatives; maxsim
        queries, `num_hard_negatives` and `score_mask` are
        incompatible and raise. The returned `RetrievalOutput` carries
        only `loss` (logits/labels/scores are None — per-batch top-k
        metrics need the unfused task). Off-TPU it falls back to
        identical-math jnp (still loss-only).
    """

    loss_fn: Callable[..., Array] = softmax_cross_entropy
    temperature: Optional[float] = None
    num_hard_negatives: Optional[int] = None
    remove_accidental_hits: bool = False
    score_dtype: Optional[jnp.dtype] = None
    fused: bool = False

    def __call__(
        self,
        query_embeddings: Array,
        candidate_embeddings: Array,
        sample_weight: Optional[Array] = None,
        candidate_sampling_probability: Optional[Array] = None,
        candidate_ids: Optional[Array] = None,
        score_mask: Optional[Array] = None,
    ) -> RetrievalOutput:
        """Computes the retrieval loss.

        Args:
          query_embeddings: `[num_queries, dim]` queries, or
            `[num_queries, num_heads, dim]` for maxsim scoring.
          candidate_embeddings: `[num_candidates, dim]` candidates with
            `num_candidates >= num_queries`; row i is the positive for query
            i, any extra rows are shared extra negatives.
          sample_weight: Optional `[num_queries]` weights.
          candidate_sampling_probability: Optional `[num_candidates]` sampling
            probabilities for log-q correction.
          candidate_ids: Optional `[num_candidates]` ids, required when
            `remove_accidental_hits=True`.
          score_mask: Optional `[num_queries, num_candidates]` boolean mask;
            False entries are excluded from the loss.

        Returns:
          A `RetrievalOutput`.
        """
        if self.fused:
            if (
                query_embeddings.ndim != 2
                or self.num_hard_negatives is not None
                or score_mask is not None
                or self.loss_fn is not softmax_cross_entropy
            ):
                raise ValueError(
                    "Retrieval(fused=True) supports 2D queries with the "
                    "default softmax CE loss and no hard-negative "
                    "mining or score mask; use the unfused task for "
                    "those knobs."
                )
            from recommenders_tpu.ops import fused_retrieval

            loss = fused_retrieval.fused_retrieval_loss(
                query_embeddings,
                candidate_embeddings,
                sample_weight=sample_weight,
                candidate_sampling_probability=(
                    candidate_sampling_probability
                ),
                candidate_ids=candidate_ids,
                temperature=self.temperature,
                remove_accidental_hits=self.remove_accidental_hits,
                score_dtype=self.score_dtype,
            )
            return RetrievalOutput(
                loss=loss, logits=None, labels=None, scores=None
            )
        if self.score_dtype is not None:
            query_embeddings = query_embeddings.astype(self.score_dtype)
            candidate_embeddings = candidate_embeddings.astype(
                self.score_dtype
            )
        if query_embeddings.ndim == 3:
            # Maxsim: best head per (query, candidate) pair.
            scores = jnp.einsum(
                "qne,ce->qnc",
                query_embeddings,
                candidate_embeddings,
                preferred_element_type=jnp.float32,
            )
            scores = jnp.max(scores, axis=1)
        else:
            scores = jax.lax.dot_general(
                query_embeddings,
                candidate_embeddings,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        num_queries, num_candidates = scores.shape
        labels = jnp.eye(num_queries, num_candidates, dtype=scores.dtype)

        if self.temperature is not None:
            scores = scores / self.temperature

        batch_scores = scores  # Post-temperature scores for batch metrics.
        logits = scores

        if candidate_sampling_probability is not None:
            logits = loss_layers.sampling_probability_correction(
                logits, candidate_sampling_probability
            )

        if self.remove_accidental_hits:
            if candidate_ids is None:
                raise ValueError(
                    "When accidental hit removal is enabled, candidate ids "
                    "must be supplied."
                )
            logits = loss_layers.remove_accidental_hits(
                labels, logits, candidate_ids
            )

        if score_mask is not None:
            logits = jnp.where(score_mask, logits, MIN_FLOAT)

        out_labels = labels
        if self.num_hard_negatives is not None:
            logits, out_labels = loss_layers.hard_negative_mining(
                logits, labels, self.num_hard_negatives
            )

        loss = self.loss_fn(out_labels, logits, sample_weight)

        return RetrievalOutput(
            loss=loss, logits=logits, labels=out_labels, scores=batch_scores
        )


def cross_replica_concat(values: Array, axis_name: str) -> Array:
    """All-gathers `values` across an SPMD axis, own shard first.

    JAX/`shard_map` counterpart of the reference's `_cross_replica_concat`
    (tasks/retrieval.py:238-321): gathers per-device values along axis 0,
    then rolls so this device's contribution comes first. Used to pool
    in-batch negatives across data-parallel shards while keeping each
    shard's own positives on the diagonal.

    Must be called inside a `shard_map`/`pmap` context with `axis_name`
    bound.
    """
    gathered = jax.lax.all_gather(values, axis_name, axis=0, tiled=True)
    shift = jax.lax.axis_index(axis_name) * values.shape[0]
    return jnp.roll(gathered, -shift, axis=0)
