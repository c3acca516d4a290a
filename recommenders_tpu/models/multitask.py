"""Prebuilt joint retrieval + ranking (multitask) model.

The reference's multitask tutorial (`/root/reference/docs/examples/
multitask.ipynb`) combines a retrieval task and a rating-regression task
over shared towers with scalar loss weights; the reported quality target
is rating RMSE ≈ 1.11 on MovieLens (BASELINE.md). This packages that
composition over the prebuilt towers.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from recommenders_tpu.layers import blocks
from recommenders_tpu.metrics import base as metrics_base
from recommenders_tpu.models import base as models_base
from recommenders_tpu.models import retrieval as retrieval_model
from recommenders_tpu.tasks import ranking as ranking_task
from recommenders_tpu.tasks import retrieval as retrieval_task

Array = jax.Array
ModuleFactory = Callable[[], nn.Module]


def default_rating_head() -> nn.Module:
    """The tutorial's rating head: Dense(256) → Dense(128) → Dense(1)."""
    return blocks.MLP(units=(256, 128, 1))


class Multitask(models_base.Model):
    """Joint retrieval + rating model with weighted losses.

    Batches carry `query_key`, `candidate_key`, and `rating_key` entries.
    Setting a weight to 0 disables that task's gradient (the tutorial's
    retrieval-only / rating-only / joint sweep).

    Attributes:
      query_tower / candidate_tower: Tower factories (shared across tasks).
      rating_head: Factory for the rating MLP over
        `concat([query_emb, candidate_emb])`.
      query_key / candidate_key / rating_key: Batch keys.
      retrieval_weight / rating_weight: Scalar loss weights.
      temperature: Retrieval softmax temperature.
      fused: Compute the retrieval loss with the flash-CE Pallas kernel
        (scores never materialize; the per-batch top-k metric freezes).
    """

    query_tower: ModuleFactory = lambda: retrieval_model.EmbeddingTower(
        1000, 32
    )
    candidate_tower: ModuleFactory = lambda: retrieval_model.EmbeddingTower(
        1000, 32
    )
    rating_head: ModuleFactory = default_rating_head
    query_key: str = "user_id"
    candidate_key: str = "movie_id"
    rating_key: str = "user_rating"
    retrieval_weight: float = 1.0
    rating_weight: float = 1.0
    temperature: Optional[float] = None
    fused: bool = False

    def setup(self):
        self._query = self.query_tower()
        self._candidate = self.candidate_tower()
        self._rating = self.rating_head()
        self.retrieval_task = retrieval_task.Retrieval(
            temperature=self.temperature, fused=self.fused
        )
        self.rating_task = ranking_task.Ranking(
            loss_fn=ranking_task.mean_squared_error
        )

    def query_embeddings(self, batch) -> Array:
        return self._query(batch[self.query_key])

    def candidate_embeddings(self, batch) -> Array:
        return self._candidate(batch[self.candidate_key])

    def predict_rating(self, batch) -> Array:
        q = self.query_embeddings(batch)
        c = self.candidate_embeddings(batch)
        return self._rating(jnp.concatenate([q, c], axis=-1))[:, 0]

    def compute_loss(self, batch, training: bool = False):
        q = self.query_embeddings(batch)
        c = self.candidate_embeddings(batch)
        retrieval_out = self.retrieval_task(
            q, c, sample_weight=batch.get("sample_weight")
        )
        pred = self._rating(jnp.concatenate([q, c], axis=-1))[:, 0]
        rating_out = self.rating_task(
            batch[self.rating_key],
            pred,
            sample_weight=batch.get("sample_weight"),
        )
        loss = (
            self.retrieval_weight * retrieval_out.loss
            + self.rating_weight * rating_out.loss
        )
        return loss, {"retrieval": retrieval_out, "rating": rating_out}

    def metrics(self) -> Dict[str, metrics_base.Metric]:
        return {
            "rating_rmse": metrics_base.RootMeanSquaredError(),
            "batch_top_10_categorical_accuracy":
                metrics_base.TopKCategoricalAccuracy(k=10),
        }

    def update_metrics(self, states, batch, aux):
        rating_out: ranking_task.RankingOutput = aux["rating"]
        retrieval_out: retrieval_task.RetrievalOutput = aux["retrieval"]
        weight = batch.get("sample_weight")
        # Batch top-k uses the final (labels, logits) fed to the loss,
        # matching the reference (tasks/retrieval.py:230-234).
        new_states = {
            "rating_rmse": metrics_base.RootMeanSquaredError().update(
                states["rating_rmse"],
                rating_out.labels,
                rating_out.predictions,
                weight,
            ),
        }
        if retrieval_out.logits is None:
            # Fused retrieval task: logits never materialize, so the
            # per-batch top-k metric carries over unchanged.
            new_states["batch_top_10_categorical_accuracy"] = states[
                "batch_top_10_categorical_accuracy"
            ]
        else:
            new_states["batch_top_10_categorical_accuracy"] = (
                metrics_base.TopKCategoricalAccuracy(k=10).update(
                    states["batch_top_10_categorical_accuracy"],
                    retrieval_out.labels,
                    retrieval_out.logits,
                    weight,
                )
            )
        return new_states
