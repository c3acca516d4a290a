"""Prebuilt Ranking model: the DLRM / DCN-v2 skeleton, TPU-native.

Counterpart of `tfrs.experimental.models.Ranking`
(`tensorflow_recommenders/experimental/models/ranking.py:27`): sharded
embedding layer over the sparse features → bottom MLP over the dense
features → feature interaction over [sparse embeddings..., dense embedding]
→ optional re-concat of the dense embedding → top MLP → sigmoid → Ranking
task (BCE) with AUC / accuracy / label-mean / prediction-mean metrics.

TPU-first notes:
  - The embedding layer is `PartialEmbedding`: tables above
    `size_threshold` rows are row-sharded over the mesh's model axis
    (GSPMD inserts the all-to-all/all-gather for the lookups); small
    tables are replicated. This subsumes the reference's
    TPUEmbedding/PartialTPUEmbedding pair without the enqueue/dequeue
    machinery (tpu_embedding_layer.py:757-856).
  - The reference scales its loss by `1/num_replicas_in_sync`
    (experimental/models/ranking.py:199-201) because each replica computes
    an independent mean. Under `jit` over a mesh the mean is already
    global, so no scaling is applied here.
  - `embedding_param_labels` provides the sparse/dense variable partition
    the reference exposes as `embedding_trainable_variables` /
    `dense_trainable_variables` (experimental/models/ranking.py:238-257),
    as optax `multi_transform` labels for `optimizers.composite`.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from recommenders_tpu.embedding import config as config_lib
from recommenders_tpu.embedding import partial as partial_lib
from recommenders_tpu.layers import blocks
from recommenders_tpu.layers.feature_interaction import dcn
from recommenders_tpu.layers.feature_interaction import dot_interaction
from recommenders_tpu.metrics import base as metrics_base
from recommenders_tpu.models import base as models_base
from recommenders_tpu.parallel import mesh as mesh_lib
from recommenders_tpu.tasks import ranking as ranking_task

Array = jax.Array

# Module factories so architectures stay configurable without carrying
# module instances (unhashable) as dataclass fields.
ModuleFactory = Callable[[], nn.Module]


def default_bottom_stack() -> nn.Module:
    """The reference's default bottom MLP ([256, 64, 16], relu throughout,
    experimental/models/ranking.py:96-102)."""
    return blocks.MLP(units=(256, 64, 16), final_activation="relu")


def default_top_stack() -> nn.Module:
    """The reference's default top MLP ([512, 256, 1], sigmoid head,
    experimental/models/ranking.py:104-110)."""
    return blocks.MLP(units=(512, 256, 1), final_activation="sigmoid")


def default_interaction() -> nn.Module:
    """DLRM dot interaction (the reference's default feature_interaction)."""
    return dot_interaction.DotInteraction(skip_gather=True)


def cross_interaction(projection_dim: Optional[int] = None) -> ModuleFactory:
    """DCN-v2 interaction factory (`interaction='cross'` in the reference
    test sweep, experimental/models/ranking_test.py:113-174)."""

    def make() -> nn.Module:
        return dcn.Cross(projection_dim=projection_dim)

    return make


def multi_layer_dcn_interaction(
    num_layers: int = 3, projection_dim: int = 1
) -> ModuleFactory:
    def make() -> nn.Module:
        return dcn.MultiLayerDCN(
            num_layers=num_layers, projection_dim=projection_dim
        )

    return make


class Ranking(models_base.Model):
    """DLRM/DCN-style ranking model.

    Input batches are dicts with:
      - `dense_features`: `[B, num_dense]` float array;
      - one entry per sparse `FeatureConfig` name: `[B]` (or `[B, L]`
        padded) int ids;
      - `clicked`: `[B]` float labels (when training/evaluating);
      - optional `sample_weight`: `[B]` floats.

    Attributes:
      feature_configs: Sparse feature declarations (tables may be shared).
      bottom_stack: Factory for the dense-feature MLP; its output width
        must equal the embedding dim for dot interaction.
      feature_interaction: Factory for the interaction block; it receives
        either a list of `[B, D]` arrays (dot interaction) or a single
        concatenated `[B, F*D]` array (cross family), selected by
        `interaction_takes_list`.
      top_stack: Factory for the output MLP (sigmoid head).
      interaction_takes_list: Whether the interaction consumes the stacked
        per-feature list (DLRM style) or one concatenated vector (DCN
        style). Defaults to DLRM style.
      concat_dense: Re-append the bottom-MLP output to the interaction
        output before the top stack (experimental/models/ranking.py:227-232).
      size_threshold: Vocab threshold for sharded-vs-replicated routing.
      table_axis: Mesh axis name for sharded tables.
      task: The ranking task (loss).
    """

    feature_configs: Sequence[config_lib.FeatureConfig] = ()
    bottom_stack: ModuleFactory = default_bottom_stack
    feature_interaction: ModuleFactory = default_interaction
    top_stack: ModuleFactory = default_top_stack
    interaction_takes_list: bool = True
    concat_dense: bool = True
    size_threshold: Optional[int] = 10_000
    table_axis: str = mesh_lib.MODEL_AXIS
    task: ranking_task.Ranking = ranking_task.Ranking()

    def setup(self):
        self.embedding_layer = partial_lib.PartialEmbedding(
            feature_configs=tuple(self.feature_configs),
            size_threshold=self.size_threshold,
            table_axis=self.table_axis,
            name="embedding",
        )
        self._bottom = self.bottom_stack()
        self._interaction = self.feature_interaction()
        self._top = self.top_stack()

    def __call__(self, batch: Dict[str, Any], training: bool = False) -> Array:
        """Forward pass: returns `[B]` click probabilities."""
        missing = [
            fc.name for fc in self.feature_configs if fc.name not in batch
        ]
        if missing:
            raise KeyError(
                f"Batch is missing sparse features {missing}; expected one "
                f"entry per FeatureConfig "
                f"({[fc.name for fc in self.feature_configs]})."
            )
        sparse = {fc.name: batch[fc.name] for fc in self.feature_configs}
        embeddings = self.embedding_layer(sparse)
        # Deterministic feature order: config order.
        sparse_list = [embeddings[fc.name] for fc in self.feature_configs]
        dense = self._bottom(batch["dense_features"])

        if self.interaction_takes_list:
            interaction_out = self._interaction(sparse_list + [dense])
        else:
            interaction_out = self._interaction(
                jnp.concatenate(sparse_list + [dense], axis=-1)
            )

        if self.concat_dense:
            interaction_out = jnp.concatenate(
                [dense, interaction_out], axis=-1
            )
        return jnp.reshape(self._top(interaction_out), (-1,))

    def compute_loss(
        self, batch: Dict[str, Any], training: bool = False
    ) -> Tuple[Array, Dict[str, Any]]:
        predictions = self(batch, training=training)
        labels = batch["clicked"]
        sample_weight = batch.get("sample_weight")
        out = self.task(labels, predictions, sample_weight=sample_weight)
        return out.loss, {"ranking": out}

    # --- Metrics (reference: AUC + accuracy + label/prediction means,
    #     experimental/models/ranking.py:111-127) -------------------------

    def metrics(self) -> Dict[str, metrics_base.Metric]:
        return {
            "auc": metrics_base.AUC(),
            "accuracy": metrics_base.BinaryAccuracy(),
            "label_mean": metrics_base.Mean(),
            "prediction_mean": metrics_base.Mean(),
        }

    def update_metrics(self, states, batch, aux):
        out: ranking_task.RankingOutput = aux["ranking"]
        m = self.metrics()
        weight = batch.get("sample_weight")
        return {
            "auc": m["auc"].update(
                states["auc"], out.labels, out.predictions, weight
            ),
            "accuracy": m["accuracy"].update(
                states["accuracy"], out.labels, out.predictions, weight
            ),
            "label_mean": m["label_mean"].update(
                states["label_mean"], out.labels, weight
            ),
            "prediction_mean": m["prediction_mean"].update(
                states["prediction_mean"], out.predictions, weight
            ),
        }


def embedding_param_labels(params) -> Any:
    """Labels each param `"embedding"` or `"dense"` for multi-optimizer use.

    The counterpart of the reference's `embedding_trainable_variables` /
    `dense_trainable_variables` split (experimental/models/ranking.py:238-257),
    expressed as an optax `multi_transform` label pytree: everything under
    the `embedding` submodule is labeled `"embedding"`.
    """

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    labels = []
    for path, _ in flat:
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        labels.append(
            "embedding" if any(k == "embedding" for k in keys) else "dense"
        )
    return jax.tree_util.tree_unflatten(treedef, labels)
