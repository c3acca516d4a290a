"""Partial embedding: shard big tables, replicate small ones.

Counterpart of the reference's `PartialTPUEmbedding`
(`tensorflow_recommenders/experimental/layers/embedding/
partial_tpu_embedding.py:26`): tables with
`vocabulary_size > size_threshold` go to the mesh-sharded embedding
collection; smaller tables are replicated (dense per-device copies), which
avoids cross-chip traffic for lookups that fit everywhere. Table sharing
across features is preserved in both partitions.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Sequence

import flax.linen as nn
import jax

from recommenders_tpu.embedding import config as config_lib
from recommenders_tpu.embedding import embedding as embedding_lib
from recommenders_tpu.parallel import mesh as mesh_lib

Array = jax.Array


class PartialEmbedding(nn.Module):
    """Routes features to sharded or replicated tables by vocabulary size.

    Attributes:
      feature_configs: All feature declarations.
      size_threshold: Tables with `vocabulary_size > size_threshold` are
        sharded; the rest replicated. `0` shards everything; `None`
        replicates everything (matching the reference's semantics,
        partial_tpu_embedding.py:60-76).
      table_axis: Mesh axis for the sharded partition.
    """

    feature_configs: Sequence[config_lib.FeatureConfig]
    size_threshold: Optional[int] = 10_000
    table_axis: str = mesh_lib.MODEL_AXIS

    def _partition(self):
        big, small = [], []
        for fc in self.feature_configs:
            if (
                self.size_threshold is not None
                and fc.table.vocabulary_size > self.size_threshold
            ):
                big.append(fc)
            else:
                small.append(fc)
        return tuple(big), tuple(small)

    @nn.compact
    def __call__(
        self, features: Mapping[str, embedding_lib.FeatureInput]
    ) -> Dict[str, Array]:
        big, small = self._partition()
        big_names = {fc.name for fc in big}
        small_names = {fc.name for fc in small}

        out: Dict[str, Array] = {}
        big_inputs = {k: v for k, v in features.items() if k in big_names}
        small_inputs = {
            k: v for k, v in features.items() if k in small_names
        }
        unknown = set(features) - big_names - small_names
        if unknown:
            raise ValueError(
                f"Features {sorted(unknown)} have no FeatureConfig."
            )

        if big_inputs:
            out.update(
                embedding_lib.TpuEmbedding(
                    feature_configs=big,
                    table_axis=self.table_axis,
                    shard_tables=True,
                    name="sharded_embedding",
                )(big_inputs)
            )
        if small_inputs:
            out.update(
                embedding_lib.TpuEmbedding(
                    feature_configs=small,
                    shard_tables=False,
                    name="dense_embedding",
                )(small_inputs)
            )
        return out
