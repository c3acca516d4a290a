"""Unified Embedding: feature multiplexing into shared hashed tables.

Counterpart of the reference's `UnifiedEmbedding`
(`tensorflow_recommenders/layers/feature_multiplexing/unified_embedding.py:
68,138`), implementing the "Unified Embedding" scheme (Coleman et al.): N
categorical features are multi-salt-hashed into a pool of shared tables
assigned round-robin; each feature's `num_chunks` lookups are concatenated
into its final embedding.
"""

from __future__ import annotations

from typing import Dict, List, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp

from recommenders_tpu.embedding import config as config_lib
from recommenders_tpu.embedding import embedding as embedding_lib
from recommenders_tpu.ops import hashing
from recommenders_tpu.parallel import mesh as mesh_lib

Array = jax.Array


class UnifiedEmbeddingConfig:
    """Builds the shared-table + hashing configuration.

    Mirrors the reference's config object (unified_embedding.py:68-135):
    `num_tables` shared tables of `buckets_per_table` x `dim_per_table`;
    `add_feature(name, num_chunks)` assigns the feature's chunks to tables
    round-robin and records a distinct `(feature_idx, chunk_idx)` hash salt
    per chunk.
    """

    def __init__(
        self,
        buckets_per_table: int,
        dim_per_table: int,
        num_tables: int,
        name: str,
        **table_kwargs,
    ) -> None:
        self.buckets_per_table = buckets_per_table
        self.name = name
        self._current_table = 0
        self._num_features = 0
        self.table_configs = [
            config_lib.TableConfig(
                vocabulary_size=buckets_per_table,
                dim=dim_per_table,
                name=f"{name}_{i}",
                **table_kwargs,
            )
            for i in range(num_tables)
        ]
        # feature name -> {chunk lookup name: FeatureConfig}
        self.embedding_config: Dict[str, Dict[str, config_lib.FeatureConfig]]
        self.embedding_config = {}
        # feature name -> {chunk lookup name: (num_bins, salt)}
        self.hashing_config: Dict[str, Dict[str, tuple]] = {}

    def add_feature(self, name: str, num_chunks: int, **kwargs) -> None:
        """Registers a feature with `num_chunks` hashed lookups."""
        chunk_embed, chunk_hash = {}, {}
        for chunk_id in range(num_chunks):
            chunk_name = f"{self.name}_{name}_lookup_{chunk_id}"
            chunk_embed[chunk_name] = config_lib.FeatureConfig(
                table=self.table_configs[self._current_table],
                name=chunk_name,
                **kwargs,
            )
            chunk_hash[chunk_name] = (
                self.buckets_per_table,
                (self._num_features, chunk_id),
            )
            self._current_table = (
                self._current_table + 1
            ) % len(self.table_configs)
        self._num_features += 1
        self.embedding_config[name] = chunk_embed
        self.hashing_config[name] = chunk_hash


class UnifiedEmbedding(nn.Module):
    """Hash → shared-table lookup → per-feature concat.

    Returns a list of `[B, num_chunks * dim_per_table]` embeddings in the
    order features were added to the config (matching the reference's
    output contract, unified_embedding.py:186-215).
    """

    config: UnifiedEmbeddingConfig
    table_axis: str = mesh_lib.MODEL_AXIS
    shard_tables: bool = True

    @nn.compact
    def __call__(self, features: Mapping[str, Array]) -> List[Array]:
        all_feature_configs = tuple(
            fc
            for chunks in self.config.embedding_config.values()
            for fc in chunks.values()
        )

        hashed: Dict[str, Array] = {}
        for name, chunks in self.config.hashing_config.items():
            feature = features[name]
            for chunk_name, (num_bins, salt) in chunks.items():
                hashed[chunk_name] = hashing.hash_bucket(
                    feature, num_bins, salt
                )

        activations = embedding_lib.TpuEmbedding(
            feature_configs=all_feature_configs,
            table_axis=self.table_axis,
            shard_tables=self.shard_tables,
            name="shared_tables",
        )(hashed)

        outputs = []
        for name, chunks in self.config.embedding_config.items():
            parts = [activations[k] for k in sorted(chunks.keys())]
            outputs.append(jnp.concatenate(parts, axis=-1))
        return outputs
