"""Mesh-sharded embedding collection.

TPU-native replacement for the reference's `TPUEmbedding` Keras layer
(`tensorflow_recommenders/layers/embedding/tpu_embedding_layer.py:226`) and
the TF C++ TPU embedding engine behind it. The entire Keras machinery that
layer exists to manage — mid-level API selection, enqueue/dequeue host
channels, custom-gradient traps, dummy variables, stale checkpoint
placeholders (tpu_embedding_layer.py:671-720,757-856,940-967) — disappears
in JAX: tables are ordinary parameters annotated with
`nn.with_partitioning((MODEL_AXIS, None))`, lookups are gathers on sharded
operands (GSPMD inserts the cross-chip collectives), and gradients flow
through plain autodiff as scatter-adds into the sharded table.

The same module runs unmodified on CPU, a single chip, or a mesh — the
CPU/TPU checkpoint-layout compatibility the reference builds by hand
(tpu_embedding_layer.py:499-533) holds by construction.

Feature semantics (parity with the TF mid-level API):
  - scalar ids `[B]` → `[B, dim]`;
  - multivalent ids `[B, L]` with `PAD_ID` padding → combined `[B, dim]`
    via the table's combiner (sum / mean / sqrtn), optionally weighted;
  - sequence features (`max_sequence_length > 0`) → `[B, L, dim]` with
    zeroed padding positions.

For vocabularies where dense gradient materialization is unacceptable
(100M+ rows), use `recommenders_tpu.embedding.engine.EmbeddingEngine`,
which updates tables with shard-local sparse optimizers outside autodiff.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from recommenders_tpu.embedding import config as config_lib
from recommenders_tpu.parallel import mesh as mesh_lib

Array = jax.Array
FeatureInput = Union[Array, Tuple[Array, Array]]  # ids or (ids, weights)

PAD_ID = config_lib.PAD_ID

# Tables are padded to a row multiple so any mesh axis size up to this
# divides the parameter evenly.
_ROW_MULTIPLE = 128


def _pad_vocab(vocabulary_size: int) -> int:
    return (
        (vocabulary_size + _ROW_MULTIPLE - 1) // _ROW_MULTIPLE
    ) * _ROW_MULTIPLE


def combine(
    embeddings: Array,
    ids: Array,
    combiner: str,
    weights: Optional[Array] = None,
) -> Array:
    """Reduces `[B, L, dim]` lookups to `[B, dim]` with padding masking.

    Padding positions (`ids == PAD_ID`) contribute nothing. Weighted
    semantics match the TF TPU embedding engine: sum = Σwᵢeᵢ,
    mean = Σwᵢeᵢ/Σwᵢ, sqrtn = Σwᵢeᵢ/√(Σwᵢ²).
    """
    valid = (ids != PAD_ID).astype(embeddings.dtype)
    if weights is None:
        weights = valid
    else:
        weights = weights.astype(embeddings.dtype) * valid
    weighted = embeddings * weights[..., None]
    total = jnp.sum(weighted, axis=1)
    if combiner == "sum":
        return total
    if combiner == "mean":
        denom = jnp.maximum(jnp.sum(weights, axis=1), 1e-12)
        return total / denom[:, None]
    if combiner == "sqrtn":
        denom = jnp.maximum(
            jnp.sqrt(jnp.sum(jnp.square(weights), axis=1)), 1e-12
        )
        return total / denom[:, None]
    raise ValueError(f"Unknown combiner {combiner!r}")


def lookup_feature(
    table: Array,
    feature_config: config_lib.FeatureConfig,
    feature: FeatureInput,
) -> Array:
    """Looks one feature up in a (possibly sharded) table. Pure function."""
    if isinstance(feature, tuple):
        ids, weights = feature
    else:
        ids, weights = feature, None

    combiner = feature_config.table.combiner
    if ids.ndim == 1:
        # Scalar feature: plain gather.
        safe_ids = jnp.maximum(ids, 0)
        out = jnp.take(table, safe_ids, axis=0)
        return jnp.where((ids != PAD_ID)[:, None], out, 0.0)

    if ids.ndim != 2:
        raise ValueError(
            f"Feature {feature_config.name!r} ids must be rank 1 or 2, got "
            f"shape {ids.shape}."
        )
    safe_ids = jnp.maximum(ids, 0)
    gathered = jnp.take(table, safe_ids, axis=0)  # [B, L, dim]
    if feature_config.max_sequence_length > 0:
        # Sequence output: zero padding positions, keep the sequence axis.
        mask = (ids != PAD_ID)[..., None].astype(gathered.dtype)
        return gathered * mask
    return combine(gathered, ids, combiner, weights)


class TpuEmbedding(nn.Module):
    """Sharded embedding collection as a flax module.

    Tables are parameters named after their `TableConfig.name`, row-padded
    to a lane multiple and partitioned over the mesh's model axis. Several
    features may share one table.

    Example:

    ```python
    user_table = TableConfig(10_000, 64, name="user")
    movie_table = TableConfig(50_000, 64, name="movie")
    emb = TpuEmbedding(feature_configs=(
        FeatureConfig(user_table, name="user_id"),
        FeatureConfig(movie_table, name="movie_id"),
        FeatureConfig(movie_table, name="watch_history",
                      max_sequence_length=10),
    ))
    activations = emb({"user_id": ids_b, "movie_id": ids_b,
                       "watch_history": ids_bl})
    ```

    Attributes:
      feature_configs: The feature declarations.
      table_axis: Mesh axis name over which table rows are sharded.
      shard_tables: If False, tables are replicated (the reference's
        TPUEmbeddingV0 fallback, tpu_embedding_layer.py:592-594).
      dtype: Table parameter dtype.
    """

    feature_configs: Sequence[config_lib.FeatureConfig]
    table_axis: str = mesh_lib.MODEL_AXIS
    shard_tables: bool = True
    dtype: jnp.dtype = jnp.float32

    def _tables(self) -> Dict[str, config_lib.TableConfig]:
        tables = {}
        for fc in self.feature_configs:
            existing = tables.get(fc.table.name)
            if existing is not None and existing != fc.table:
                raise ValueError(
                    f"Two different TableConfigs share the name "
                    f"{fc.table.name!r}."
                )
            tables[fc.table.name] = fc.table
        return tables

    @nn.compact
    def __call__(
        self, features: Mapping[str, FeatureInput]
    ) -> Dict[str, Array]:
        table_params: Dict[str, Array] = {}
        for name, tc in self._tables().items():
            init = tc.initializer or config_lib.default_initializer(tc.dim)
            padded = _pad_vocab(tc.vocabulary_size)
            if self.shard_tables:
                init = nn.with_partitioning(
                    init, (self.table_axis, None)
                )
            table_params[name] = self.param(
                name, init, (padded, tc.dim), self.dtype
            )

        configs = {fc.name: fc for fc in self.feature_configs}
        unknown = set(features) - set(configs)
        if unknown:
            raise ValueError(
                f"Features {sorted(unknown)} have no FeatureConfig. "
                f"Known: {sorted(configs)}."
            )

        activations = {}
        for fname, feature in features.items():
            fc = configs[fname]
            activations[fname] = lookup_feature(
                table_params[fc.table.name], fc, feature
            )
        return activations

    def table_dict(self, params) -> Dict[str, Array]:
        """Extracts (unboxed) table arrays from a params collection."""
        own = params["params"] if "params" in params else params
        return {name: nn.meta.unbox(own[name]) for name in self._tables()}
