"""Declarative embedding configuration: TableConfig / FeatureConfig.

TPU-native counterpart of `tf.tpu.experimental.embedding.TableConfig` /
`FeatureConfig` as used by the reference's TPUEmbedding layer
(`tensorflow_recommenders/layers/embedding/tpu_embedding_layer.py:125-177`):
tables declare vocabulary/dim/combiner/initializer/optimizer; features
reference a table (several features may share one) and optionally declare
sequence outputs.

Plain frozen dataclasses — no registry, no global state. Hashable so they
can be fields of flax modules.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple, Union

import jax

Array = jax.Array
Initializer = Callable[..., Array]
# Float, or a schedule `step -> lr` (evaluated inside the jitted update).
LearningRate = Union[float, Callable[[Array], Array]]

VALID_COMBINERS = ("sum", "mean", "sqrtn")

# Id value marking padding positions in fixed-length id matrices. TF uses
# sparse/ragged tensors; static-shape TPU code uses dense [B, L] ids with
# this sentinel instead.
PAD_ID = -1


@dataclasses.dataclass(frozen=True)
class OptimizerSpec:
    """Per-table sparse-optimizer spec (applied shard-local).

    Mirrors the role of `tf.tpu.experimental.embedding.{SGD,Adagrad,Adam,
    FTRL}` objects accepted by the reference layer
    (tpu_embedding_layer.py:1014-1082). `kind` selects the update rule in
    `recommenders_tpu.embedding.sparse_optimizer`.

    `learning_rate` may be a float or a schedule `step -> lr` evaluated
    inside the jitted update on the engine's step counter — the
    counterpart of the reference's dynamic-learning-rate translation
    (tpu_embedding_layer.py:1014-1082 accepts Keras schedules and
    callables for the embedding optimizers).

    `kind="clippy"` is sparse ClippyAdagrad — the reference's
    IndexedSlices path (experimental/optimizers/clippy_adagrad.py:165-188)
    — so the flagship-paper optimizer can train engine-managed tables;
    the clippy_* thresholds mirror that class's constructor.
    """

    # sgd | adagrad | rowwise_adagrad | adam | ftrl | clippy.
    # "rowwise_adagrad" keeps ONE accumulator scalar per row (the
    # FBGEMM/TorchRec DLRM default; exceeds the reference's optimizer
    # set): 1/dim the slot memory and slot HBM traffic of "adagrad".
    kind: str = "adagrad"
    learning_rate: LearningRate = 0.01
    initial_accumulator_value: float = 0.1
    beta1: float = 0.9
    beta2: float = 0.999
    epsilon: float = 1e-7
    # FTRL parameters.
    learning_rate_power: float = -0.5
    l1_regularization_strength: float = 0.0
    l2_regularization_strength: float = 0.0
    # Clippy parameters (kind="clippy").
    variable_relative_threshold: float = 0.1
    accumulator_relative_threshold: float = 0.0
    absolute_threshold: float = 1e-7
    clip_accumulator_update: bool = False
    use_standard_accumulator_update: bool = False

    def lr_at(self, step: Array):
        """Resolves the learning rate at `step` (traced-safe)."""
        if callable(self.learning_rate):
            return self.learning_rate(step)
        return self.learning_rate


@dataclasses.dataclass(frozen=True)
class TableConfig:
    """Configuration for one embedding table.

    Attributes:
      vocabulary_size: Number of rows (ids in `[0, vocabulary_size)`).
      dim: Embedding width.
      name: Unique table name (also the parameter name).
      combiner: How multi-valent feature lookups reduce over the sequence
        axis: "sum" | "mean" | "sqrtn".
      initializer: Param initializer `(key, shape, dtype) -> Array`;
        defaults to truncated normal with stddev `1/sqrt(dim)` (the TF TPU
        embedding default).
      optimizer: Per-table sparse optimizer for the engine's decoupled
        update path; None inherits the collection-level optimizer.
      max_unique_ids: Optional bound on unique ids updated per step (the
        TF SparseCore's `max_unique_ids_per_partition` dial). When set,
        the engine's sparse update compacts deduplicated gradients to
        this fixed length, so every optimizer gather/scatter works over
        `max_unique_ids` rows instead of the batch's occurrence count —
        a large win for heavily duplicated batches. Steps with more
        unique ids than the bound DROP the excess rows' updates
        (deterministically, largest ids first); size it for the worst
        expected step.
    """

    vocabulary_size: int
    dim: int
    name: str
    combiner: str = "mean"
    initializer: Optional[Initializer] = None
    optimizer: Optional[OptimizerSpec] = None
    max_unique_ids: Optional[int] = None

    def __post_init__(self):
        if self.combiner not in VALID_COMBINERS:
            raise ValueError(
                f"combiner must be one of {VALID_COMBINERS}, got "
                f"{self.combiner!r}"
            )
        if self.vocabulary_size <= 0 or self.dim <= 0:
            raise ValueError(
                "vocabulary_size and dim must be positive, got "
                f"{self.vocabulary_size} and {self.dim}."
            )
        if self.max_unique_ids is not None and self.max_unique_ids <= 0:
            raise ValueError(
                f"max_unique_ids must be positive, got "
                f"{self.max_unique_ids}."
            )


@dataclasses.dataclass(frozen=True)
class FeatureConfig:
    """Configuration for one input feature.

    Attributes:
      table: The table this feature looks up (tables may be shared).
      name: Feature name (the key in the input features dict).
      max_sequence_length: If > 0, the lookup output keeps the sequence
        axis (`[B, L, dim]`, padding rows zeroed) instead of combining.
      output_shape: Optional trailing batch shape override (rarely needed;
        kept for config parity).
    """

    table: TableConfig
    name: str
    max_sequence_length: int = 0
    output_shape: Optional[Tuple[int, ...]] = None


def default_initializer(dim: int) -> Initializer:
    """Truncated normal, stddev 1/sqrt(dim)."""
    import jax.numpy as jnp  # Local to avoid import cycles at module load.
    from jax import random

    def init(key, shape, dtype=jnp.float32):
        return (
            random.truncated_normal(key, -2.0, 2.0, shape, dtype)
            / (dim ** 0.5)
        )

    return init
