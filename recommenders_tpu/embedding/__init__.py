"""Sharded embedding engine: configs, collections, sparse optimizers."""

from recommenders_tpu.embedding.config import FeatureConfig
from recommenders_tpu.embedding.config import OptimizerSpec
from recommenders_tpu.embedding.config import PAD_ID
from recommenders_tpu.embedding.config import TableConfig
from recommenders_tpu.embedding.embedding import TpuEmbedding
from recommenders_tpu.embedding.embedding import combine
from recommenders_tpu.embedding.embedding import lookup_feature
from recommenders_tpu.embedding.partial import PartialEmbedding
from recommenders_tpu.embedding.unified import UnifiedEmbedding
from recommenders_tpu.embedding.unified import UnifiedEmbeddingConfig
from recommenders_tpu.embedding import sparse_optimizer
from recommenders_tpu.embedding.engine import EmbeddingEngine
from recommenders_tpu.embedding.engine import EngineState

__all__ = [
    "FeatureConfig",
    "OptimizerSpec",
    "PAD_ID",
    "TableConfig",
    "TpuEmbedding",
    "combine",
    "lookup_feature",
    "PartialEmbedding",
    "UnifiedEmbedding",
    "UnifiedEmbeddingConfig",
    "sparse_optimizer",
    "EmbeddingEngine",
    "EngineState",
]
