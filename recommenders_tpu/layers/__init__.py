"""Layers: loss shaping, retrieval indexes, feature interactions, blocks."""

from recommenders_tpu.layers import approximate
from recommenders_tpu.layers import blocks
from recommenders_tpu.layers import factorized_top_k
from recommenders_tpu.layers import feature_interaction
from recommenders_tpu.layers import loss
from recommenders_tpu.layers import sequential

__all__ = [
    "approximate",
    "blocks",
    "factorized_top_k",
    "feature_interaction",
    "loss",
    "sequential",
]
