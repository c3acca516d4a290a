"""Layers: loss shaping, retrieval indexes, feature interactions, blocks."""

from recommenders_tpu.layers import factorized_top_k
from recommenders_tpu.layers import loss

__all__ = ["factorized_top_k", "loss"]
