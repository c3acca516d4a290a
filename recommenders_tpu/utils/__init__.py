"""Utilities: activations, checkpointing, profiling."""

from recommenders_tpu.utils import activations
from recommenders_tpu.utils import checkpoint

__all__ = ["activations", "checkpoint"]
