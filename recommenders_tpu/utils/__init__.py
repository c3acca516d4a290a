"""Utilities: activations, checkpointing, profiling."""

from recommenders_tpu.utils import activations

__all__ = ["activations"]
