"""Utilities: activations, checkpointing, export, profiling."""

from recommenders_tpu.utils import activations
from recommenders_tpu.utils import checkpoint
from recommenders_tpu.utils import export
from recommenders_tpu.utils import profiling

__all__ = ["activations", "checkpoint", "export", "profiling"]
