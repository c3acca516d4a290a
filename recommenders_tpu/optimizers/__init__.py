"""Optimizers: Clippy Adagrad and composite (partitioned) optimization."""

from recommenders_tpu.optimizers.clippy_adagrad import ClippyAdagradState
from recommenders_tpu.optimizers.clippy_adagrad import clippy_adagrad
from recommenders_tpu.optimizers.clippy_adagrad import shrink_by_references
from recommenders_tpu.optimizers.composite import composite_optimizer
from recommenders_tpu.optimizers.composite import path_contains

__all__ = [
    "ClippyAdagradState",
    "clippy_adagrad",
    "shrink_by_references",
    "composite_optimizer",
    "path_contains",
]
