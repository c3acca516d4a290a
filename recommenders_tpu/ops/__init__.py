"""Low-level TPU ops: top-k primitives, scoring kernels, hashing."""

from recommenders_tpu.ops import hashing
from recommenders_tpu.ops import scoring
from recommenders_tpu.ops import topk

__all__ = ["hashing", "scoring", "topk"]
