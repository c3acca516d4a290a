"""Low-level TPU ops: top-k primitives, scoring kernels, hashing."""

from recommenders_tpu.ops import topk

__all__ = ["topk"]
