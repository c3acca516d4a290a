"""Data utilities: synthetic MovieLens, batching, vocab, preprocessing,
native loader."""

from recommenders_tpu.data import preprocessing
from recommenders_tpu.data import vocab
from recommenders_tpu.data.movielens import SyntheticMovieLens
from recommenders_tpu.data.movielens import batched
from recommenders_tpu.data.movielens import evaluate
from recommenders_tpu.data.movielens import load_movielens
from recommenders_tpu.data.movielens import sample_listwise
from recommenders_tpu.data.movielens import synthetic_movielens
from recommenders_tpu.data.native_loader import NativeBatcher
from recommenders_tpu.data.native_loader import batched_native_or_python
from recommenders_tpu.data.native_loader import native_available

__all__ = [
    "NativeBatcher",
    "SyntheticMovieLens",
    "batched",
    "batched_native_or_python",
    "evaluate",
    "load_movielens",
    "native_available",
    "preprocessing",
    "sample_listwise",
    "synthetic_movielens",
    "vocab",
]
