"""Data utilities: synthetic MovieLens, batching, offline evaluation."""

from recommenders_tpu.data.movielens import SyntheticMovieLens
from recommenders_tpu.data.movielens import batched
from recommenders_tpu.data.movielens import evaluate
from recommenders_tpu.data.movielens import sample_listwise
from recommenders_tpu.data.movielens import synthetic_movielens

__all__ = [
    "SyntheticMovieLens",
    "batched",
    "evaluate",
    "sample_listwise",
    "synthetic_movielens",
]
