"""Recommender tasks: loss definitions for retrieval and ranking."""

from recommenders_tpu.tasks import listwise
from recommenders_tpu.tasks.base import Task
from recommenders_tpu.tasks.ranking import Ranking
from recommenders_tpu.tasks.ranking import RankingOutput
from recommenders_tpu.tasks.ranking import binary_crossentropy
from recommenders_tpu.tasks.ranking import mean_squared_error
from recommenders_tpu.tasks.retrieval import Retrieval
from recommenders_tpu.tasks.retrieval import RetrievalOutput
from recommenders_tpu.tasks.retrieval import cross_replica_concat
from recommenders_tpu.tasks.retrieval import softmax_cross_entropy

__all__ = [
    "listwise",
    "Task",
    "Ranking",
    "RankingOutput",
    "binary_crossentropy",
    "mean_squared_error",
    "Retrieval",
    "RetrievalOutput",
    "cross_replica_concat",
    "softmax_cross_entropy",
]
