"""Models: base Model/Trainer engine and prebuilt architectures."""

from recommenders_tpu.models.base import Model
from recommenders_tpu.models.base import TrainState
from recommenders_tpu.models.base import Trainer
from recommenders_tpu.models.hybrid import HybridState
from recommenders_tpu.models.hybrid import HybridTrainer
from recommenders_tpu.models.multitask import Multitask
from recommenders_tpu.models.ranking import Ranking
from recommenders_tpu.models.retrieval import EmbeddingTower
from recommenders_tpu.models.retrieval import SequenceTower
from recommenders_tpu.models.retrieval import TwoTowerRetrieval

__all__ = [
    "EmbeddingTower",
    "HybridState",
    "HybridTrainer",
    "Model",
    "Multitask",
    "Ranking",
    "SequenceTower",
    "TrainState",
    "Trainer",
    "TwoTowerRetrieval",
]
