"""Models: base Model/Trainer engine and prebuilt architectures."""

from recommenders_tpu.models.base import Model
from recommenders_tpu.models.base import TrainState
from recommenders_tpu.models.base import Trainer
from recommenders_tpu.models.ranking import Ranking

__all__ = ["Model", "Ranking", "TrainState", "Trainer"]
