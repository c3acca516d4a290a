"""Models: base Model/Trainer engine and prebuilt architectures."""

from recommenders_tpu.models.base import Model
from recommenders_tpu.models.base import TrainState
from recommenders_tpu.models.base import Trainer

__all__ = ["Model", "TrainState", "Trainer"]
