"""recommenders_tpu: a TPU-native recommender-system framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
TensorFlow Recommenders: two-tower retrieval with in-batch sampled softmax,
factorized top-K retrieval indexes (brute-force / streaming / approximate),
DCN/DLRM feature interactions, ranking and listwise tasks, a sharded
embedding engine with decoupled sparse optimizers, corpus-level
evaluation, checkpointing, and a native input pipeline — designed
SPMD-first over `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from recommenders_tpu import data
from recommenders_tpu import embedding
from recommenders_tpu import layers
from recommenders_tpu import metrics
from recommenders_tpu import models
from recommenders_tpu import ops
from recommenders_tpu import optimizers
from recommenders_tpu import parallel
from recommenders_tpu import tasks
from recommenders_tpu import utils

# Convenience aliases mirroring the reference's top-level surface
# (`tfrs.Model`, `tfrs.tasks.*`): the base model and trainer.
from recommenders_tpu.models import Model
from recommenders_tpu.models import Trainer

__all__ = [
    "Model",
    "Trainer",
    "data",
    "embedding",
    "layers",
    "metrics",
    "models",
    "ops",
    "optimizers",
    "parallel",
    "tasks",
    "utils",
]
