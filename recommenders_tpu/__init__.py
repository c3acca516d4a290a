"""recommenders_tpu: a TPU-native recommender-system framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
TensorFlow Recommenders: two-tower retrieval with in-batch sampled softmax,
factorized top-K retrieval indexes (brute-force / streaming / approximate),
DCN/DLRM feature interactions, ranking tasks, sharded embedding engine, and
corpus-level evaluation — designed SPMD-first over `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from recommenders_tpu import layers
from recommenders_tpu import metrics
from recommenders_tpu import ops
from recommenders_tpu import tasks

__all__ = ["layers", "metrics", "ops", "tasks"]
