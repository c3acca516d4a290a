"""Parallelism: mesh conventions, shardings, distributed top-k."""

from recommenders_tpu.parallel.ann import ShardedBucketed
from recommenders_tpu.parallel.ann import ShardedScaNN
from recommenders_tpu.parallel.corpus import ShardedBruteForce
from recommenders_tpu.parallel.corpus import make_sharded_top_k
from recommenders_tpu.parallel.mesh import DATA_AXIS
from recommenders_tpu.parallel.mesh import MODEL_AXIS
from recommenders_tpu.parallel.mesh import batch_shardings
from recommenders_tpu.parallel.mesh import create_mesh
from recommenders_tpu.parallel.mesh import local_data_parallel_mesh
from recommenders_tpu.parallel.mesh import replicated
from recommenders_tpu.parallel.mesh import shard_batch

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "PooledNegativesTrainer",
    "ShardedBruteForce",
    "ShardedBucketed",
    "ShardedScaNN",
    "make_pooled_negatives_train_step",
    "make_sharded_top_k",
    "batch_shardings",
    "create_mesh",
    "local_data_parallel_mesh",
    "replicated",
    "shard_batch",
]


def __getattr__(name):
    # Lazy: retrieval_step imports the models package, which (through the
    # hybrid trainer -> embedding engine) imports back into modules that
    # import `parallel` — eager loading here would form a cycle.
    if name in ("PooledNegativesTrainer", "make_pooled_negatives_train_step"):
        from recommenders_tpu.parallel import retrieval_step

        return getattr(retrieval_step, name)
    raise AttributeError(
        f"module {__name__!r} has no attribute {name!r}"
    )
