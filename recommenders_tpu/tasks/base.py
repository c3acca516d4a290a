"""Marker base class for tasks (reference: tensorflow_recommenders/tasks/base.py:19)."""

import abc


class Task(abc.ABC):
    """Marker interface for recommender tasks.

    Tasks in recommenders_tpu are pure callables: they map embeddings or
    predictions to a scalar loss (and auxiliary outputs that metrics consume).
    They carry no mutable state, so they can be used freely inside `jax.jit`,
    `jax.grad`, and `shard_map`.
    """
