"""Device-mesh utilities: axis conventions and sharding helpers.

The framework's SPMD convention (SURVEY.md §2.3-2.4):

  - axis `"data"`: batch dimension — data parallelism. Gradients reduce
    over it via XLA-inserted psums.
  - axis `"model"`: embedding-table rows (and, where used, wide feature
    dims) — model parallelism for the embedding engine.

A single-device mesh degrades every sharding to replication, so the same
train step runs unchanged on one chip, on a CPU test mesh
(`--xla_force_host_platform_device_count=N`), and on a pod slice.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = (DATA_AXIS, MODEL_AXIS),
    devices=None,
) -> Mesh:
    """Creates a mesh over the available devices.

    Args:
      shape: Mesh shape; defaults to all devices on the data axis
        (`(n_devices, 1)` for the default two axes).
      axis_names: Mesh axis names.
      devices: Devices to use; defaults to `jax.devices()`.

    Returns:
      A `jax.sharding.Mesh`.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(
            f"Mesh shape {shape} does not match device count {n}."
        )
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def batch_shardings(mesh: Mesh, data_axis: str = DATA_AXIS):
    """Sharding for a batch pytree: leading dim split over the data axis.

    Leaves whose leading dimension is not divisible by the data-axis size
    (e.g. a ragged final batch) fall back to replication rather than
    erroring — correctness is unchanged, only that batch's step is slower.
    """
    axis_size = mesh.shape[data_axis]

    def shard_leaf(leaf):
        shape = getattr(leaf, "shape", ())
        if len(shape) >= 1 and shape[0] % axis_size == 0:
            spec = P(data_axis)
        else:
            spec = P()
        return NamedSharding(mesh, spec)

    return shard_leaf


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, data_axis: str = DATA_AXIS):
    """Places a host batch onto the mesh, sharded along the data axis."""
    shard_leaf = batch_shardings(mesh, data_axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, shard_leaf(x)), batch
    )


def local_data_parallel_mesh() -> Mesh:
    """All local devices on the data axis (the common 1-host layout)."""
    return create_mesh()
