"""Explicit shard_map id-exchange lookup/update vs dense oracles.

The hand-scheduled collectives (`parallel/embedding_lookup.py`) must be
bit-compatible with the single-device gather/scatter they replace — the
same guarantee the GSPMD path's tests give the engine."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from recommenders_tpu.parallel import embedding_lookup as ex_lib
from recommenders_tpu.parallel import mesh as mesh_lib


def _setup(seed=0, rows=256, dim=16, batch=32):
    mesh = mesh_lib.create_mesh(shape=(2, 4))
    rng = np.random.RandomState(seed)
    table = jnp.asarray(rng.normal(size=(rows, dim)).astype(np.float32))
    table = jax.device_put(
        table, NamedSharding(mesh, P("model", None))
    )
    ids = rng.randint(0, rows, batch).astype(np.int32)
    ids[:3] = -1  # Padding entries.
    ids = jax.device_put(
        jnp.asarray(ids), NamedSharding(mesh, P("data"))
    )
    return mesh, table, ids


def test_sharded_lookup_matches_dense_gather():
    mesh, table, ids = _setup()
    out = ex_lib.sharded_lookup(table, ids, mesh)
    dense = np.take(np.asarray(table), np.maximum(np.asarray(ids), 0), 0)
    dense[np.asarray(ids) < 0] = 0.0
    np.testing.assert_allclose(np.asarray(out), dense, rtol=1e-6)


def test_sharded_lookup_matches_gspmd():
    mesh, table, ids = _setup(seed=1)
    explicit = ex_lib.sharded_lookup(table, ids, mesh)
    compiler = ex_lib.gspmd_lookup(table, ids, mesh)
    np.testing.assert_allclose(
        np.asarray(explicit), np.asarray(compiler), rtol=1e-6
    )


def test_sharded_scatter_add_matches_dense():
    mesh, table, ids = _setup(seed=2)
    rng = np.random.RandomState(3)
    grads = jnp.asarray(
        rng.normal(size=(ids.shape[0], table.shape[1])).astype(np.float32)
    )
    grads = jax.device_put(
        grads, NamedSharding(mesh, P("data", None))
    )
    out = ex_lib.sharded_scatter_add(
        table, ids, grads, mesh, scale=-0.1
    )
    dense = np.asarray(table).copy()
    for i, r in enumerate(np.asarray(ids)):
        if r >= 0:
            dense[r] += -0.1 * np.asarray(grads)[i]
    np.testing.assert_allclose(
        np.asarray(out), dense, rtol=1e-5, atol=1e-6
    )
    # Output keeps the table sharding (no resharding round-trip).
    assert out.sharding.spec == P("model", None)
