"""Meshed sparse-update kernel: shard_map-wrapped blocked Pallas apply.

`EmbeddingEngine(mesh=..., sparse_update_kernel=True)` runs the update
kernel SHARD-LOCAL (each shard rebases the gathered id/grad list to its
contiguous div-sharded row range and sweeps its own table shard) — the
SPMD architecture of the reference's SparseCore engine
(tensorflow_recommenders/layers/embedding/tpu_embedding_layer.py:40-76,
808,835: ids route between chips, each core updates the rows it owns).

Equality discipline: the meshed kernel must reproduce the single-device
kernel's logical tables. Duplicate-id gradient sums may land in
different chunk groupings per shard, so f32 comparisons carry a tiny
tolerance (the terms are identical; only the f32 accumulation order
differs).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recommenders_tpu.embedding import config as cfg
from recommenders_tpu.embedding import engine as engine_lib
from recommenders_tpu.parallel import mesh as mesh_lib


def _mesh():
    return mesh_lib.create_mesh(
        shape=(jax.device_count(),), axis_names=(mesh_lib.MODEL_AXIS,)
    )


def _run(mesh_arg, kind, lane_pack, steps=3, sr=False, stacked=True):
    fcs = (
        cfg.FeatureConfig(
            table=cfg.TableConfig(4000, 32, name="a"), name="fa"
        ),
        cfg.FeatureConfig(
            table=cfg.TableConfig(9000, 32, name="b"), name="fb"
        ),
    )
    eng = engine_lib.EmbeddingEngine(
        fcs,
        optimizer=cfg.OptimizerSpec(kind=kind, learning_rate=0.05),
        mesh=mesh_arg,
        dtype=jnp.bfloat16 if sr else jnp.float32,
        stack_tables=stacked,
        sparse_update_kernel=True,
        lane_pack=lane_pack,
        stochastic_rounding=sr,
    )
    st = eng.init(jax.random.PRNGKey(1))
    r = np.random.RandomState(7)

    def loss_of(acts):
        return sum(jnp.sum(jnp.square(a)) for a in acts.values())

    step = jax.jit(lambda st, b: eng.grad_and_update(st, b, loss_of))
    for _ in range(steps):
        b = {
            "fa": jnp.asarray(r.randint(0, 4000, (64,)), jnp.int32),
            "fb": jnp.asarray(r.randint(0, 9000, (64,)), jnp.int32),
        }
        st, loss, _ = step(st, b)
    assert np.isfinite(float(loss))
    return eng, st


def _logical(eng, st):
    return {
        k: np.asarray(v, np.float32)
        for k, v in eng.logical_tables(st).items()
    }


@pytest.mark.parametrize(
    "kind", ["sgd", "adagrad", "rowwise_adagrad", "adam"]
)
@pytest.mark.parametrize("lane_pack", [False, True])
def test_meshed_kernel_matches_single_device(kind, lane_pack):
    # adam covers the decay-rule count mask across shards: rows whose
    # updates all belong to OTHER shards must not decay locally.
    base = _logical(*_run(None, kind, lane_pack))
    got = _logical(*_run(_mesh(), kind, lane_pack))
    for name in base:
        np.testing.assert_allclose(
            got[name], base[name], rtol=1e-5, atol=5e-7,
            err_msg=f"{kind} lane_pack={lane_pack} {name}",
        )


def test_meshed_kernel_state_stays_sharded():
    mesh = _mesh()
    eng, st = _run(mesh, "adagrad", True)
    (sname,) = st.tables.keys()
    shardings = {
        s.device for s in st.tables[sname].addressable_shards
    }
    assert len(shardings) == jax.device_count()
    assert eng._pack[sname] == 4


def test_meshed_kernel_sr_trains_finite():
    eng, st = _run(_mesh(), "adagrad", True, sr=True)
    for v in _logical(eng, st).values():
        assert np.isfinite(v).all()


def test_meshed_kernel_unstacked_and_default_off():
    # Unstacked meshed kernel also agrees.
    base = _logical(*_run(None, "adagrad", True, stacked=False))
    got = _logical(*_run(_mesh(), "adagrad", True, stacked=False))
    for name in base:
        np.testing.assert_allclose(
            got[name], base[name], rtol=1e-5, atol=5e-7, err_msg=name
        )
    # Meshed default (auto) stays the GSPMD scatter path.
    fcs = (cfg.FeatureConfig(
        table=cfg.TableConfig(512, 32, name="t"), name="f"),)
    eng = engine_lib.EmbeddingEngine(fcs, mesh=_mesh())
    assert eng.lane_pack is False
    # lane_pack on a mesh demands the kernel.
    with pytest.raises(ValueError, match="meshed engine requires"):
        engine_lib.EmbeddingEngine(fcs, mesh=_mesh(), lane_pack=True)
