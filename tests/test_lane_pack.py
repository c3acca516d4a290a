"""Lane-packed embedding storage (engine `lane_pack=True`).

Packed storage (`[V·d/128, 128]` physical arrays) must be a pure layout
change: every optimizer kind, feature shape, and engine feature
produces the same LOGICAL tables as the unpacked engine. SGD/Adagrad
route through identical elementwise math and must match bitwise; the
rules that reduce or broadcast across a packed row's lane groups
(rowwise Adagrad's mean, Adam/FTRL's count mask) run as constant
matmuls whose f32 summation order differs from the unpacked axis
reductions — those match to float tolerance.

Reference context: the TF TPU embedding engine feeds SparseCore
hardware with its own packed host formats
(tensorflow_recommenders/layers/embedding/tpu_embedding_layer.py:40-76);
here packing is the TensorCore-native layout that keeps narrow rows on
full 128-lane tiles for the gather and the blocked update kernel.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recommenders_tpu.embedding import config as cfg
from recommenders_tpu.embedding import engine as engine_lib


def _run(kind, dim, stacked, lane_pack, steps=3, extra_features=False,
         sr=False, max_unique=None):
    fcs = [
        cfg.FeatureConfig(
            table=cfg.TableConfig(
                1000, dim, name="a", max_unique_ids=max_unique
            ),
            name="fa",
        ),
        cfg.FeatureConfig(
            table=cfg.TableConfig(3000, dim, name="b"), name="fb"
        ),
    ]
    if extra_features:
        fcs.append(
            cfg.FeatureConfig(          # sequence feature, shared table
                table=cfg.TableConfig(3000, dim, name="b"),
                name="fs",
                max_sequence_length=4,
            )
        )
        fcs.append(
            cfg.FeatureConfig(          # weighted multivalent
                table=cfg.TableConfig(
                    500, dim, name="c", combiner="mean"
                ),
                name="fw",
            )
        )
    eng = engine_lib.EmbeddingEngine(
        tuple(fcs),
        optimizer=cfg.OptimizerSpec(kind=kind, learning_rate=0.05),
        dtype=jnp.bfloat16 if sr else jnp.float32,
        stack_tables=stacked,
        sparse_update_kernel=True,
        lane_pack=lane_pack,
        stochastic_rounding=sr,
    )
    st = eng.init(jax.random.PRNGKey(1))
    r = np.random.RandomState(7)
    for _ in range(steps):
        b = {
            "fa": jnp.asarray(r.randint(0, 1000, (64,)), jnp.int32),
            "fb": jnp.asarray(r.randint(0, 3000, (64,)), jnp.int32),
        }
        if extra_features:
            b["fs"] = jnp.asarray(
                r.randint(-1, 3000, (64, 4)).astype(np.int32)
            )
            b["fw"] = (
                jnp.asarray(r.randint(-1, 500, (64, 3)), jnp.int32),
                jnp.asarray(r.rand(64, 3), jnp.float32),
            )

        def loss_of(acts):
            return sum(jnp.sum(jnp.square(a)) for a in acts.values())

        st, loss, _ = eng.grad_and_update(st, b, loss_of)
    assert np.isfinite(float(loss))
    return eng, st


def _logical(eng, st):
    return {
        k: np.asarray(v, np.float32)
        for k, v in eng.logical_tables(st).items()
    }


@pytest.mark.parametrize("kind", ["sgd", "adagrad"])
@pytest.mark.parametrize("dim,stacked", [(32, True), (64, False)])
def test_packed_matches_unpacked_bitwise(kind, dim, stacked):
    b = _logical(*_run(kind, dim, stacked, lane_pack=False))
    p = _logical(*_run(kind, dim, stacked, lane_pack=True))
    for name in b:
        np.testing.assert_array_equal(p[name], b[name], err_msg=name)


@pytest.mark.parametrize("kind", ["rowwise_adagrad", "adam", "ftrl"])
def test_packed_matches_unpacked_lane_group_rules(kind):
    b = _logical(*_run(kind, 32, True, lane_pack=False))
    p = _logical(*_run(kind, 32, True, lane_pack=True))
    for name in b:
        np.testing.assert_allclose(
            p[name], b[name], rtol=3e-5, atol=1e-7, err_msg=name
        )


def test_packed_sequence_weighted_and_bounded_features():
    b = _logical(*_run(
        "adagrad", 32, True, lane_pack=False, extra_features=True,
        max_unique=48,
    ))
    p = _logical(*_run(
        "adagrad", 32, True, lane_pack=True, extra_features=True,
        max_unique=48,
    ))
    for name in b:
        np.testing.assert_array_equal(p[name], b[name], err_msg=name)


def test_packed_storage_shapes_and_roundtrip():
    eng, st = _run("adagrad", 32, True, lane_pack=True)
    (sname,) = st.tables.keys()
    assert eng._pack[sname] == 4
    arr = st.tables[sname]
    assert arr.shape[1] == 128
    logical = eng.logical_tables(st)
    assert logical["a"].shape == (1024, 32)
    assert logical["b"].shape == (3072, 32)
    # A full-width dim never packs.
    eng128, st128 = _run("adagrad", 128, False, lane_pack=True, steps=1)
    for s, p in eng128._pack.items():
        assert p == 1


def test_packed_sr_training_changes_tables():
    eng, st = _run("adagrad", 32, True, lane_pack=True, sr=True)
    logical = eng.logical_tables(st)
    assert all(np.isfinite(np.asarray(v, np.float32)).all()
               for v in logical.values())


def test_lane_pack_rejects_meshed_and_scatter_paths():
    from recommenders_tpu.parallel import mesh as mesh_lib

    fcs = (cfg.FeatureConfig(
        table=cfg.TableConfig(256, 32, name="t"), name="f"),)
    mesh = mesh_lib.create_mesh(
        shape=(jax.device_count(),), axis_names=(mesh_lib.MODEL_AXIS,)
    )
    # Meshed lane packing needs the shard_map kernel path explicitly.
    with pytest.raises(ValueError, match="meshed engine requires"):
        engine_lib.EmbeddingEngine(fcs, mesh=mesh, lane_pack=True)
    engine_lib.EmbeddingEngine(
        fcs, mesh=mesh, lane_pack=True, sparse_update_kernel=True
    )  # allowed: shard-local kernel (tests/test_meshed_kernel.py)
    # Packed state with the kernel disabled at update time must refuse
    # (the scatter formulation cannot express sub-row lane writes).
    eng = engine_lib.EmbeddingEngine(
        fcs, lane_pack=True, sparse_update_kernel=False
    )
    st = eng.init(jax.random.PRNGKey(0))
    ids = jnp.asarray([1, 2, 3], jnp.int32)
    with pytest.raises(ValueError, match="Lane-packed"):
        eng.grad_and_update(
            st, {"f": ids},
            lambda acts: jnp.sum(jnp.square(acts["f"])),
        )


def test_cross_layout_state_roundtrip():
    """logical_state/state_from_logical move checkpoints between
    stacked/packed layouts WITHOUT losing optimizer slots: training
    continues identically after the conversion."""
    def make(stacked, lane_pack):
        fcs = (
            cfg.FeatureConfig(
                table=cfg.TableConfig(1000, 32, name="a"), name="fa"),
            cfg.FeatureConfig(
                table=cfg.TableConfig(3000, 32, name="b"), name="fb"),
        )
        return engine_lib.EmbeddingEngine(
            fcs,
            optimizer=cfg.OptimizerSpec(kind="adagrad", learning_rate=0.05),
            stack_tables=stacked,
            sparse_update_kernel=True,
            lane_pack=lane_pack,
            stochastic_rounding=False,
        )

    def loss_of(acts):
        return sum(jnp.sum(jnp.square(a)) for a in acts.values())

    r = np.random.RandomState(3)
    batches = [
        {"fa": jnp.asarray(r.randint(0, 1000, (64,)), jnp.int32),
         "fb": jnp.asarray(r.randint(0, 3000, (64,)), jnp.int32)}
        for _ in range(4)
    ]

    src = make(stacked=False, lane_pack=False)
    st = src.init(jax.random.PRNGKey(2))
    for b in batches[:2]:
        st, _, _ = src.grad_and_update(st, b, loss_of)
    logical = src.logical_state(st)

    for stacked, lane_pack in ((True, True), (True, False), (False, True)):
        dst = make(stacked, lane_pack)
        st2 = dst.state_from_logical(logical)
        # Continue training in BOTH engines; results must agree.
        a, b2 = st, st2
        for b in batches[2:]:
            a, _, _ = src.grad_and_update(a, b, loss_of)
            b2, _, _ = dst.grad_and_update(b2, b, loss_of)
        want = {k: np.asarray(v) for k, v in src.logical_tables(a).items()}
        got = {k: np.asarray(v) for k, v in dst.logical_tables(b2).items()}
        for name in want:
            np.testing.assert_array_equal(
                got[name], want[name],
                err_msg=f"stacked={stacked} pack={lane_pack} {name}")
        # Slots survive the conversion (accumulators continue, not reset).
        ls = dst.logical_state(b2)["slots"]
        assert not np.allclose(
            np.asarray(ls["a"]["accumulator"]),
            0.1 * np.ones_like(np.asarray(ls["a"]["accumulator"])),
        )
