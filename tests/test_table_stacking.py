"""Table stacking: stacked engine must be bit-equal to unstacked.

The TF TPU embedding engine stacks compatible tables per SparseCore to
amortize per-table overheads (the reference delegates to that backing
API from tpu_embedding_layer.py:757-856). Here stacking is an
`EmbeddingEngine(stack_tables=True)` option; these tests pin the
contract: identical initialization, lookups, and post-update logical
tables versus the unstacked engine, across optimizers, shared tables,
sequence features, and both update paths (XLA scatter and the sorted
blocked kernel in interpret mode).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recommenders_tpu.embedding import config as cfg
from recommenders_tpu.embedding import engine as engine_lib


def _configs(dim=8, extra_dim=4, opt=None, max_unique=None):
    """Three dim-`dim` tables (two stackable + one shared by two
    features) and one dim-`extra_dim` table that must stay solo."""
    t_user = cfg.TableConfig(40, dim, name="user", optimizer=opt)
    t_item = cfg.TableConfig(
        72, dim, name="item", optimizer=opt, max_unique_ids=max_unique
    )
    t_tag = cfg.TableConfig(24, dim, name="tag", combiner="sum")
    t_ctx = cfg.TableConfig(16, extra_dim, name="ctx")
    return (
        cfg.FeatureConfig(table=t_user, name="uid"),
        cfg.FeatureConfig(table=t_item, name="iid"),
        cfg.FeatureConfig(table=t_item, name="hist", max_sequence_length=0),
        cfg.FeatureConfig(table=t_tag, name="tags"),
        cfg.FeatureConfig(table=t_ctx, name="ctx"),
    )


def _features(rng, batch=16):
    return {
        "uid": jnp.asarray(rng.randint(0, 40, batch).astype(np.int32)),
        "iid": jnp.asarray(rng.randint(0, 72, batch).astype(np.int32)),
        # Multivalent with padding: mean combiner on a shared table.
        "hist": jnp.asarray(
            np.where(
                rng.rand(batch, 5) < 0.2,
                -1,
                rng.randint(0, 72, (batch, 5)),
            ).astype(np.int32)
        ),
        "tags": jnp.asarray(
            np.where(
                rng.rand(batch, 3) < 0.3,
                -1,
                rng.randint(0, 24, (batch, 3)),
            ).astype(np.int32)
        ),
        "ctx": jnp.asarray(rng.randint(0, 16, batch).astype(np.int32)),
    }


def _loss(acts):
    return sum(jnp.sum(jnp.square(a)) for a in acts.values())


def _pair(opt=None, use_kernel=False, **kw):
    fcs = _configs(opt=opt, **kw)
    plain = engine_lib.EmbeddingEngine(
        fcs, sparse_update_kernel=use_kernel
    )
    stacked = engine_lib.EmbeddingEngine(
        fcs, sparse_update_kernel=use_kernel, stack_tables=True
    )
    return plain, stacked


def test_grouping():
    _, stacked = _pair()
    storages = {s for s, _ in stacked._storage.values()}
    # user+item+tag stack (dim 8, same default optimizer); ctx is solo.
    assert len(storages) == 2, stacked._storage
    (sname,) = [s for s in storages if s.startswith("stacked:")]
    assert set(stacked._storage_members[sname]) == {"user", "item", "tag"}
    assert stacked._storage["ctx"] == ("ctx", 0)


def test_max_unique_tables_stay_solo():
    _, stacked = _pair(max_unique=8)
    sname, _ = stacked._storage["item"]
    assert sname == "item"


def test_mod_sharding_rejected():
    with pytest.raises(ValueError, match="stack_tables"):
        engine_lib.EmbeddingEngine(
            _configs(), stack_tables=True, row_sharding="mod"
        )


def test_init_identical_per_table():
    plain, stacked = _pair()
    sp = plain.init(jax.random.PRNGKey(7))
    ss = stacked.init(jax.random.PRNGKey(7))
    lp = plain.logical_tables(sp)
    ls = stacked.logical_tables(ss)
    assert set(lp) == set(ls)
    for name in lp:
        np.testing.assert_array_equal(
            np.asarray(lp[name]), np.asarray(ls[name]), err_msg=name
        )


@pytest.mark.parametrize(
    "opt",
    [
        None,
        cfg.OptimizerSpec(kind="adam", learning_rate=0.05),
        cfg.OptimizerSpec(kind="sgd", learning_rate=0.1),
    ],
)
def test_lookup_and_updates_match_unstacked(opt):
    plain, stacked = _pair(opt=opt)
    sp = plain.init(jax.random.PRNGKey(0))
    ss = stacked.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)

    step_p = jax.jit(
        lambda s, b: plain.grad_and_update(s, b, _loss)[:2]
    )
    step_s = jax.jit(
        lambda s, b: stacked.grad_and_update(s, b, _loss)[:2]
    )
    for _ in range(3):
        feats = _features(rng)
        ap = plain.lookup(sp, feats)
        as_ = stacked.lookup(ss, feats)
        for k in ap:
            np.testing.assert_array_equal(
                np.asarray(ap[k]), np.asarray(as_[k]), err_msg=k
            )
        (sp, lp) = step_p(sp, feats)
        (ss, ls) = step_s(ss, feats)
        np.testing.assert_allclose(float(lp), float(ls), rtol=1e-6)
    tp = plain.logical_tables(sp)
    ts = stacked.logical_tables(ss)
    for name in tp:
        np.testing.assert_array_equal(
            np.asarray(tp[name]), np.asarray(ts[name]), err_msg=name
        )


def test_kernel_path_matches_unstacked():
    # Interpret-mode blocked kernel (CPU): one sweep over the stacked
    # storage must equal per-table sweeps.
    plain, stacked = _pair(use_kernel=True)
    sp = plain.init(jax.random.PRNGKey(1))
    ss = stacked.init(jax.random.PRNGKey(1))
    rng = np.random.RandomState(11)
    feats = _features(rng)
    sp, _, _ = plain.grad_and_update(sp, feats, _loss)
    ss, _, _ = stacked.grad_and_update(ss, feats, _loss)
    tp = plain.logical_tables(sp)
    ts = stacked.logical_tables(ss)
    for name in tp:
        np.testing.assert_allclose(
            np.asarray(tp[name]),
            np.asarray(ts[name]),
            rtol=0,
            atol=0,
            err_msg=name,
        )


def test_meshed_stacked_matches_unsharded_unstacked():
    # Under GSPMD the stacked array row-shards like any table (member
    # boundaries need not align with shard boundaries; the gathers and
    # scatter-adds route through XLA). Must equal the single-device
    # unstacked engine bit-for-bit.
    from recommenders_tpu.parallel import mesh as mesh_lib

    fcs = _configs()
    mesh = mesh_lib.create_mesh(shape=(2, 4))
    plain = engine_lib.EmbeddingEngine(fcs)
    stacked = engine_lib.EmbeddingEngine(
        fcs, mesh=mesh, stack_tables=True
    )
    sp = plain.init(jax.random.PRNGKey(2))
    ss = stacked.init(jax.random.PRNGKey(2))
    # Seed the stacked storage from the plain engine's exact values:
    # jit-compiled (meshed) initializers differ from eager by 1 ULP in
    # the truncated normal, which is irrelevant here — this test pins
    # the LAYOUT equivalence, not initializer fusion.
    ss = engine_lib.EngineState(
        tables={
            sname: (
                sp.tables[members[0]]
                if len(members) == 1
                else jnp.concatenate(
                    [sp.tables[m] for m in members], axis=0
                )
            )
            for sname, members in stacked._storage_members.items()
        },
        slots=ss.slots,
        step=ss.step,
    )
    rng = np.random.RandomState(9)
    feats = _features(rng)
    ap = plain.lookup(sp, feats)
    as_ = stacked.lookup(ss, feats)
    for k in ap:
        np.testing.assert_array_equal(
            np.asarray(ap[k]), np.asarray(as_[k]), err_msg=k
        )
    sp, _, _ = plain.grad_and_update(sp, feats, _loss)
    ss, _, _ = stacked.grad_and_update(ss, feats, _loss)
    tp = plain.logical_tables(sp)
    ts = stacked.logical_tables(ss)
    for name in tp:
        np.testing.assert_array_equal(
            np.asarray(tp[name]), np.asarray(ts[name]), err_msg=name
        )


def test_logical_roundtrip_moves_between_layouts():
    # logical_tables is the documented bridge between stacked and
    # unstacked checkpoints: importing logical rows into the other
    # engine's state reproduces its own layout exactly.
    plain, stacked = _pair()
    ss = stacked.init(jax.random.PRNGKey(5))
    logical = stacked.logical_tables(ss)
    sp = plain.init(jax.random.PRNGKey(5))
    for name in sp.tables:
        np.testing.assert_array_equal(
            np.asarray(sp.tables[name]), np.asarray(logical[name])
        )
