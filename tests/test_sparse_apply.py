"""Sorted blocked sparse-apply kernel vs an independent numpy oracle.

`ops/sparse_apply.sorted_block_apply` is the TensorCore replacement for
the scatter-shaped optimizer update (the role SparseCore hardware plays
behind the reference's tpu_embedding_layer.py:40-76): it must apply
`block_update` exactly once per touched row with the row's SUMMED
gradient and occurrence count, leave every untouched row bit-identical,
and drop ids >= V. Both the Pallas kernel (interpret mode) and the jnp
reference twin are checked against a plain-Python oracle.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommenders_tpu.ops import sparse_apply


def _adagrad_rule(lr=0.5):
    def rule(states, g, count):
        table, accum = states
        new_accum = accum + jnp.square(g)
        scale = jax.lax.rsqrt(new_accum + 1e-12)
        return [table - lr * g * scale, new_accum]

    return rule


def _decay_rule(beta=0.9):
    """Adam-style: decays ONLY touched rows (needs the count mask)."""

    def rule(states, g, count):
        (m,) = states
        touched = count > 0
        return [jnp.where(touched, beta * m + (1 - beta) * g, m)]

    return rule


def _oracle(states, ids, grads, np_rule, v):
    """Per-unique-row numpy application of the update rule."""
    out = [np.array(s, np.float64) for s in states]
    valid = ids < v
    for row in np.unique(ids[valid]):
        sel = ids == row
        g = grads[sel].sum(axis=0, dtype=np.float64)
        count = float(sel.sum())
        rows = [o[row] for o in out]
        new_rows = np_rule(rows, g, count)
        for o, nr in zip(out, new_rows):
            o[row] = nr
    return out


def _np_adagrad(lr=0.5):
    def rule(rows, g, count):
        table, accum = rows
        new_accum = accum + g * g
        return [table - lr * g / np.sqrt(new_accum + 1e-12), new_accum]

    return rule


def _np_decay(beta=0.9):
    def rule(rows, g, count):
        (m,) = rows
        if count > 0:
            return [beta * m + (1 - beta) * g]
        return [m]

    return rule


def _case(seed, v, d, n, dup_frac=0.3, pad_frac=0.1):
    rng = np.random.RandomState(seed)
    ids = rng.randint(0, v, size=n).astype(np.int32)
    ndup = int(n * dup_frac)
    if ndup:
        ids[:ndup] = ids[rng.randint(0, n, ndup)]
    npad = int(n * pad_frac)
    if npad:
        ids[-npad:] = v  # padding: >= V, must sort last anyway
    ids = np.sort(ids)
    grads = rng.normal(size=(n, d)).astype(np.float32)
    table = rng.normal(size=(v, d)).astype(np.float32)
    accum = rng.uniform(0.05, 2.0, size=(v, d)).astype(np.float32)
    return ids, grads, table, accum


RUNNERS = {
    "kernel": functools.partial(
        sparse_apply.sorted_block_apply, interpret=True
    ),
    "reference": sparse_apply.sorted_block_apply_reference,
}


@pytest.mark.parametrize("runner", list(RUNNERS))
@pytest.mark.parametrize(
    "v,d,n,block_rows,chunk",
    [
        (64, 8, 32, 16, 8),       # updates spread across several blocks
        (64, 8, 32, 64, 8),       # single block covers the whole table
        (256, 16, 40, 32, 16),    # n not a chunk multiple
        (32, 8, 96, 8, 16),       # n >> V: heavy duplication
    ],
)
def test_adagrad_matches_oracle(runner, v, d, n, block_rows, chunk):
    ids, grads, table, accum = _case(0, v, d, n)
    kw = (
        dict(block_rows=block_rows, chunk=chunk)
        if runner == "kernel"
        else {}
    )
    got = RUNNERS[runner](
        (jnp.asarray(table), jnp.asarray(accum)),
        jnp.asarray(ids),
        jnp.asarray(grads),
        _adagrad_rule(),
        **kw,
    )
    want = _oracle([table, accum], ids, grads, _np_adagrad(), v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), w.astype(np.float32), rtol=1e-4, atol=5e-5
        )


@pytest.mark.parametrize("runner", list(RUNNERS))
def test_untouched_rows_bit_identical(runner):
    ids, grads, table, accum = _case(1, v=128, d=8, n=16, dup_frac=0.0)
    kw = dict(block_rows=32, chunk=8) if runner == "kernel" else {}
    got = RUNNERS[runner](
        (jnp.asarray(table), jnp.asarray(accum)),
        jnp.asarray(ids),
        jnp.asarray(grads),
        _adagrad_rule(),
        **kw,
    )
    touched = np.zeros(128, bool)
    touched[ids[ids < 128]] = True
    for g, orig in zip(got, [table, accum]):
        np.testing.assert_array_equal(
            np.asarray(g)[~touched], orig[~touched]
        )


@pytest.mark.parametrize("runner", list(RUNNERS))
def test_count_mask_decay_rule(runner):
    """Rows inside a touched block but not updated must NOT decay."""
    v, d = 64, 8
    ids = np.asarray([3, 3, 7, 40], np.int32)
    grads = np.arange(4 * d, dtype=np.float32).reshape(4, d)
    m = np.random.RandomState(2).normal(size=(v, d)).astype(np.float32)
    kw = dict(block_rows=16, chunk=8) if runner == "kernel" else {}
    (got,) = RUNNERS[runner](
        (jnp.asarray(m),),
        jnp.asarray(ids),
        jnp.asarray(grads),
        _decay_rule(),
        **kw,
    )
    (want,) = _oracle([m], ids, grads, _np_decay(), v)
    np.testing.assert_allclose(
        np.asarray(got), want.astype(np.float32), rtol=1e-4, atol=5e-5
    )
    # Row 4 shares block 0 with rows 3/7 but was never updated.
    np.testing.assert_array_equal(np.asarray(got)[4], m[4])


@pytest.mark.parametrize("runner", list(RUNNERS))
def test_all_padding_is_noop(runner):
    v, d, n = 64, 8, 16
    rng = np.random.RandomState(3)
    table = rng.normal(size=(v, d)).astype(np.float32)
    ids = np.full(n, v, np.int32)
    grads = rng.normal(size=(n, d)).astype(np.float32)
    kw = dict(block_rows=16, chunk=8) if runner == "kernel" else {}
    (got,) = RUNNERS[runner](
        (jnp.asarray(table),),
        jnp.asarray(ids),
        jnp.asarray(grads),
        lambda s, g, c: [s[0] - g],
        **kw,
    )
    np.testing.assert_array_equal(np.asarray(got), table)


@pytest.mark.parametrize("seed", range(4))
def test_kernel_fuzz_against_reference(seed):
    v, d, n = 128, 16, 64
    ids, grads, table, accum = _case(
        seed + 10, v, d, n, dup_frac=0.5, pad_frac=0.2
    )
    got = sparse_apply.sorted_block_apply(
        (jnp.asarray(table), jnp.asarray(accum)),
        jnp.asarray(ids),
        jnp.asarray(grads),
        _adagrad_rule(),
        block_rows=32,
        chunk=16,
        interpret=True,
    )
    want = sparse_apply.sorted_block_apply_reference(
        (jnp.asarray(table), jnp.asarray(accum)),
        jnp.asarray(ids),
        jnp.asarray(grads),
        _adagrad_rule(),
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-4, atol=5e-5
        )


def test_wide_rows_multilane():
    """d > 128 exercises the multi-lane-group augmented layout."""
    v, d, n = 64, 192, 32
    ids, grads, table, accum = _case(4, v, d, n)
    got = sparse_apply.sorted_block_apply(
        (jnp.asarray(table), jnp.asarray(accum)),
        jnp.asarray(ids),
        jnp.asarray(grads),
        _adagrad_rule(),
        block_rows=16,
        chunk=8,
        interpret=True,
    )
    want = _oracle([table, accum], ids, grads, _np_adagrad(), v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), w.astype(np.float32), rtol=1e-4, atol=5e-5
        )


class TestRoutingPrecision:
    def test_single_pass_routing_close_to_exact(self):
        """`exact_routing=False` (one bf16 MXU pass) stays within bf16
        tolerance of the exact hi+lo split — the measured −45 us/step
        option documented on `EmbeddingEngine(exact_grad_routing=...)`."""
        import numpy as np

        def sgd_rule(states, g, count, sc):
            (table,) = states
            return [table - sc[0] * g]

        v, d, n = 512, 64, 256
        rng = np.random.RandomState(0)
        table = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
        ids = jnp.sort(
            jnp.asarray(rng.randint(0, v, n).astype(np.int32))
        )
        grads = jnp.asarray(
            rng.normal(size=(n, d)).astype(np.float32)
        )
        outs = {}
        for exact in (True, False):
            (outs[exact],) = sparse_apply.sorted_block_apply(
                (jnp.copy(table),), ids, grads, sgd_rule,
                scalars=jnp.asarray([0.1], jnp.float32),
                block_rows=128, chunk=64, exact_routing=exact,
                interpret=True,
            )
        np.testing.assert_allclose(
            np.asarray(outs[False]), np.asarray(outs[True]),
            rtol=2e-2, atol=2e-3,
        )


@pytest.mark.parametrize("seed", range(8))
def test_packed_kernel_fuzz_against_oracle(seed):
    """Randomized shapes for the LANE-PACKED kernel path (sub_pack
    routing, packed boundary math, packed count lanes) vs the numpy
    oracle applied to the logical layout."""
    rng = np.random.RandomState(1000 + seed)
    d = int(rng.choice([16, 32, 64]))
    pack = 128 // d
    v = int(rng.choice([4, 8, 16])) * pack * 8  # divisible by pack & 8
    n = int(rng.choice([24, 64, 160]))
    br_choices = [b for b in (8, 16, 32) if (v // pack) % b == 0]
    br = int(rng.choice(br_choices))
    chunk = int(rng.choice([8, 16, 32]))
    ids, grads, table, accum = _case(
        seed, v, d, n, dup_frac=float(rng.rand() * 0.5),
        pad_frac=float(rng.rand() * 0.3),
    )
    packed_states = (
        jnp.asarray(table).reshape(v // pack, d * pack),
        jnp.asarray(accum).reshape(v // pack, d * pack),
    )
    got = sparse_apply.sorted_block_apply(
        packed_states,
        jnp.asarray(ids),
        jnp.asarray(grads),
        _adagrad_rule(),
        block_rows=br,
        chunk=chunk,
        sub_pack=pack,
        interpret=True,
    )
    want = _oracle([table, accum], ids, grads, _np_adagrad(), v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g).reshape(v, d), w.astype(np.float32),
            rtol=1e-4, atol=5e-5,
            err_msg=f"d={d} v={v} n={n} br={br} chunk={chunk}",
        )


@pytest.mark.parametrize("seed", range(4))
def test_packed_decay_rule_count_lanes_fuzz(seed):
    """Packed count lanes ([R, pack] one-hot of the sub-row) feed
    decay rules correctly: only touched LOGICAL rows decay."""
    rng = np.random.RandomState(2000 + seed)
    d = int(rng.choice([16, 32]))
    pack = 128 // d
    v = 16 * pack * 4
    n = 48
    ids, grads, m, _ = _case(seed + 7, v, d, n, dup_frac=0.4,
                             pad_frac=0.2)

    def packed_decay(states, g, count, beta=0.9):
        (mm,) = states
        grp = (
            jax.lax.broadcasted_iota(jnp.int32, (d * pack, pack), 0)
            // d
            == jax.lax.broadcasted_iota(jnp.int32, (d * pack, pack), 1)
        ).astype(jnp.float32)
        count_b = jax.lax.dot_general(
            count, grp,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        touched = count_b > 0
        return [jnp.where(touched, 0.9 * mm + 0.1 * g, mm)]

    (got,) = sparse_apply.sorted_block_apply(
        (jnp.asarray(m).reshape(v // pack, d * pack),),
        jnp.asarray(ids),
        jnp.asarray(grads),
        packed_decay,
        block_rows=16,
        chunk=16,
        sub_pack=pack,
        need_count=True,
        interpret=True,
    )
    (want,) = _oracle([m], ids, grads, _np_decay(), v)
    np.testing.assert_allclose(
        np.asarray(got).reshape(v, d), want.astype(np.float32),
        rtol=1e-4, atol=5e-5,
    )
