"""Real-TPU tests (marker: tpu; enabled with RTPU_TPU_TESTS=1).

These are the release gates the CPU-mesh suite cannot provide
(VERDICT r1 items 1 and 8):

  1. the C++ PJRT serving host executes an exported index on the chip
     with bit parity against the Python query path — the reference's
     SavedModel → TF-Serving round-trip
     (tensorflow_recommenders/layers/factorized_top_k_test.py:75-83);
  2. the Bucketed Pallas kernel runs COMPILED (non-interpret) — Mosaic
     lowering regressions surface here, not in the interpret-mode CPU
     tests;
  3. one embedding-engine step runs compiled on the chip.

Operational constraints (hard-won): the tunneled chip is
single-claimant — each phase runs in its own subprocess that exits
(releasing the session) before the next starts; the test process itself
stays on CPU (conftest) and never claims the chip. A killed TPU process
leaves a claim that takes ~1-2 min to expire, so phases get generous
timeouts and never overlap.
"""

import os
import subprocess
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.tpu


def _tpu_env():
    """Subprocess env that restores the ambient axon TPU platform."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"
    flags = env.get("XLA_FLAGS", "").split()
    env["XLA_FLAGS"] = " ".join(
        f for f in flags if "host_platform_device_count" not in f
    )
    return env


def _run_on_tpu(script: str, timeout: float = 600.0) -> str:
    """Runs a Python script in a TPU-claiming subprocess; returns stdout."""
    proc = subprocess.run(
        ["python", "-c", textwrap.dedent(script)],
        capture_output=True,
        text=True,
        env=_tpu_env(),
        cwd=REPO,
        timeout=timeout,
    )
    if proc.returncode != 0:
        raise AssertionError(
            f"TPU subprocess failed (exit {proc.returncode}):\n"
            f"stdout: {proc.stdout[-2000:]}\nstderr: {proc.stderr[-4000:]}"
        )
    return proc.stdout


def test_native_host_serves_exported_index(tmp_path):
    """export_index → C++ pjrt_host on the chip → bit parity."""
    from recommenders_tpu.utils import native_serving as ns

    assert ns.axon_available(), "axon plugin or host binary missing"
    work = str(tmp_path)

    # Phase A (TPU subprocess): build + export the index and record the
    # Python query path's answers, then exit to release the chip.
    _run_on_tpu(f"""
        import sys; sys.path.insert(0, {REPO!r})
        import numpy as np, jax.numpy as jnp
        from recommenders_tpu.layers import factorized_top_k as ftk
        from recommenders_tpu.utils import export as ex
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
        c = jnp.asarray(rng.normal(size=(512, 64)).astype(np.float32))
        ids = jnp.asarray(np.arange(512, dtype=np.int32) * 3)
        index = ftk.BruteForce(k=10).index(c, ids)
        es, ei = index(q)
        ex.export_index({work!r} + "/bf", index, q, k=10)
        np.save({work!r} + "/q.npy", np.asarray(q))
        np.save({work!r} + "/expected_scores.npy", np.asarray(es))
        np.save({work!r} + "/expected_ids.npy", np.asarray(ei))
        print("phase A ok")
    """)

    # Phase B: the C++ host claims the chip, compiles, executes.
    res = ns.serve_exported_index(
        os.path.join(work, "bf"), np.load(os.path.join(work, "q.npy"))
    )
    assert "ok" in res.stdout
    assert res.compile_ms is not None

    # Phase C (CPU, in-process): bit parity.
    scores, out_ids = res.outputs
    np.testing.assert_array_equal(
        out_ids, np.load(os.path.join(work, "expected_ids.npy"))
    )
    np.testing.assert_allclose(
        scores,
        np.load(os.path.join(work, "expected_scores.npy")),
        rtol=1e-6,
        atol=1e-6,
    )


def test_native_host_serves_string_identified_index(tmp_path):
    """String-identified export through the C++ host: the device module
    returns ROW positions; the caller decodes via the persisted
    identifiers.json exactly like `load_index` does (round-5 string-id
    surface, reference factorized_top_k_test.py:185-193)."""
    from recommenders_tpu.utils import export as ex
    from recommenders_tpu.utils import native_serving as ns

    assert ns.axon_available(), "axon plugin or host binary missing"
    work = str(tmp_path)

    _run_on_tpu(f"""
        import sys; sys.path.insert(0, {REPO!r})
        import numpy as np, jax.numpy as jnp
        from recommenders_tpu.layers import factorized_top_k as ftk
        from recommenders_tpu.utils import export as ex
        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
        c = jnp.asarray(rng.normal(size=(512, 64)).astype(np.float32))
        names = np.asarray([f"item:{{i:03d}}" for i in range(512)])
        index = ftk.BruteForce(k=10).index(c, names)
        es, ei = index(q)
        assert ei.dtype.kind == "U"
        ex.export_index({work!r} + "/bfs", index, q, k=10)
        np.save({work!r} + "/qs.npy", np.asarray(q))
        np.save({work!r} + "/expected_names.npy", ei)
        print("phase A ok")
    """)

    res = ns.serve_exported_index(
        os.path.join(work, "bfs"), np.load(os.path.join(work, "qs.npy"))
    )
    assert "ok" in res.stdout
    _, rows = res.outputs
    strings = ex.load_identifier_strings(os.path.join(work, "bfs"))
    assert strings is not None
    decoded = np.take(strings, np.asarray(rows), axis=0, mode="clip")
    np.testing.assert_array_equal(
        decoded, np.load(os.path.join(work, "expected_names.npy"))
    )


def test_bucketed_kernel_compiled_on_chip():
    """The Pallas kernel lowers through Mosaic and matches its oracle.

    ids must agree ≥99% with the jnp reference on the same backend (MXU
    dot precision may differ between Mosaic and XLA, so exact equality
    is not required — a lowering regression shows up as a crash or
    wholesale disagreement)."""
    _run_on_tpu("""
        import sys; sys.path.insert(0, ".")
        import numpy as np, jax, jax.numpy as jnp
        from recommenders_tpu.ops import scoring
        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32))
        c = jnp.asarray(rng.normal(size=(8192, 128)).astype(np.float32))
        vals, ids = scoring.bucketed_top_k(
            q, c, k=10, buckets=2048, chunk=2048)
        rv, ri = scoring.bucketed_top_k_reference(q, c, k=10, buckets=2048)
        ids, ri = np.asarray(ids), np.asarray(ri)
        agree = float((ids == ri).mean())
        assert agree >= 0.99, f"kernel/oracle id agreement {agree}"
        assert np.isfinite(np.asarray(vals)).all()
        print("compiled kernel ok, agreement", agree)
    """)


def test_leaf_scoring_kernel_compiled_on_chip():
    """The ScaNN leaf-scoring kernel lowers through Mosaic (f32 and
    int8/dequant variants) and matches the gather-formulation oracle."""
    _run_on_tpu("""
        import sys; sys.path.insert(0, ".")
        import numpy as np, jax, jax.numpy as jnp
        from recommenders_tpu.ops import leaf_scoring
        from recommenders_tpu.layers import approximate
        rng = np.random.RandomState(4)
        embs = rng.normal(size=(16, 256, 128)).astype(np.float32)
        queries = jnp.asarray(rng.normal(size=(32, 128)).astype(np.float32))
        probes = jnp.asarray(rng.randint(0, 16, size=(32, 4)), jnp.int32)
        got = leaf_scoring.probed_leaf_scores(
            queries, jnp.asarray(embs), None, probes)
        want = leaf_scoring.probed_scores_reference(
            queries, jnp.asarray(embs), None, probes)
        # Mosaic's dot and XLA's einsum may use different MXU pass
        # precisions; scores are O(sqrt(D)) ~ 11, so atol 0.2 is ~2%.
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=5e-2, atol=0.2)
        scales, codes = approximate._quantize_rows(embs, 0.2)
        got_q = leaf_scoring.probed_leaf_scores(
            queries, jnp.asarray(codes), jnp.asarray(scales), probes)
        want_q = leaf_scoring.probed_scores_reference(
            queries, jnp.asarray(codes), jnp.asarray(scales), probes)
        np.testing.assert_allclose(
            np.asarray(got_q), np.asarray(want_q), rtol=5e-2, atol=0.2)
        print("leaf kernel compiled ok")
    """)


def test_embedding_engine_step_on_chip():
    """One engine lookup+update step compiles and runs on the chip."""
    _run_on_tpu("""
        import sys; sys.path.insert(0, ".")
        import numpy as np, jax, jax.numpy as jnp
        from recommenders_tpu.embedding import config as cfg
        from recommenders_tpu.embedding.engine import EmbeddingEngine
        table = cfg.TableConfig(
            vocabulary_size=1000, dim=64, name="t",
            optimizer=cfg.OptimizerSpec(kind="adagrad", learning_rate=0.1))
        eng = EmbeddingEngine((cfg.FeatureConfig(table=table, name="x"),))
        state = eng.init(jax.random.PRNGKey(0))
        ids = jnp.asarray(np.random.RandomState(2).randint(0, 1000, 64),
                          jnp.int32)
        before = np.asarray(state.tables["t"]).copy()

        def loss(acts):
            return jnp.sum(jnp.square(acts["x"]))

        state2, l, _ = eng.grad_and_update(state, {"x": ids}, loss)
        after = np.asarray(state2.tables["t"])
        assert np.isfinite(l)
        assert not np.allclose(before, after)
        print("engine step ok, loss", float(l))
    """)


def test_sparse_apply_kernel_routing_on_chip():
    """COMPILED sorted_block_apply matches the numpy scatter oracle.

    Regression test for the id-lane denormal flush: ids bitcast into an
    f32 stream are denormals (every vocab id < 2^23), and the compiled
    f32 load path flushed them to zero — every block's updates routed
    to its row 0. Interpret mode preserved bits, so only an on-chip
    oracle-equality check catches this class of bug (the old on-chip
    test only asserted 'loss finite and table changed')."""
    _run_on_tpu("""
        import sys; sys.path.insert(0, ".")
        import numpy as np, jax, jax.numpy as jnp
        from recommenders_tpu.ops import sparse_apply

        def sgd_rule(states, g, count, sc):
            (table,) = states
            return [table - sc[0] * g]

        for d, br in ((64, 2048), (128, 256)):
            v, n, chunk = 65536, 4096, 128
            table = jnp.zeros((v, d), jnp.float32)
            rng = np.random.RandomState(d + br)
            ids = jnp.sort(jnp.asarray(
                rng.randint(0, v, n), jnp.int32))
            gvals = rng.normal(size=(n, d)).astype(np.float32)
            (out,) = sparse_apply.sorted_block_apply(
                (table,), ids, jnp.asarray(gvals), sgd_rule,
                scalars=jnp.asarray([-1.0], jnp.float32),
                block_rows=br, chunk=chunk,
            )
            expect = np.zeros((v, d), np.float32)
            np.add.at(expect, np.asarray(ids), gvals)
            np.testing.assert_allclose(
                np.asarray(out), expect, rtol=3e-5, atol=3e-5)
        print("kernel routing oracle ok")
    """)


def test_lane_packed_kernel_rules_on_chip():
    """COMPILED lane-packed kernel (sub_pack routing + pack-aware
    rules) matches the unpacked engine on the chip, for every
    optimizer kind the packed rules specialize (rowwise Adagrad's
    group matmuls, Adam's count expand) — CPU interpret mode cannot
    catch Mosaic-compile-only divergences in these paths (the round-3
    denormal-flush lesson)."""
    _run_on_tpu("""
        import sys; sys.path.insert(0, ".")
        import numpy as np, jax, jax.numpy as jnp
        from recommenders_tpu.embedding import config as cfg
        from recommenders_tpu.embedding import engine as engine_lib

        def run(kind, lane_pack):
            fcs = (
                cfg.FeatureConfig(table=cfg.TableConfig(
                    3000, 32, name="a"), name="fa"),
                cfg.FeatureConfig(table=cfg.TableConfig(
                    9000, 32, name="b"), name="fb"),
            )
            eng = engine_lib.EmbeddingEngine(
                fcs,
                optimizer=cfg.OptimizerSpec(kind=kind,
                                            learning_rate=0.05),
                dtype=jnp.float32, stack_tables=True,
                sparse_update_kernel=True, lane_pack=lane_pack,
                stochastic_rounding=False,
            )
            st = eng.init(jax.random.PRNGKey(1))
            r = np.random.RandomState(5)
            loss = lambda acts: sum(
                jnp.sum(jnp.square(x)) for x in acts.values())
            step = jax.jit(
                lambda s, b: eng.grad_and_update(s, b, loss))
            for _ in range(3):
                b = {"fa": jnp.asarray(r.randint(0, 3000, (256,)),
                                       jnp.int32),
                     "fb": jnp.asarray(r.randint(0, 9000, (256,)),
                                       jnp.int32)}
                st, l, _ = step(st, b)
            return {k: np.asarray(v)
                    for k, v in eng.logical_tables(st).items()}

        for kind in ("sgd", "adagrad", "rowwise_adagrad", "adam",
                     "ftrl"):
            base = run(kind, False)
            packed = run(kind, True)
            tol = 0 if kind in ("sgd", "adagrad") else 3e-5
            for name in base:
                np.testing.assert_allclose(
                    packed[name], base[name], rtol=tol,
                    atol=tol and 1e-7,
                    err_msg=f"{kind} {name}")
        print("packed rules compiled oracle ok")
    """)


def test_quantized_bucketed_kernel_compiled_on_chip():
    """The int8 dequantizing Bucketed kernel lowers through Mosaic and
    matches the jnp oracle with identical quantization inputs."""
    _run_on_tpu("""
        import sys; sys.path.insert(0, ".")
        import numpy as np, jax, jax.numpy as jnp
        from recommenders_tpu.ops import quantization, scoring
        rng = np.random.RandomState(8)
        q = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32))
        c = jnp.asarray(rng.normal(size=(8192, 128)).astype(np.float32))
        scales, codes = quantization.quantize_rows_device(c, 0.2)
        vals, ids = scoring.bucketed_top_k(
            q, codes, k=10, buckets=2048, chunk=2048, scales=scales)
        rv, ri = scoring.bucketed_top_k_reference(
            q, codes, k=10, buckets=2048, scales=scales)
        agree = float((np.asarray(ids) == np.asarray(ri)).mean())
        assert agree >= 0.99, f"kernel/oracle id agreement {agree}"
        assert np.isfinite(np.asarray(vals)).all()
        print("quantized bucketed kernel ok, agreement", agree)
    """)


def test_bucketed_leaf_scoring_kernel_compiled_on_chip():
    """The bucketed probed-scoring kernel (in-kernel argmax fold,
    tile-shared probes) lowers through Mosaic and matches the jnp
    oracle, f32 and int8."""
    _run_on_tpu("""
        import sys; sys.path.insert(0, ".")
        import numpy as np, jax, jax.numpy as jnp
        from recommenders_tpu.ops import leaf_scoring
        from recommenders_tpu.layers import approximate
        rng = np.random.RandomState(5)
        embs = rng.normal(size=(16, 256, 128)).astype(np.float32)
        rows = rng.permutation(16 * 256).astype(np.int32).reshape(16, 256)
        rows[:, -9:] = -1
        rows = jnp.asarray(rows)
        queries = jnp.asarray(
            rng.normal(size=(32, 128)).astype(np.float32))
        for tile in (1, 8):
            probes = jnp.asarray(
                rng.randint(0, 16, size=(32 // tile, 4)), jnp.int32)
            vk, rk = leaf_scoring.probed_bucketed_scores(
                queries, jnp.asarray(embs), None, rows, probes,
                buckets=128, query_tile=tile)
            vr, rr = leaf_scoring.probed_bucketed_reference(
                queries, jnp.asarray(embs), None, rows, probes,
                buckets=128, query_tile=tile)
            agree = float((np.asarray(rk) == np.asarray(rr)).mean())
            assert agree >= 0.99, f"tile={tile} row agreement {agree}"
            np.testing.assert_allclose(
                np.asarray(vk), np.asarray(vr), rtol=5e-2, atol=0.2)
        scales, codes = approximate._quantize_rows(embs, 0.2)
        probes = jnp.asarray(
            rng.randint(0, 16, size=(4, 4)), jnp.int32)
        vk, rk = leaf_scoring.probed_bucketed_scores(
            queries, jnp.asarray(codes), jnp.asarray(scales), rows,
            probes, buckets=128, query_tile=8)
        vr, rr = leaf_scoring.probed_bucketed_reference(
            queries, jnp.asarray(codes), jnp.asarray(scales), rows,
            probes, buckets=128, query_tile=8)
        agree = float((np.asarray(rk) == np.asarray(rr)).mean())
        assert agree >= 0.99, f"quantized row agreement {agree}"
        print("bucketed leaf kernel compiled ok")
    """)

def test_packed4_kernels_compiled_on_chip():
    """int4 (nibble-packed) variants of all three scan kernels lower
    through Mosaic and match their jnp oracles on the same backend."""
    _run_on_tpu("""
        import sys; sys.path.insert(0, ".")
        import numpy as np, jax, jax.numpy as jnp
        from recommenders_tpu.ops import leaf_scoring, quantization, scoring
        rng = np.random.RandomState(11)

        # 1. Full-scan bucketed sweep.
        q = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
        c = jnp.asarray(rng.normal(size=(4096, 128)).astype(np.float32))
        scales, codes = quantization.quantize_rows_device(c, 0.2, bits=4)
        packed = quantization.pack_nibbles(codes)
        vals, ids = scoring.bucketed_top_k(
            q, packed, k=10, buckets=1024, chunk=2048, scales=scales,
            packed4=True, valid_rows=4096)
        rv, ri = scoring.bucketed_top_k_reference(
            q, packed, k=10, buckets=1024, scales=scales, packed4=True,
            valid_rows=4096)
        agree = float((np.asarray(ids) == np.asarray(ri)).mean())
        assert agree >= 0.99, f"bucketed packed4 agreement {agree}"

        # 2. Probed leaf scoring.
        embs = rng.normal(size=(8, 256, 128)).astype(np.float32)
        ls, lc = quantization.quantize_rows_device(
            jnp.asarray(embs).reshape(-1, 128), None, bits=4)
        ls = ls.reshape(8, 256)
        lp = quantization.pack_nibbles(lc.reshape(8, 256, 128))
        probes = jnp.asarray(rng.randint(0, 8, size=(16, 3)), jnp.int32)
        qq = jnp.asarray(rng.normal(size=(16, 128)).astype(np.float32))
        got = leaf_scoring.probed_leaf_scores(
            qq, lp, ls, probes, packed4=True)
        want = leaf_scoring.probed_scores_reference(
            qq, lp, ls, probes, packed4=True)
        # MXU vs XLA dot precision differ; compare relative to the
        # score magnitude, not absolutely.
        err = float(jnp.abs(got - want).max())
        scale = float(jnp.abs(want).max()) + 1e-6
        assert err / scale < 1e-2, f"leaf packed4 rel err {err / scale}"

        # 3. Bucketed (in-kernel argmax) leaf scoring.
        rows = rng.permutation(8 * 256).astype(np.int32).reshape(8, 256)
        rows[:, -5:] = -1
        tprobes = jnp.asarray(rng.randint(0, 8, size=(2, 4)), jnp.int32)
        vk, rk = leaf_scoring.probed_bucketed_scores(
            qq, lp, ls, jnp.asarray(rows), tprobes, buckets=128,
            query_tile=8, packed4=True)
        vr, rr = leaf_scoring.probed_bucketed_reference(
            qq, lp, ls, jnp.asarray(rows), tprobes, buckets=128,
            query_tile=8, packed4=True)
        agree2 = float((np.asarray(rk) == np.asarray(rr)).mean())
        assert agree2 >= 0.99, f"bucketed-leaf packed4 agreement {agree2}"
        print("packed4 kernels ok", agree, err, agree2)
    """)


def test_engine_training_quality_on_chip(tmp_path):
    """COMPILED-kernel training on the chip reaches the same loss as
    the interpreted CPU path on identical data.

    End-to-end quality guard for the whole compiled update path (sort,
    pair list, routing matmul, rule, write-back): the denormal-routing
    bug would have trained row 0 of every block and failed the loss
    bound by an order of magnitude, while 'loss finite' checks passed.
    """
    work = str(tmp_path)
    script = """
        import sys; sys.path.insert(0, ".")
        import functools
        import numpy as np, jax, jax.numpy as jnp
        from recommenders_tpu import tasks as tasks_lib
        from recommenders_tpu.embedding import config as cfg
        from recommenders_tpu.embedding.engine import EmbeddingEngine

        B, D, V_U, V_I, STEPS = 512, 32, 2048, 4096, 200
        rng = np.random.RandomState(7)
        users = rng.randint(0, V_U, (STEPS, B)).astype(np.int32)
        # Learnable structure: each user has one true item, so the
        # in-batch softmax loss falls well below its ln(B) start only
        # if updates actually land on the right embedding rows.
        batches = {
            "user_id": jnp.asarray(users),
            "item_id": jnp.asarray((users * 7 + 3) %% V_I),
        }
        eng = EmbeddingEngine(
            (cfg.FeatureConfig(table=cfg.TableConfig(V_U, D, name="u"),
                               name="user_id"),
             cfg.FeatureConfig(table=cfg.TableConfig(V_I, D, name="i"),
                               name="item_id")),
            optimizer=cfg.OptimizerSpec(kind="adagrad",
                                        learning_rate=0.2),
            %s
        )
        state = eng.init(jax.random.PRNGKey(0))
        task = tasks_lib.Retrieval()

        def loss_of(acts):
            return task(acts["user_id"], acts["item_id"]).loss

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train(state, bs):
            def body(st, b):
                s2, l, _ = eng.grad_and_update(st, b, loss_of)
                return s2, l
            return jax.lax.scan(body, state, bs)

        state, losses = train(state, batches)
        print("FINAL_LOSS",
              float(np.asarray(losses)[-10:].mean()) / B)
    """
    out_tpu = _run_on_tpu(script % "sparse_update_kernel=True,")
    loss_tpu = float(out_tpu.split("FINAL_LOSS")[1].strip())

    # CPU twin: same data/seed, interpreted kernel path.
    proc = subprocess.run(
        ["python", "-c", textwrap.dedent(
            "import jax; jax.config.update('jax_platforms', 'cpu')\n"
            + textwrap.dedent(script % "sparse_update_kernel=True,")
        )],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "cpu"}, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    loss_cpu = float(proc.stdout.split("FINAL_LOSS")[1].strip())

    # Per-example in-batch softmax loss starts at ln(512) = 6.24; with
    # one true item per user, 200 Adagrad steps pull it far below 4.
    # Mis-routed updates leave it pinned near the start (the denormal
    # bug measured 6.3 here). CPU and TPU differ only by MXU bf16
    # rounding in the loss matmuls.
    assert loss_tpu < 4.0, (loss_tpu, loss_cpu)
    assert abs(loss_tpu - loss_cpu) < 0.3, (loss_tpu, loss_cpu)

    # Headline production numerics (bench.py defaults since round 5):
    # bf16 tables AND slots with stochastic rounding, lane-packed
    # storage, hi-only grad routing. Must train to the same loss as the
    # f32-state run above — this is the quality evidence behind
    # shipping these numerics as the bench default (a 400-step variant
    # measured IDENTICAL final loss to 4 decimals; docs/PARITY.md).
    out_aggr = _run_on_tpu(script % (
        "sparse_update_kernel=True, dtype=jnp.bfloat16, "
        "slot_dtype=jnp.bfloat16, exact_grad_routing=False,"
    ))
    loss_aggr = float(out_aggr.split("FINAL_LOSS")[1].strip())
    assert loss_aggr < 4.0, (loss_aggr, loss_tpu)
    assert abs(loss_aggr - loss_tpu) < 0.3, (loss_aggr, loss_tpu)


def test_native_host_serves_exported_scann(tmp_path):
    """Full ScaNN pipeline (probe → int8 bucketed fold) through the C++
    host with the kept-args manifest: jax.export drops unused module
    arguments, and feeding all saved arrays bound operands off by one
    and faulted the device until round 4 persisted
    `module_kept_var_idx` (utils/export.py kept_args.json)."""
    from recommenders_tpu.utils import native_serving as ns

    assert ns.axon_available(), "axon plugin or host binary missing"
    work = str(tmp_path)

    _run_on_tpu(f"""
        import sys; sys.path.insert(0, {REPO!r})
        import numpy as np, jax.numpy as jnp
        from recommenders_tpu.layers import approximate
        from recommenders_tpu.utils import export as ex
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
        c = jnp.asarray(
            rng.normal(size=(50_000, 128)).astype(np.float32)
        )
        index = approximate.ScaNN(
            k=10, num_leaves=128, num_leaves_to_search=32,
            quantize="int8", scoring_buckets=512, probe_tile=16,
            query_batch=64, training_iterations=3,
        ).index(c)
        es, ei = index(q)
        ex.export_index({work!r} + "/sc", index, q, k=10)
        np.save({work!r} + "/q.npy", np.asarray(q))
        np.save({work!r} + "/expected_ids.npy", np.asarray(ei))
        print("phase A ok")
    """, timeout=900.0)

    res = ns.serve_exported_index(
        os.path.join(work, "sc"), np.load(os.path.join(work, "q.npy")),
        timeout=900.0,
    )
    _, out_ids = res.outputs
    expected = np.load(os.path.join(work, "expected_ids.npy"))
    overlap = np.mean([
        len(np.intersect1d(expected[i], out_ids[i])) / 10
        for i in range(64)
    ])
    assert overlap > 0.99, overlap
