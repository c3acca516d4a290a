"""Benchmark: explicit shard_map id exchange vs GSPMD-scheduled lookup.

Compares the hand-written collective schedule
(`parallel/embedding_lookup.py`) against the compiler-derived one for
the sharded-table gather + scatter-add pair, on the virtual 8-device CPU
mesh (2 data × 4 model). Single-chip TPU cannot host a multi-device
mesh, so this measures the *mechanics* (correctness + relative cost of
the two schedules under identical sharding); on a real slice the same
code measures ICI routing.

Usage: python benchmarks/id_exchange.py [--rows 1048576] [--dim 128]
       [--batch 8192] [--iters 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from recommenders_tpu.parallel import embedding_lookup as ex_lib  # noqa: E402
from recommenders_tpu.parallel import mesh as mesh_lib  # noqa: E402


def _time(fn, iters):
    fn()  # Warm-up / compile.
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms/iter


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=1 << 20)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args()

    mesh = mesh_lib.create_mesh(shape=(2, 4))
    rng = np.random.RandomState(0)
    table = jax.device_put(
        jnp.asarray(
            rng.normal(size=(args.rows, args.dim)).astype(np.float32)
        ),
        NamedSharding(mesh, P("model", None)),
    )
    ids = jax.device_put(
        jnp.asarray(
            rng.randint(0, args.rows, args.batch).astype(np.int32)
        ),
        NamedSharding(mesh, P("data")),
    )
    grads = jax.device_put(
        jnp.asarray(
            rng.normal(size=(args.batch, args.dim)).astype(np.float32)
        ),
        NamedSharding(mesh, P("data", None)),
    )

    explicit_lookup = lambda: ex_lib.sharded_lookup(table, ids, mesh)  # noqa: E731
    gspmd_lookup = lambda: ex_lib.gspmd_lookup(table, ids, mesh)  # noqa: E731
    explicit_update = lambda: ex_lib.sharded_scatter_add(  # noqa: E731
        table, ids, grads, mesh, scale=-0.1
    )

    @jax.jit
    def _gspmd_update(table, ids, grads):
        safe = jnp.where(ids >= 0, ids, table.shape[0])
        return table.at[safe].add(-0.1 * grads, mode="drop")

    gspmd_update = lambda: _gspmd_update(table, ids, grads)  # noqa: E731

    np.testing.assert_allclose(
        np.asarray(explicit_lookup()), np.asarray(gspmd_lookup()),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(explicit_update()), np.asarray(gspmd_update()),
        rtol=1e-5, atol=1e-6,
    )

    results = {
        "lookup_explicit_ms": _time(explicit_lookup, args.iters),
        "lookup_gspmd_ms": _time(gspmd_lookup, args.iters),
        "update_explicit_ms": _time(explicit_update, args.iters),
        "update_gspmd_ms": _time(gspmd_update, args.iters),
    }
    print(
        f"rows={args.rows} dim={args.dim} batch={args.batch} "
        f"mesh=2x4 (cpu virtual)"
    )
    for k, v in results.items():
        print(f"{k}: {v:.3f}")


if __name__ == "__main__":
    main()
