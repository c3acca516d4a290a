"""Probe: is the blocked sparse-apply kernel 2x-off-floor because of
input/output aliasing hazards, grid overheads, or a mismeasured floor?

Three measurements on the headline update shape (V=131072, D=64,
n=4096, adagrad), each scan-differenced with chained data dependence
(CLAUDE.md timing rules):

  kernel/alias     sorted_block_apply as shipped (in-place aliased)
  kernel/noalias   same kernel, fresh output buffers (_alias=False) —
                   isolates write-after-read DMA serialization
  copy/alias[+no]  a trivial streaming kernel (out = in + eps over the
                   same two state arrays, same block size): the real
                   achievable floor for block-streamed read+write,
                   including Mosaic pipeline overheads

Usage: python benchmarks/_alias_probe.py [--bf16-table] [--br 2048]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np  # noqa: E402

V, D, N = 131_072, 64, 4096
SHORT, LONG = 10, 110


def differenced(short_fn, long_fn, args):
    np.asarray(short_fn(*args))
    np.asarray(long_fn(*args))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(short_fn(*args))
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(long_fn(*args))
        t_l = time.perf_counter() - t0
        times.append((t_l - t_s) / (LONG - SHORT))
    return min(times)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bf16-table", action="store_true")
    p.add_argument("--br", type=int, default=2048)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from recommenders_tpu.ops import sparse_apply

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    seed = int(time.time() * 1000) % (2**31)
    rng = np.random.RandomState(seed)
    tdt = jnp.bfloat16 if args.bf16_table else jnp.float32
    table = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32)).astype(tdt)
    accum = jnp.asarray(
        rng.uniform(0.1, 1.0, size=(V, D)).astype(np.float32)
    )
    ids = jnp.asarray(rng.randint(0, V, size=(LONG, N)).astype(np.int32))
    grads = jnp.asarray(
        rng.normal(size=(LONG, N, D)).astype(np.float32) * 1e-3
    )
    bytes_rw = V * D * (table.dtype.itemsize + 4) * 2
    floor_us = bytes_rw / 819e9 * 1e6
    print(
        f"table={tdt.__name__}  traffic={bytes_rw/2**20:.0f} MiB "
        f"floor={floor_us:.0f} us @819GB/s"
    )

    def rule(states, g, count, sc):
        t, a = states
        new_a = a + jnp.square(g)
        return [t - sc[0] * g * jax.lax.rsqrt(new_a + 1e-12), new_a]

    lr = jnp.asarray([0.1], jnp.float32)

    def kernel_chain(n_steps, alias):
        @jax.jit
        def run(table, accum):
            def body(carry, x):
                t, a = carry
                i, g = x
                order = jnp.argsort(i)
                t2, a2 = sparse_apply.sorted_block_apply(
                    (t, a), i[order],
                    g[order].astype(jnp.float32), rule,
                    scalars=lr, block_rows=args.br, chunk=128,
                    _alias=alias,
                )
                return (t2, a2), ()

            (t, a), _ = jax.lax.scan(
                body, (table, accum), (ids[:n_steps], grads[:n_steps])
            )
            return t[0, 0].astype(jnp.float32) + a[0, 0]

        return run

    # Trivial streaming floor kernel: whole-table block copy + epsilon.
    def copy_kernel(t_ref, a_ref, to_ref, ao_ref):
        to_ref[...] = t_ref[...] + jnp.asarray(1e-7, t_ref.dtype)
        ao_ref[...] = a_ref[...] + 1e-7

    nb = V // args.br
    spec = pl.BlockSpec((args.br, D), lambda i: (i, 0))

    def copy_chain(n_steps, alias):
        call = pl.pallas_call(
            copy_kernel,
            grid=(nb,),
            in_specs=[spec, spec],
            out_specs=(spec, spec),
            out_shape=(
                jax.ShapeDtypeStruct((V, D), table.dtype),
                jax.ShapeDtypeStruct((V, D), jnp.float32),
            ),
            input_output_aliases={0: 0, 1: 1} if alias else {},
        )

        @jax.jit
        def run(table, accum):
            def body(carry, _):
                t, a = carry
                return call(t, a), ()

            (t, a), _ = jax.lax.scan(
                body, (table, accum), None, length=n_steps
            )
            return t[0, 0].astype(jnp.float32) + a[0, 0]

        return run

    for name, maker in (("kernel", kernel_chain), ("copy", copy_chain)):
        for alias in (True, False):
            t = differenced(
                maker(SHORT, alias), maker(LONG, alias), (table, accum)
            )
            print(
                f"  {name}/{'alias' if alias else 'noalias'}: "
                f"{t*1e6:.0f} us/step ({t*1e6/floor_us:.2f}x floor)",
                flush=True,
            )


if __name__ == "__main__":
    main()
