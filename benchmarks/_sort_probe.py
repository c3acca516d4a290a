"""Throwaway probe: per-scan-iteration cost of tiny bodies on the chip.

Isolates (a) the floor cost of a chained scan iteration, (b) one
argsort, (c) two argsorts, (d) single-array lax.sort, (e) packed
key sort replacing argsort. Scan-length differencing as in
benchmarks/step_breakdown.py.
"""

import functools
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

N = 4096
V = 65_536
SHORT, LONG = 10, 110


def main():
    import jax
    import jax.numpy as jnp

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    rng = np.random.RandomState(int(time.time()))

    def batches(n):
        return jax.device_put(
            rng.randint(0, V, (n, N)).astype(np.int32)
        )

    def make(body):
        @jax.jit
        def run(carry, bs):
            return jax.lax.scan(body, carry, bs)
        return run

    def b_floor(c, b):
        s = c + b[0]
        return s, s

    def b_argsort(c, b):
        order = jnp.argsort((b + c) % V)
        return order[0], order[0]

    def b_argsort2(c, b):
        o1 = jnp.argsort((b + c) % V)
        o2 = jnp.argsort((b + o1[0]) % V)
        return o2[0], o2[0]

    def b_sort1(c, b):
        s = jax.lax.sort((b + c) % V)
        return s[0], s[0]

    def b_packed(c, b):
        ids = (b + c) % V
        pack = ids * jnp.int32(N) + jax.lax.iota(jnp.int32, N)
        s = jax.lax.sort(pack)
        return s[0] >> jnp.int32(12), s[0]

    def b_gather_perm(c, b):
        g = jnp.broadcast_to(
            jnp.arange(64, dtype=jnp.float32), (N, 64)
        )
        order = jnp.argsort((b + c) % V)
        rows = g[order]
        s = jnp.sum(rows[:, 0]).astype(jnp.int32)
        return s, s

    bodies = {
        "floor": b_floor,
        "argsort": b_argsort,
        "argsort_x2": b_argsort2,
        "sort1": b_sort1,
        "packed_sort": b_packed,
        "argsort+permrows": b_gather_perm,
    }

    def timed(run, c0, n):
        bs = batches(n)
        # Fence the async h2d transfer: device_put returns before the
        # bytes cross the (slow) host link; without this, the scan's
        # wait-for-input lands inside the timed region (~470 us/step of
        # pure transfer at LONG=110).
        np.asarray(jax.jit(lambda x: jnp.sum(x))(bs))
        t0 = time.perf_counter()
        c, out = run(c0, bs)
        np.asarray(out[-1])
        return time.perf_counter() - t0, c

    for name, body in bodies.items():
        run = make(body)
        c0 = jnp.int32(0)
        for n in (SHORT, LONG, SHORT):
            _, c0 = timed(run, c0, n)
        ts, c0 = timed(run, c0, SHORT)
        tl, c0 = timed(run, c0, LONG)
        per = (tl - ts) / (LONG - SHORT)
        print(f"{name:18s} {per * 1e6:8.1f} us/step")


if __name__ == "__main__":
    main()
