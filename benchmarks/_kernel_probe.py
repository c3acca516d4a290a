"""Probe the stacked headline kernel's 2.8x-over-floor residual.

Variants of the presorted sorted_block_apply call at the exact headline
shape (V=196608 stacked, n=8192, d=64, bf16 table + f32 adagrad slot):
SR on/off, block_rows, chunk — scan-differenced on the real chip.

Usage: python benchmarks/_kernel_probe.py
"""

import functools
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np  # noqa: E402

V = 196_608
N = 8_192
DIM = 64
SHORT, LONG = 10, 110


def main():
    import jax
    import jax.numpy as jnp

    from recommenders_tpu.embedding import config as cfg
    from recommenders_tpu.embedding import sparse_optimizer
    from recommenders_tpu.ops import sparse_apply

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    rng = np.random.RandomState(int(time.time()))
    spec = cfg.OptimizerSpec(kind="adagrad", learning_rate=0.1)
    slot_names, scalars, rule, _ = sparse_optimizer._kernel_rule(
        spec, jnp.int32(0)
    )

    table = jnp.asarray(
        rng.normal(size=(V, DIM)).astype(np.float32)
    ).astype(jnp.bfloat16)
    slot = jnp.asarray(
        np.abs(rng.normal(size=(V, DIM))).astype(np.float32)
    )
    pre = jnp.sort(jnp.asarray(rng.randint(0, V, N).astype(np.int32)))
    grads = jnp.asarray(
        rng.normal(size=(N, DIM)).astype(np.float32)
    ) * 1e-3

    def timed(name, br, chunk, use_sr, need_count=True, sts0=None,
              rule_=None, scalars_=None):
        rule_ = rule_ or rule
        scalars_ = scalars if scalars_ is None else scalars_
        sts0 = sts0 if sts0 is not None else (table, slot)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(sts, salts):
            def body(sts, salt):
                new = sparse_apply.sorted_block_apply(
                    sts, pre, grads * (1.0 + salt * 1e-9), rule_,
                    scalars=scalars_, block_rows=br, chunk=chunk,
                    stochastic_round_seed=salt if use_sr else None,
                    need_count=need_count,
                )
                return tuple(new), new[1][0, 0]
            return jax.lax.scan(body, sts, salts)

        salts = jnp.arange(LONG, dtype=jnp.int32)
        sts = tuple(jnp.copy(s) for s in sts0)
        sts, _ = run(sts, salts[:SHORT])
        sts, out = run(sts, salts)
        np.asarray(out)[-1]
        ts = []
        for _ in range(3):
            sts = tuple(jnp.copy(s) for s in sts0)
            t0 = time.perf_counter()
            sts, out = run(sts, salts[:SHORT])
            np.asarray(out)[-1]
            t_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            sts, out = run(sts, salts)
            np.asarray(out)[-1]
            t_l = time.perf_counter() - t0
            ts.append((t_l - t_s) / (LONG - SHORT) * 1e6)
        print(f"{name:28s} {sorted(ts)[1]:8.1f} us/step",
              file=sys.stderr)

    for name, br, chunk, sr, nc in (
        ("br2048 c128 SR", 2048, 128, True, True),
        ("br2048 c128 SR nocount", 2048, 128, True, False),
        ("br2048 c256 SR nocount", 2048, 256, True, False),
        ("br2048 c64 SR nocount", 2048, 64, True, False),
        ("br2048 c32 SR nocount", 2048, 32, True, False),
        ("br2048 c16 SR nocount", 2048, 16, True, False),
        ("br4096 c64 SR nocount", 4096, 64, True, False),
        ("br2048 c64 noSR nocount", 2048, 64, False, False),
        ("br2048 c128 noSR nocount", 2048, 128, False, False),
        ("br1024 c128 SR nocount", 1024, 128, True, False),
        ("br4096 c128 SR nocount", 4096, 128, True, False),
    ):
        try:
            timed(name, br, chunk, sr, need_count=nc)
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} FAILED: {type(e).__name__} "
                  f"{str(e)[:120]}", file=sys.stderr)

    # Rowwise Adagrad: [V, 1] scalar accumulator — the slot plane's HBM
    # traffic drops DIM-fold; probes how close that gets the update to
    # the table-only streaming floor.
    spec_rw = cfg.OptimizerSpec(kind="rowwise_adagrad", learning_rate=0.1)
    _, scalars_rw, rule_rw, _ = sparse_optimizer._kernel_rule(
        spec_rw, jnp.int32(0)
    )
    slot_rw = jnp.asarray(
        np.abs(rng.normal(size=(V, 1))).astype(np.float32)
    )
    for name, br, chunk in (
        ("rowwise br2048 c128 SR", 2048, 128),
        ("rowwise br4096 c128 SR", 4096, 128),
        ("rowwise br8192 c128 SR", 8192, 128),
    ):
        try:
            timed(name, br, chunk, True, need_count=False,
                  sts0=(table, slot_rw), rule_=rule_rw,
                  scalars_=scalars_rw)
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} FAILED: {type(e).__name__} "
                  f"{str(e)[:120]}", file=sys.stderr)


if __name__ == "__main__":
    main()
