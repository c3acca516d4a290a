"""Pallas leaf-scoring kernel for the ScaNN-style probed search.

The naive probed search gathers `leaf_embs[probes]` into a
`[Q, P, cap, D]` tensor before scoring (17 GB at 1M×128 corpus with the
module defaults — it cannot run). This kernel scores probed leaves IN
PLACE: the probe table is scalar-prefetched, each grid step streams one
(query, probe) pair's leaf block HBM→VMEM (double-buffered by the
Pallas pipeline) and issues one `[1, D] × [D, cap]` dot, writing only
the `[Q, P·cap]` score matrix. HBM traffic is exactly the probed bytes —
`Q·P·cap·D·itemsize` — with int8 leaves 4× less than f32; nothing
quadratic in `cap` ever exists.

Per-row quantization scales fold in AFTER the dot: for per-row scale
`s_c`, `q·(s_c·v_c) = s_c·(q·v_c)`, so the integer rows go straight
into the MXU-feeding convert and one multiply per output element.

The counterpart in the reference stack is ScaNN's C++ asymmetric-hash
scorer (`tensorflow_recommenders/layers/factorized_top_k.py:688-707` →
scann `score_ah`); this is its TPU-resident equivalent.

Requirements: `D % 128 == 0`, `cap % 128 == 0` (lane/sublane tiling);
callers fall back to `probed_scores_reference` otherwise (CPU always
uses the reference path).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANES = 128


def _kernel_f32(probes_ref, q_ref, leaf_ref, out_ref):
    scores = jax.lax.dot_general(
        q_ref[0],            # [1, D] (block [1, 1, D])
        leaf_ref[0],         # [cap, D]
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                        # [1, cap]
    out_ref[0] = scores


def _kernel_quantized(probes_ref, q_ref, leaf_ref, scale_ref, out_ref):
    e = leaf_ref[0].astype(jnp.float32)  # [cap, D] int8 → f32 in VMEM.
    scores = jax.lax.dot_general(
        q_ref[0],
        e,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                        # [1, cap]
    out_ref[0] = scores * scale_ref[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def probed_leaf_scores(
    queries: Array,
    leaf_embs: Array,
    leaf_scales: Optional[Array],
    probes: Array,
    interpret: bool = False,
) -> Array:
    """Scores each query against its probed leaves' rows.

    Args:
      queries: `[Q, D]` f32 (D a multiple of 128).
      leaf_embs: `[L, cap, D]` f32/bf16 or int8 (cap a multiple of 128).
      leaf_scales: `[L, cap]` f32 per-row dequantization scales, or None.
      probes: `[Q, P]` int32 leaf ids probed per query.
      interpret: Run the kernel interpreted (tests on CPU).

    Returns:
      `[Q, P·cap]` f32 scores, laid out probe-major (probe p's rows at
      `[p·cap, (p+1)·cap)`), matching
      `leaf_valid[probes].reshape(Q, -1)` masking downstream.
    """
    qn, d = queries.shape
    num_leaves, cap, d2 = leaf_embs.shape
    assert d == d2, (d, d2)
    if d % _LANES or cap % _LANES:
        raise ValueError(
            f"probed_leaf_scores needs dim and leaf capacity to be "
            f"multiples of {_LANES}; got dim={d}, cap={cap}. Use "
            f"probed_scores_reference instead."
        )
    num_probes = probes.shape[1]
    grid = (qn, num_probes)

    quantized = leaf_scales is not None
    kernel = _kernel_quantized if quantized else _kernel_f32
    # Mosaic requires the last two block dims to be (8k, 128k) or equal
    # to the array dims; singleton middle axes make the size-1 blocks
    # legal ([Q, 1, D] block (1, 1, D) etc.).
    in_specs = [
        pl.BlockSpec((1, 1, d), lambda q, p, probes_ref: (q, 0, 0)),
        pl.BlockSpec(
            (1, cap, d),
            lambda q, p, probes_ref: (probes_ref[q, p], 0, 0),
        ),
    ]
    inputs = [queries[:, None, :], leaf_embs]
    if quantized:
        in_specs.append(
            pl.BlockSpec(
                (1, 1, cap),
                lambda q, p, probes_ref: (probes_ref[q, p], 0, 0),
            )
        )
        inputs.append(leaf_scales[:, None, :])

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, 1, cap), lambda q, p, probes_ref: (q, 0, p)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (qn, 1, num_probes * cap), jnp.float32
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * qn * num_probes * cap * d,
            bytes_accessed=(
                qn * num_probes * cap * d * leaf_embs.dtype.itemsize
                + qn * d * 4
                + qn * num_probes * cap * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(probes, *inputs)
    return out.reshape(qn, num_probes * cap)


def probed_scores_reference(
    queries: Array,
    leaf_embs: Array,
    leaf_scales: Optional[Array],
    probes: Array,
) -> Array:
    """Pure-jnp oracle (the original gather formulation; any backend).

    Materializes the `[Q, P, cap, D]` gather — fine for tests and small
    CPU corpora, the exact thing the kernel exists to avoid at scale.
    """
    embs = leaf_embs[probes]  # [Q, P, cap, D]
    if leaf_scales is not None:
        embs = embs.astype(jnp.float32) * leaf_scales[probes][..., None]
    scores = jnp.einsum(
        "qd,qpcd->qpc", queries, embs, preferred_element_type=jnp.float32
    )
    q = queries.shape[0]
    return scores.reshape(q, -1)
