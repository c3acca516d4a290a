"""Serving export: serialize retrieval indexes / model fns to StableHLO.

The reference's serving story is `tf.saved_model.save` of a trained index
layer, loaded by TF Serving (optionally the ScaNN serving container,
`tensorflow_recommenders/layers/factorized_top_k.py:623-628,728-730`).
The JAX-native equivalent is `jax.export`: the jitted query computation is
serialized as versioned StableHLO plus its weights, loadable by any
process (Python or a C++ host binary linking PJRT) without the model code.

Two artifact layouts:
  - `export_fn` / `load_fn`: one serialized computation with weights baked
    in as constants — the BruteForce/Bucketed serving case.
  - `export_index` / `load_index`: a directory with the computation and
    the corpus arrays stored separately (npz), so re-indexing does not
    recompile — mirrors `index_from_dataset` → save → serve.
"""

from __future__ import annotations

import os
from typing import Callable, Tuple

import jax
import numpy as np
from jax import export as jax_export

Array = jax.Array

_FN_FILE = "computation.stablehlo"
_MLIR_FILE = "module.mlir"
_DATA_FILE = "arrays.npz"
_COMPILE_OPTIONS_FILE = "compile_options.pb"


def export_fn(path: str, fn: Callable, *example_args) -> None:
    """Serializes `jit(fn)` specialized to the example args' shapes.

    Writes two artifacts: `computation.stablehlo` (the versioned
    jax.export payload, loadable by `load_fn`) and `module.mlir` (the raw
    StableHLO module text, consumable by non-JAX hosts — e.g. the C++
    PJRT serving binary, `native/pjrt_host.cc`).
    """
    specs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        tuple(example_args),
    )
    exported = jax_export.export(jax.jit(fn))(*specs)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _FN_FILE), "wb") as f:
        f.write(exported.serialize())
    with open(os.path.join(path, _MLIR_FILE), "w") as f:
        f.write(exported.mlir_module())
    # Serialized default CompileOptionsProto for non-JAX hosts
    # (native/pjrt_host.cc passes it to PJRT_Client_Compile).
    from recommenders_tpu.utils import native_serving

    native_serving.write_compile_options(
        os.path.join(path, _COMPILE_OPTIONS_FILE)
    )


def load_fn(path: str) -> Callable:
    """Loads a serialized computation; returns a callable."""
    with open(os.path.join(path, _FN_FILE), "rb") as f:
        exported = jax_export.deserialize(f.read())
    return exported.call


def export_index(
    path: str,
    index,
    example_queries: Array,
    k: int,
) -> None:
    """Exports a built retrieval index's query path + its data arrays.

    Supports BruteForce, Bucketed, and ScaNN (whose partition/leaf arrays
    serialize alongside the search computation, mirroring the reference's
    ScaNN-in-SavedModel export, layers/factorized_top_k.py:728-730). Data
    is saved as npz, the query computation as StableHLO with the arrays as
    runtime arguments, so serving processes can swap corpora without
    recompiling.
    """
    from recommenders_tpu.layers import approximate, factorized_top_k

    if isinstance(index, approximate.ScaNN):
        return _export_scann(path, index, example_queries, k)

    candidates = index._candidates
    if candidates is None:
        raise ValueError("The index must be built (`index(...)`) first.")
    identifiers = getattr(index, "_identifiers", None)
    if identifiers is None:
        identifiers = np.arange(candidates.shape[0], dtype=np.int32)

    if isinstance(index, factorized_top_k.BruteForce):
        # BruteForce stores a padded corpus + validity mask; bake the mask
        # into the exported computation's inputs.
        valid = index._valid

        def query(queries, candidates, identifiers, valid):
            from recommenders_tpu.ops import scoring

            scores, rows = scoring.exact_top_k(
                queries, candidates, k, valid=valid
            )
            return scores, jax.numpy.take(identifiers, rows)

        extra = (valid,)
    else:
        valid = None
        scales = getattr(index, "_scales", None)
        if scales is not None:  # Quantized Bucketed: int8 codes + scales.

            def query(queries, candidates, identifiers, scales):
                scores, rows = _query_for(index)(
                    queries, candidates, k, scales
                )
                return scores, jax.numpy.take(identifiers, rows)

            extra = (np.asarray(scales),)
        else:

            def query(queries, candidates, identifiers):
                scores, rows = _query_for(index)(queries, candidates, k)
                return scores, jax.numpy.take(identifiers, rows)

            extra = ()

    candidates = np.asarray(candidates)
    if candidates.dtype.kind == "V":
        # npz cannot store ml_dtypes (bf16) arrays; persist as f32 and let
        # the exported computation re-cast to the index's corpus dtype.
        candidates = candidates.astype(np.float32)

    os.makedirs(path, exist_ok=True)
    arrays = {
        "candidates": candidates,
        "identifiers": np.asarray(identifiers),
    }
    if valid is not None:
        arrays["valid"] = np.asarray(valid)
    if not isinstance(index, factorized_top_k.BruteForce):
        if getattr(index, "_scales", None) is not None:
            arrays["scales"] = np.asarray(index._scales)
    np.savez(os.path.join(path, _DATA_FILE), **arrays)
    export_fn(
        path, query, example_queries, candidates, identifiers, *extra
    )


def load_index(path: str) -> Callable[[Array], Tuple[Array, Array]]:
    """Loads an exported index; returns `queries → (scores, ids)`."""
    data = np.load(os.path.join(path, _DATA_FILE))
    call = load_fn(path)
    if "centroids" in data.files:  # ScaNN artifact.
        args = [
            data[name]
            for name in ("centroids", "leaf_embs", "leaf_scales",
                         "leaf_ids", "leaf_rows", "leaf_valid")
            if name in data.files
        ]

        def serve_scann(queries):
            return call(queries, *args)

        return serve_scann
    candidates = data["candidates"]
    identifiers = data["identifiers"]
    extra = ()
    if "scales" in data.files:
        extra += (data["scales"],)
    if "valid" in data.files:
        extra += (data["valid"],)

    def serve(queries):
        return call(queries, candidates, identifiers, *extra)

    return serve


def _export_scann(path: str, index, example_queries: Array, k: int) -> None:
    from recommenders_tpu.layers import approximate

    if not index._built:
        raise ValueError("The index must be built (`index(...)`) first.")
    quantized = index._quantize
    num_probes = index._num_probes
    k = min(k, index._num_candidates)

    arrays = {
        "centroids": np.asarray(index._centroids),
        "leaf_embs": np.asarray(index._leaf_embs),
        "leaf_ids": np.asarray(index._leaf_ids),
        "leaf_rows": np.asarray(index._leaf_rows),
        "leaf_valid": np.asarray(index._leaf_valid),
    }
    if quantized:
        arrays["leaf_scales"] = np.asarray(index._leaf_scales)

    if quantized:

        def query(queries, centroids, leaf_embs, leaf_scales, leaf_ids,
                  leaf_rows, leaf_valid):
            scores, ids, _ = approximate._search(
                queries, centroids, leaf_embs, leaf_scales, leaf_ids,
                leaf_rows, leaf_valid, num_probes, k, True,
            )
            return scores, ids

        args = (arrays["centroids"], arrays["leaf_embs"],
                arrays["leaf_scales"], arrays["leaf_ids"],
                arrays["leaf_rows"], arrays["leaf_valid"])
    else:

        def query(queries, centroids, leaf_embs, leaf_ids, leaf_rows,
                  leaf_valid):
            scores, ids, _ = approximate._search(
                queries, centroids, leaf_embs, None, leaf_ids,
                leaf_rows, leaf_valid, num_probes, k, False,
            )
            return scores, ids

        args = (arrays["centroids"], arrays["leaf_embs"],
                arrays["leaf_ids"], arrays["leaf_rows"],
                arrays["leaf_valid"])

    os.makedirs(path, exist_ok=True)
    np.savez(os.path.join(path, _DATA_FILE), **arrays)
    export_fn(path, query, example_queries, *args)


def _query_for(index):
    """Returns the pure `(queries, candidates, k) → (scores, rows)` fn."""
    from recommenders_tpu.layers import factorized_top_k
    from recommenders_tpu.ops import scoring

    if isinstance(index, factorized_top_k.Bucketed):
        buckets, chunk = index._buckets, index._chunk
        query_tile = index._query_tile
        corpus_dtype = index._corpus_dtype

        def bucketed(queries, candidates, k, scales=None):
            # Bake the index's full serving config into the export: the
            # VMEM-fit recipe (e.g. B=4096 needs query_tile=128 + bf16
            # corpus) must survive into the serialized kernel, not revert
            # to defaults. Note the backend branch is resolved at export
            # (trace) time — an artifact exported on CPU carries the jnp
            # reference path, one exported on TPU carries the Pallas
            # kernel.
            if corpus_dtype is not None:
                queries = queries.astype(corpus_dtype)
                candidates = candidates.astype(corpus_dtype)
            if jax.default_backend() == "cpu":
                return scoring.bucketed_top_k_reference(
                    queries, candidates, k, buckets=buckets,
                    scales=scales,
                )
            return scoring.bucketed_top_k(
                queries, candidates, k, buckets=buckets, chunk=chunk,
                query_tile=query_tile, scales=scales,
            )

        return bucketed

    raise ValueError(
        f"export_index supports BruteForce and Bucketed indexes; got "
        f"{type(index).__name__}."
    )
