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
_BF16_KEYS = "__bf16_keys__"
_STRING_IDS_FILE = "identifiers.json"


def _save_string_ids(path: str, index) -> None:
    """Persists a string-identified index's host-side id table.

    The exported computation returns ROW positions (StableHLO has no
    string tensors); `identifiers.json` is the row → string map, so any
    consumer — `load_index` here, or a caller of the C++ PJRT host
    (`native/pjrt_host.cc`), which prints row ids — can decode results
    exactly like the in-process layer does."""
    import json

    strings = getattr(index, "_id_strings", None)
    if strings is None:
        return
    with open(os.path.join(path, _STRING_IDS_FILE), "w") as f:
        json.dump([str(s) for s in np.asarray(strings).tolist()], f)


def load_identifier_strings(path: str):
    """Returns the exported row → string identifier table, or None."""
    import json

    p = os.path.join(path, _STRING_IDS_FILE)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return np.asarray(json.load(f), dtype=np.str_)


def _save_arrays(path: str, arrays: dict) -> None:
    """npz-saves arrays; bf16 (an ml_dtypes extension numpy cannot
    round-trip — it loads back as raw V2) is stored as a uint16 view
    plus a key manifest, so serve-time args keep the exported dtype and
    no full-corpus f32→bf16 cast runs per query batch."""
    out = {}
    bf16_keys = []
    for name, a in arrays.items():
        a = np.asarray(a)
        if a.dtype.kind == "V":
            out[name] = a.view(np.uint16)
            bf16_keys.append(name)
        else:
            out[name] = a
    out[_BF16_KEYS] = np.asarray(bf16_keys, dtype=np.str_)
    np.savez(os.path.join(path, _DATA_FILE), **out)


def _load_arrays(path: str):
    """Inverse of `_save_arrays`: restores bf16 views."""
    import ml_dtypes

    data = np.load(os.path.join(path, _DATA_FILE))
    bf16 = (
        set(data[_BF16_KEYS].tolist()) if _BF16_KEYS in data.files
        else set()
    )
    out = {}
    for name in data.files:
        if name == _BF16_KEYS:
            continue
        a = data[name]
        out[name] = a.view(ml_dtypes.bfloat16) if name in bf16 else a
    return out


def export_fn(
    path: str, fn: Callable, *example_args, platforms=None
) -> None:
    """Serializes `jit(fn)` specialized to the example args' shapes.

    Writes two artifacts: `computation.stablehlo` (the versioned
    jax.export payload, loadable by `load_fn`) and `module.mlir` (the raw
    StableHLO module text, consumable by non-JAX hosts — e.g. the C++
    PJRT serving binary, `native/pjrt_host.cc`).

    `platforms` enables cross-platform lowering (e.g. `("tpu",)` from a
    CPU-only export process — the serving-host workflow, where the
    single-claimant chip must stay free for the C++ binary). Pallas
    kernels lower to Mosaic custom calls at export; the Mosaic→machine
    compile happens on the serving host at PJRT-compile time.
    """
    specs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        tuple(example_args),
    )
    exported = jax_export.export(
        jax.jit(fn), platforms=list(platforms) if platforms else None
    )(*specs)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _FN_FILE), "wb") as f:
        f.write(exported.serialize())
    with open(os.path.join(path, _MLIR_FILE), "w") as f:
        f.write(exported.mlir_module())
    # jax.export DROPS arguments the traced fn never uses from the
    # module signature (e.g. a ScaNN export's leaf_rows on the
    # no-reorder gather path). The in-process loader consults the
    # Exported object's kept-var indices; a raw-MLIR host must too —
    # feeding every array would bind operands off by one and fault the
    # device. Persist the kept indices for `native_serving`.
    import json

    with open(os.path.join(path, "kept_args.json"), "w") as f:
        json.dump(sorted(exported.module_kept_var_idx), f)
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
    platforms=None,
) -> None:
    """Exports a built retrieval index's query path + its data arrays.

    Supports BruteForce, Bucketed, and ScaNN (whose partition/leaf arrays
    serialize alongside the search computation, mirroring the reference's
    ScaNN-in-SavedModel export, layers/factorized_top_k.py:728-730). Data
    is saved as npz, the query computation as StableHLO with the arrays as
    runtime arguments, so serving processes can swap corpora without
    recompiling.

    `platforms=("tpu",)` cross-lowers from a CPU process for TPU serving
    (Pallas query kernels included) — the C++-host workflow, where the
    single-claimant chip must stay free for the serving binary.
    """
    from recommenders_tpu.layers import approximate, factorized_top_k

    for_tpu = (
        "tpu" in tuple(platforms) if platforms
        else jax.default_backend() != "cpu"
    )
    if isinstance(index, approximate.ScaNN):
        return _export_scann(
            path, index, example_queries, k, platforms=platforms
        )

    candidates = index._candidates
    if candidates is None:
        raise ValueError("The index must be built (`index(...)`) first.")
    identifiers = getattr(index, "_identifiers", None)
    if identifiers is None:
        # Logical row count, NOT the stored array's leading dim: an int4
        # Bucketed corpus is nibble-packed ([n/2, D]) and may be padded.
        logical = getattr(index, "_num_candidates", None)
        if logical is None:
            logical = candidates.shape[0]
        identifiers = np.arange(logical, dtype=np.int32)

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
                scores, rows = _query_for(index, for_tpu)(
                    queries, candidates, k, scales
                )
                return scores, jax.numpy.take(identifiers, rows)

            extra = (np.asarray(scales),)
        else:

            def query(queries, candidates, identifiers):
                scores, rows = _query_for(index, for_tpu)(
                    queries, candidates, k
                )
                return scores, jax.numpy.take(identifiers, rows)

            extra = ()

    candidates = np.asarray(candidates)

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
    _save_arrays(path, arrays)
    _save_string_ids(path, index)
    export_fn(
        path, query, example_queries, candidates, identifiers, *extra,
        platforms=platforms,
    )


def load_index(path: str) -> Callable[[Array], Tuple[Array, Array]]:
    """Loads an exported index; returns `queries → (scores, ids)`.

    String-identified exports (see `_save_string_ids`) decode row
    results back to the indexed strings — ids come back as a NumPy
    string array, matching the in-process layer."""
    data = _load_arrays(path)
    call = load_fn(path)
    strings = load_identifier_strings(path)

    def _maybe_decode(scores, rows):
        if strings is None:
            return scores, rows
        return scores, np.take(
            strings, np.asarray(rows), axis=0, mode="clip"
        )

    if "centroids" in data:  # ScaNN artifact.
        args = [
            data[name]
            for name in ("centroids", "leaf_embs", "leaf_scales",
                         "leaf_ids", "leaf_rows", "leaf_valid",
                         "flat_ids", "corpus", "corpus_identifiers")
            if name in data
        ]

        def serve_scann(queries):
            return _maybe_decode(*call(queries, *args))

        return serve_scann
    candidates = data["candidates"]
    identifiers = data["identifiers"]
    extra = ()
    if "scales" in data:
        extra += (data["scales"],)
    if "valid" in data:
        extra += (data["valid"],)

    def serve(queries):
        return _maybe_decode(*call(queries, candidates, identifiers, *extra))

    return serve


def _export_scann(
    path: str, index, example_queries: Array, k: int, platforms=None
) -> None:
    """Full ScaNN serving pipeline in one exported computation: probe →
    (quantized) leaf scoring → optional exact reorder — the counterpart
    of the reference serializing the whole C++ searcher into the
    SavedModel (layers/factorized_top_k.py:728-730)."""
    from recommenders_tpu.layers import approximate

    for_tpu = (
        "tpu" in tuple(platforms) if platforms
        else jax.default_backend() != "cpu"
    )

    if not index._built:
        raise ValueError("The index must be built (`index(...)`) first.")
    quantized = index._quantize
    num_probes = index._num_probes
    reorder_n = index._reorder_n
    dedup = index._soar_lambda is not None
    buckets = index._scoring_buckets
    tile = index._probe_tile
    k = min(k, index._num_candidates)
    shortlist = max(k, reorder_n) if reorder_n else k

    names = ["centroids", "leaf_embs"]
    if quantized:
        names.append("leaf_scales")
    names += ["leaf_ids", "leaf_rows", "leaf_valid"]
    if buckets is not None:
        names.append("flat_ids")
    if reorder_n:
        names += ["corpus", "corpus_identifiers"]
    arrays = {
        "centroids": index._centroids,
        "leaf_embs": index._leaf_embs,
        "leaf_ids": index._leaf_ids,
        "leaf_rows": index._leaf_rows,
        "leaf_valid": index._leaf_valid,
    }
    if quantized:
        arrays["leaf_scales"] = index._leaf_scales
    if buckets is not None:
        arrays["flat_ids"] = index._flat_ids
    if reorder_n:
        arrays["corpus"] = index._corpus
        arrays["corpus_identifiers"] = index._identifiers
    arrays = {name: np.asarray(arrays[name]) for name in names}

    def query(queries, *args):
        a = dict(zip(names, args))
        if buckets is not None:
            qn = queries.shape[0]
            pad = (-qn) % tile
            if pad:
                queries_p = jax.numpy.pad(queries, ((0, pad), (0, 0)))
            else:
                queries_p = queries
            scores, ids, rows = approximate._search_bucketed(
                queries_p, a["centroids"], a["leaf_embs"],
                a.get("leaf_scales"), a["leaf_rows"], a["flat_ids"],
                num_probes, shortlist, quantized, dedup, buckets, tile,
                for_tpu=for_tpu,
            )
            scores, ids, rows = scores[:qn], ids[:qn], rows[:qn]
        else:
            scores, ids, rows = approximate._search(
                queries, a["centroids"], a["leaf_embs"],
                a.get("leaf_scales"), a["leaf_ids"], a["leaf_rows"],
                a["leaf_valid"], num_probes, shortlist, quantized, dedup,
                for_tpu=for_tpu,
            )
        if reorder_n:
            return approximate._reorder(
                queries, rows, scores, a["corpus"],
                a["corpus_identifiers"], k,
            )
        return scores[:, :k], ids[:, :k]

    os.makedirs(path, exist_ok=True)
    _save_arrays(path, arrays)
    _save_string_ids(path, index)
    export_fn(
        path, query, example_queries, *(arrays[name] for name in names),
        platforms=platforms,
    )


def _query_for(index, for_tpu=None):
    """Returns the pure `(queries, candidates, k) → (scores, rows)` fn."""
    from recommenders_tpu.layers import factorized_top_k
    from recommenders_tpu.ops import scoring

    if for_tpu is None:
        for_tpu = jax.default_backend() != "cpu"

    if isinstance(index, factorized_top_k.Bucketed):
        buckets, chunk = index._buckets, index._chunk
        query_tile = index._query_tile
        corpus_dtype = index._corpus_dtype
        packed4 = index._quantize == "int4"
        # The stored corpus is chunk-padded at index time (every mode);
        # valid_rows masks the padding in the exported computation too.
        valid_rows = index._num_candidates

        def bucketed(queries, candidates, k, scales=None):
            # Bake the index's full serving config into the export: the
            # VMEM-fit recipe (e.g. B=4096 needs query_tile=128 + bf16
            # corpus) must survive into the serialized kernel, not revert
            # to defaults. The kernel-vs-reference branch resolves at
            # export (trace) time from the TARGET platform (`platforms`),
            # not the exporting process's backend — a CPU process can
            # cross-lower the Pallas kernel for TPU serving.
            if corpus_dtype is not None:
                queries = queries.astype(corpus_dtype)
                candidates = candidates.astype(corpus_dtype)
            if not for_tpu:
                return scoring.bucketed_top_k_reference(
                    queries, candidates, k, buckets=buckets,
                    scales=scales, packed4=packed4, valid_rows=valid_rows,
                )
            return scoring.bucketed_top_k(
                queries, candidates, k, buckets=buckets, chunk=chunk,
                query_tile=query_tile, scales=scales, packed4=packed4,
                valid_rows=valid_rows,
            )

        return bucketed

    raise ValueError(
        f"export_index supports BruteForce and Bucketed indexes; got "
        f"{type(index).__name__}."
    )
