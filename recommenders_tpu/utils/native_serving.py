"""Drive the native PJRT serving host (`native/pjrt_host`) from Python.

The reference's serving round-trip is SavedModel → TF-Serving
(`tensorflow_recommenders/layers/factorized_top_k.py:623-628`, proven in
`layers/factorized_top_k_test.py:75-83`). Here the analog is:

  `utils.export.export_index` → (module.mlir + arrays.npz +
  compile_options.pb) → `pjrt_host PLUGIN.so run ...` → top-k results,
  asserted bit-equal to the Python query path.

This module owns the binary tensor container shared with the C++ host
(dtype code, rank, dims, raw bytes — see `native/pjrt_host.cc`), the
serialized-CompileOptions writer, and a subprocess driver that knows how
to invoke the host against the ambient axon TPU plugin (the tunneled
chip) with the same create options the JAX registration uses
(`/root/.axon_site/axon/register/pjrt.py` is the reference recipe; we
mint a fresh session_id per invocation exactly like every Python process
does via sitecustomize).
"""

from __future__ import annotations

import dataclasses
import os
import re
import subprocess
import uuid
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import ml_dtypes

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
HOST_BINARY = os.path.join(_REPO_ROOT, "native", "build", "pjrt_host")

AXON_PLUGIN = "/opt/axon/libaxon_pjrt.so"

# dtype codes shared with native/pjrt_host.cc.
_CODES: List[Tuple[np.dtype, int]] = [
    (np.dtype(np.float32), 0),
    (np.dtype(np.int32), 1),
    (np.dtype(np.int64), 2),
    (np.dtype(ml_dtypes.bfloat16), 3),
    (np.dtype(np.float16), 4),
    (np.dtype(np.uint32), 5),
    (np.dtype(np.bool_), 6),
    (np.dtype(np.int8), 7),
]
_TO_CODE = {dt: code for dt, code in _CODES}
_FROM_CODE = {code: dt for dt, code in _CODES}


def write_tensors(path: str, arrays: Sequence[np.ndarray]) -> None:
    """Writes arrays in the host's typed container format."""
    with open(path, "wb") as f:
        for a in arrays:
            a = np.ascontiguousarray(a)
            if a.dtype not in _TO_CODE:
                raise ValueError(
                    f"dtype {a.dtype} not supported by the native host"
                )
            f.write(np.int32(_TO_CODE[a.dtype]).tobytes())
            f.write(np.int32(a.ndim).tobytes())
            f.write(np.asarray(a.shape, np.int64).tobytes())
            f.write(a.tobytes())


def read_tensors(path: str) -> List[np.ndarray]:
    """Reads arrays from the host's typed container format."""
    out = []
    with open(path, "rb") as f:
        data = f.read()
    off = 0
    while off < len(data):
        code, rank = np.frombuffer(data, np.int32, 2, off)
        off += 8
        dims = np.frombuffer(data, np.int64, rank, off)
        off += 8 * rank
        dtype = _FROM_CODE[int(code)]
        n = int(np.prod(dims)) if rank else 1
        a = np.frombuffer(data, dtype, n, off).reshape(dims)
        off += n * dtype.itemsize
        out.append(a)
    return out


def write_compile_options(path: str) -> None:
    """Writes a default serialized xla CompileOptionsProto.

    PJRT_Client_Compile takes the serialized proto; jax builds the same
    default internally. An empty options string is rejected by some
    plugins, so the export ships a real one.
    """
    from jax._src.lib import xla_client

    with open(path, "wb") as f:
        f.write(xla_client.CompileOptions().SerializeAsString())


def axon_create_options(session_id: Optional[str] = None) -> List[str]:
    """The PJRT_Client_Create NamedValues for the ambient axon plugin.

    Mirrors `/root/.axon_site/axon/register/pjrt.py:_register_backend`
    under the environment's sitecustomize config (pool mode via loopback
    relay, remote compile, v5e 1x1x1, monoclient rank sentinel). Every
    Python process mints a fresh session_id the same way.
    """
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    opts = {
        "topology": f"{gen}:1x1x1",
        "n_slices": 1,
        "remote_compile": 1,
        "local_only": 0,
        "priority": 0,
        "rank": 0xFFFF_FFFF,
        "session_id": session_id or str(uuid.uuid4()),
    }
    flags = []
    for k, v in opts.items():
        flags += ["--opt", f"{k}={v}"]
    return flags


def axon_env() -> Dict[str, str]:
    """Env for the host process (what sitecustomize sets in-process)."""
    env = dict(os.environ)
    env.setdefault("AXON_POOL_SVC_OVERRIDE", "127.0.0.1")
    env.setdefault("AXON_LOOPBACK_RELAY", "1")
    env.setdefault("TPU_SKIP_MDS_QUERY", "1")
    env.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
    return env


def axon_available() -> bool:
    return os.path.exists(AXON_PLUGIN) and os.path.exists(HOST_BINARY)


@dataclasses.dataclass
class HostResult:
    outputs: List[np.ndarray]
    compile_ms: Optional[float]
    repeat_stats: Optional[Dict[str, float]]
    stdout: str
    pipeline_stats: Optional[Dict[str, float]] = None


def _parse_stats(
    stdout: str,
) -> Tuple[Optional[float], Optional[dict], Optional[dict]]:
    compile_ms = None
    m = re.search(r"compile_ms: ([0-9.]+)", stdout)
    if m:
        compile_ms = float(m.group(1))

    def _kv(tag: str) -> Optional[dict]:
        m = re.search(tag + r": (.*)", stdout)
        if not m:
            return None
        stats = {}
        for kv in m.group(1).split():
            k, v = kv.split("=")
            stats[k] = float(v)
        return stats

    return compile_ms, _kv("repeat_stats"), _kv("pipeline_stats")


def run_host(
    module_path: str,
    inputs: Sequence[np.ndarray],
    *,
    plugin: str = AXON_PLUGIN,
    create_options: Optional[List[str]] = None,
    compile_options_path: Optional[str] = None,
    repeat: int = 1,
    rotate: int = 1,
    pipeline: bool = False,
    workdir: Optional[str] = None,
    timeout: float = 600.0,
) -> HostResult:
    """Runs `pjrt_host run` on `inputs`; returns outputs + timing stats.

    With `rotate=R`, the first R entries of `inputs` are alternative
    values for argument 0 and iteration i uses variant i % R — this
    defeats the remote runtime's (program, input) result cache so
    `--repeat` times the chip, not the cache. With `pipeline=True`, all
    iterations dispatch back-to-back and only the last output is fenced
    (`pipeline_stats` instead of per-iteration `repeat_stats`) — the
    honest throughput mode on high-latency links.

    Raises `RuntimeError` with the host's stderr on failure.
    """
    if not os.path.exists(HOST_BINARY):
        raise RuntimeError(
            f"{HOST_BINARY} not built; run tools/build_native.sh"
        )
    workdir = workdir or os.path.dirname(os.path.abspath(module_path))
    in_bin = os.path.join(workdir, "host_in.bin")
    out_bin = os.path.join(workdir, "host_out.bin")
    write_tensors(in_bin, [np.asarray(a) for a in inputs])

    if create_options is None:
        create_options = axon_create_options()
    cmd = [HOST_BINARY, plugin, *create_options, "run", module_path,
           in_bin, out_bin]
    if compile_options_path is not None:
        cmd += ["--co", compile_options_path]
    if repeat > 1:
        cmd += ["--repeat", str(repeat)]
    if rotate > 1:
        cmd += ["--rotate", str(rotate)]
    if pipeline:
        cmd += ["--pipeline"]
    proc = subprocess.run(
        cmd, capture_output=True, text=True, env=axon_env(),
        timeout=timeout,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"pjrt_host failed (exit {proc.returncode}):\n"
            f"stdout: {proc.stdout}\nstderr: {proc.stderr}"
        )
    compile_ms, stats, pipe_stats = _parse_stats(proc.stdout)
    return HostResult(
        outputs=read_tensors(out_bin),
        compile_ms=compile_ms,
        repeat_stats=stats,
        stdout=proc.stdout,
        pipeline_stats=pipe_stats,
    )


def serve_exported_index(
    export_dir: str,
    queries: np.ndarray,
    *,
    repeat: int = 1,
    **kwargs,
) -> HostResult:
    """Serves queries through an `export_index` artifact via the C++ host.

    Assembles the argument list exactly as `utils.export.load_index`
    does (queries first, then the npz arrays in export order), so the
    host executes the same computation the Python path would.

    `queries` of rank (R, B, d) are treated as R rotating batch
    variants (host `--rotate R`): iteration i of `repeat` executes
    variant i % R, which defeats the remote result cache when timing.
    Outputs are the final iteration's.
    """
    from recommenders_tpu.utils import export as export_lib

    # _load_arrays (not raw np.load): bf16 arrays persist as uint16
    # views + a key manifest, and the host protocol has a real BF16
    # code — feeding the raw view would bind a U16 operand against a
    # bf16 module input.
    data = export_lib._load_arrays(export_dir)
    if "centroids" in data:  # ScaNN artifact.
        # Presence-filtered in _export_scann's exact argument order —
        # including the bucketed path's flat_ids and the reorder pass's
        # corpus arrays: a missing operand binds the module's trailing
        # inputs to garbage and faults the device.
        names = [n for n in ("centroids", "leaf_embs", "leaf_scales",
                             "leaf_ids", "leaf_rows", "leaf_valid",
                             "flat_ids", "corpus", "corpus_identifiers")
                 if n in data]
        args = [data[n] for n in names]
    else:
        args = [data["candidates"], data["identifiers"]]
        if "scales" in data:  # Quantized Bucketed artifact.
            args.append(data["scales"])
        if "valid" in data:
            args.append(data["valid"])
    module = os.path.join(export_dir, "module.mlir")
    co = os.path.join(export_dir, "compile_options.pb")
    queries = np.asarray(queries)
    if queries.ndim == 3:  # (R, B, d): rotating batch variants.
        query_args = list(queries)
        rotate = len(query_args)
    else:
        query_args = [queries]
        rotate = 1
    # jax.export drops unused arguments from the module signature;
    # filter to the recorded kept indices (position 0 is the query
    # batch) or the host would bind operands off by one.
    kept_path = os.path.join(export_dir, "kept_args.json")
    if os.path.exists(kept_path):
        import json

        with open(kept_path) as f:
            kept = set(json.load(f))
        args = [a for i, a in enumerate(args, start=1) if i in kept]
    return run_host(
        module,
        [*query_args, *args],
        compile_options_path=co if os.path.exists(co) else None,
        repeat=repeat,
        rotate=rotate,
        **kwargs,
    )
