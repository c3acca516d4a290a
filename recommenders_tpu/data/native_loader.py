"""ctypes bindings for the native (C++) input pipeline.

`NativeBatcher` plays the role tf.data's C++ runtime plays for the
reference (SURVEY.md §2.2): shuffled batch assembly and prefetch run in
C++ worker threads off the GIL, overlapping input preparation with the
training step. Falls back transparently to the pure-Python `data.batched`
iterator when the shared library can't be built (`native_available()`).

Measured regime notes: on small in-memory datasets numpy fancy indexing
is already fast and the Python batcher wins on per-batch overhead; at
scale (1M rows × 256 B/row) the native gather is ~1.6× faster
(2.15 GB/s vs 1.32 GB/s here) and the prefetch queue hides input prep
behind the training step. Row gathers are memory-bound, so more than
~2 producer threads adds contention rather than throughput.

The shared library is compiled on first use from `native/loader.cc` with
g++ and cached next to the source; no pybind11 (ctypes only).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Iterator, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_REPO_ROOT, "native", "loader.cc")
_SO = os.path.join(_REPO_ROOT, "native", "build", "libloader.so")

_lib = None
_lib_lock = threading.Lock()
_build_error: Optional[str] = None


def _load_library():
    """Builds (if needed) and loads the shared library; None on failure."""
    global _lib, _build_error
    with _lib_lock:
        if _lib is not None or _build_error is not None:
            return _lib
        try:
            if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
            ):
                os.makedirs(os.path.dirname(_SO), exist_ok=True)
                subprocess.run(
                    [
                        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                        "-pthread", _SRC, "-o", _SO,
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.loader_create.restype = ctypes.c_void_p
            lib.loader_create.argtypes = [
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
                ctypes.c_int, ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
            ]
            lib.loader_add_column.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ]
            lib.loader_start.argtypes = [ctypes.c_void_p]
            lib.loader_next.restype = ctypes.c_int64
            lib.loader_next.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p),
            ]
            lib.loader_reset.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
            lib.loader_destroy.argtypes = [ctypes.c_void_p]
            _lib = lib
        except (OSError, subprocess.CalledProcessError) as e:  # pragma: no cover
            _build_error = str(e)
            _lib = None
        return _lib


def native_available() -> bool:
    return _load_library() is not None


class NativeBatcher:
    """Threaded native batcher over a dict of row-aligned numpy arrays.

    Usage (same contract as `data.batched`: a zero-arg factory yielding
    dict batches, re-iterable per epoch):

    ```python
    batcher = NativeBatcher(train.as_dict(), batch_size=4096,
                            shuffle=True, seed=1)
    for batch in batcher():   # epoch 1
        ...
    for batch in batcher():   # epoch 2 (fresh shuffle)
        ...
    ```

    Attributes:
      data: Feature dict; all arrays share the leading row count. The
        arrays must stay alive for the batcher's lifetime (held here).
      batch_size: Rows per batch.
      shuffle: Shuffle rows each epoch.
      seed: Base shuffle seed (epoch index is mixed in).
      drop_remainder: Drop the ragged final batch.
      num_threads: C++ producer threads.
      queue_capacity: Prefetch depth (batches).
    """

    def __init__(
        self,
        data: Dict[str, np.ndarray],
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_remainder: bool = False,
        num_threads: int = 2,
        queue_capacity: int = 8,
    ) -> None:
        lib = _load_library()
        if lib is None:
            raise RuntimeError(
                f"native loader unavailable: {_build_error}"
            )
        self._lib = lib
        # C-contiguous copies; the loader keeps raw pointers into these.
        self._data = {
            k: np.ascontiguousarray(v) for k, v in data.items()
        }
        self._names = list(self._data.keys())
        rows = {v.shape[0] for v in self._data.values()}
        if len(rows) != 1:
            raise ValueError(
                f"All features must share the leading dimension; got "
                f"{ {k: v.shape for k, v in self._data.items()} }."
            )
        self._num_rows = rows.pop()
        self._batch_size = batch_size
        self._epoch = 0

        self._handle = lib.loader_create(
            self._num_rows, batch_size, int(drop_remainder), int(shuffle),
            seed, num_threads, queue_capacity,
        )
        for name in self._names:
            arr = self._data[name]
            bytes_per_row = arr.dtype.itemsize * int(
                np.prod(arr.shape[1:], dtype=np.int64)
            )
            lib.loader_add_column(
                self._handle,
                arr.ctypes.data_as(ctypes.c_void_p),
                bytes_per_row,
            )

    def __call__(self) -> Iterator[Dict[str, np.ndarray]]:
        lib = self._lib
        lib.loader_reset(self._handle, self._epoch)
        self._epoch += 1
        lib.loader_start(self._handle)
        n_cols = len(self._names)
        ptrs = (ctypes.c_void_p * n_cols)()
        while True:
            rows = lib.loader_next(self._handle, ptrs)
            if rows == 0:
                return
            batch = {}
            for c, name in enumerate(self._names):
                arr = self._data[name]
                shape = (rows,) + arr.shape[1:]
                count = int(np.prod(shape, dtype=np.int64))
                # Copy out: the loader reuses its buffer on the next call.
                flat = np.ctypeslib.as_array(
                    ctypes.cast(
                        ptrs[c],
                        ctypes.POINTER(
                            np.ctypeslib.as_ctypes_type(arr.dtype)
                        ),
                    ),
                    shape=(count,),
                )
                batch[name] = flat.reshape(shape).copy()
            yield batch

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle and getattr(self, "_lib", None):
            self._lib.loader_destroy(handle)
            self._handle = None


def batched_native_or_python(
    data: Dict[str, np.ndarray],
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    drop_remainder: bool = True,
):
    """NativeBatcher when the toolchain is available, else `data.batched`."""
    if native_available():
        return NativeBatcher(
            data, batch_size, shuffle=shuffle, seed=seed,
            drop_remainder=drop_remainder,
        )
    from recommenders_tpu.data import movielens

    return movielens.batched(
        data, batch_size, shuffle=shuffle, seed=seed,
        drop_remainder=drop_remainder,
    )
