"""Native grid IO: fast binary save/load of field arrays.

The C++ backend (``_native/gridio.cpp``) is compiled at first use with the
system toolchain into the persistent cache and bound via ctypes -- the same
runtime-build pattern the reference uses for its generated extensions
(reference: src/gt4py/cartesian/backend/pyext_builder.py:190, incl. the
inter-process build lock), except the native code here is first-party.
Falls back to a pure-numpy implementation when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

from gt4py_tpu import config

_DTYPE_CODES = {
    np.dtype(np.float32): ord("f"),
    np.dtype(np.float64): ord("d"),
    np.dtype(np.int32): ord("i"),
    np.dtype(np.int64): ord("q"),
}
_CODE_DTYPES = {v: k for k, v in _DTYPE_CODES.items()}

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _source_path() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "_native", "gridio.cpp")


def _build_native() -> Optional[ctypes.CDLL]:
    """Compile gridio.cpp into the cache dir (once per source hash)."""
    import hashlib

    src = _source_path()
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    out_dir = os.path.join(config.CACHE_ROOT, "native")
    os.makedirs(out_dir, exist_ok=True)
    so_path = os.path.join(out_dir, f"gridio_{digest}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC",
            "-std=c++17", "-pthread", src, "-o", tmp,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(tmp, so_path)  # atomic: concurrent builders race safely
        except (subprocess.SubprocessError, OSError):
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.gridio_write.restype = ctypes.c_int
    lib.gridio_write.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_uint32,
        ctypes.c_uint32, ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.gridio_probe.restype = ctypes.c_int
    lib.gridio_probe.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.gridio_read.restype = ctypes.c_int
    lib.gridio_read.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_uint64]
    return lib


def _native() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lib_lock:
        if _lib is None and not _build_failed:
            _lib = _build_native()
            if _lib is None:
                _build_failed = True
    return _lib


def save_grid(path: str, array) -> str:
    """Write an array as a native grid record (numpy fallback: .npy-like)."""
    arr = np.ascontiguousarray(np.asarray(array))
    if arr.dtype not in _DTYPE_CODES:
        raise TypeError(f"Unsupported dtype {arr.dtype} for grid IO")
    lib = _native()
    if lib is None:
        fallback = _fallback_path(path)
        np.save(fallback, arr)
        return fallback
    dims = (ctypes.c_uint64 * arr.ndim)(*arr.shape)
    rc = lib.gridio_write(
        path.encode(), arr.ctypes.data_as(ctypes.c_void_p),
        _DTYPE_CODES[arr.dtype], arr.ndim, dims,
    )
    if rc != 0:
        raise OSError(f"gridio_write failed with code {rc} for {path}")
    return path


def _fallback_path(path: str) -> str:
    # np.save appends '.npy' unless the name already ends with it
    return path + ".fallback.npy"


def probe_grid(path: str) -> Tuple[np.dtype, Tuple[int, ...]]:
    lib = _native()
    if lib is None:
        arr = np.load(_fallback_path(path), mmap_mode="r")
        return arr.dtype, arr.shape
    dtype = ctypes.c_uint32()
    ndim = ctypes.c_uint32()
    dims = (ctypes.c_uint64 * 8)()
    rc = lib.gridio_probe(path.encode(), ctypes.byref(dtype),
                          ctypes.byref(ndim), dims)
    if rc != 0:
        raise OSError(f"gridio_probe failed with code {rc} for {path}")
    return _CODE_DTYPES[dtype.value], tuple(int(dims[i]) for i in range(ndim.value))


def load_grid(path: str) -> np.ndarray:
    """Read a native grid record (mmap + multithreaded copy)."""
    lib = _native()
    if lib is None:
        return np.load(_fallback_path(path))
    dtype, shape = probe_grid(path)
    out = np.empty(shape, dtype=dtype)
    rc = lib.gridio_read(path.encode(), out.ctypes.data_as(ctypes.c_void_p),
                         out.nbytes)
    if rc != 0:
        raise OSError(f"gridio_read failed with code {rc} for {path}")
    return out
