"""ctypes binding for the native IO runtime (native/n2nmn_io.cc).

Auto-builds the shared library with `make` on first use if the toolchain
is available; every entry point has a pure-numpy fallback so the framework
works without the native library (it's a throughput optimization for the
29 GB / 307 GB feature stores, not a correctness dependency)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libn2nmn_io.so")

_lib = None
_lib_lock = threading.Lock()
_build_attempted = False


def _load_library():
    global _lib, _build_attempted
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build_attempted:
            _build_attempted = True
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR],
                               capture_output=True, timeout=120)
            except Exception:
                pass
        if not os.path.exists(_LIB_PATH):
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.n2nmn_open_store.restype = ctypes.c_void_p
        lib.n2nmn_open_store.argtypes = [ctypes.c_char_p]
        lib.n2nmn_store_rows.restype = ctypes.c_int64
        lib.n2nmn_store_rows.argtypes = [ctypes.c_void_p]
        lib.n2nmn_store_row_floats.restype = ctypes.c_int64
        lib.n2nmn_store_row_floats.argtypes = [ctypes.c_void_p]
        lib.n2nmn_close_store.argtypes = [ctypes.c_void_p]
        lib.n2nmn_gather.restype = ctypes.c_int
        lib.n2nmn_gather.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.n2nmn_load_npy_batch.restype = ctypes.c_int
        lib.n2nmn_load_npy_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return _load_library() is not None


class PackedStore:
    """Memory-mapped packed feature store with native parallel gather."""

    def __init__(self, path, num_threads=8):
        self.num_threads = num_threads
        self._lib = _load_library()
        self._handle = None
        if self._lib is not None:
            self._handle = self._lib.n2nmn_open_store(
                path.encode("utf-8"))
            self._handle = ctypes.c_void_p(self._handle) \
                if self._handle else None
        if self._handle:
            self.rows = self._lib.n2nmn_store_rows(self._handle)
            self.row_floats = self._lib.n2nmn_store_row_floats(self._handle)
            self._mmap = None
        else:
            self._mmap = np.load(path, mmap_mode="r")
            self.rows = self._mmap.shape[0]
            self.row_floats = int(np.prod(self._mmap.shape[1:]))
        self.path = path

    @property
    def native(self):
        return self._handle is not None

    def gather(self, indices, out=None):
        """indices [n] -> float32 array [n, row_floats]."""
        indices = np.ascontiguousarray(indices, np.int64)
        n = len(indices)
        if out is None:
            out = np.empty((n, self.row_floats), np.float32)
        if self._handle:
            rc = self._lib.n2nmn_gather(
                self._handle,
                indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self.num_threads)
            if rc != 0:
                raise IndexError(f"native gather failed (rc={rc})")
        else:
            flat = self._mmap.reshape(self.rows, -1)
            out[:] = flat[indices]
        return out

    def close(self):
        if self._handle:
            self._lib.n2nmn_close_store(self._handle)
            self._handle = None


def load_npy_batch(paths, floats_per_file, out=None, num_threads=8):
    """Parallel load of per-image .npy files -> [n, floats_per_file]."""
    n = len(paths)
    if out is None:
        out = np.empty((n, floats_per_file), np.float32)
    lib = _load_library()
    if lib is not None:
        arr = (ctypes.c_char_p * n)(
            *[p.encode("utf-8") for p in paths])
        rc = lib.n2nmn_load_npy_batch(
            arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            floats_per_file, num_threads)
        if rc == 0:
            return out
        # fall through to numpy on unexpected format
    for i, p in enumerate(paths):
        feats = np.load(p)
        out[i] = feats.reshape(-1)
    return out
