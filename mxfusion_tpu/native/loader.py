"""ctypes loader for the native batcher (lazy compile, numpy fallback).

The shared library is built on first use with the system C++ compiler;
any failure (no compiler, sandboxed filesystem) silently falls back to
numpy fancy-indexing, so the framework never hard-depends on the native
path.
"""
import ctypes
import os
import subprocess
import tempfile
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "fast_batcher.cpp")


def _build_and_load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        try:
            cache_dir = os.path.join(
                tempfile.gettempdir(),
                "mxfusion_tpu_native_{}".format(os.getuid()))
            os.makedirs(cache_dir, exist_ok=True)
            lib_path = os.path.join(cache_dir, "libfastbatcher.so")
            if not os.path.exists(lib_path) or \
                    os.path.getmtime(lib_path) < os.path.getmtime(_SRC):
                tmp = lib_path + ".build"
                subprocess.run(
                    ["c++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", tmp, _SRC, "-lpthread"],
                    check=True, capture_output=True, timeout=120)
                os.replace(tmp, lib_path)
            lib = ctypes.CDLL(lib_path)
            lib.gather_rows.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int]
            lib.shuffled_indices.argtypes = [
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.c_uint64]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def native_available():
    return _build_and_load() is not None


def gather_rows(src, idx, out=None, n_threads=8):
    """``out[i] = src[idx[i]]`` over axis 0 (native when available)."""
    src = np.ascontiguousarray(src)
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    # bounds check up front: the native path is a raw memcpy loop, and
    # must fail the same way the numpy fallback does (IndexError)
    if idx.size and (idx.min() < 0 or idx.max() >= src.shape[0]):
        raise IndexError(
            "gather_rows: index out of range for axis 0 with size {}"
            .format(src.shape[0]))
    n = idx.shape[0]
    if out is None:
        out = np.empty((n,) + src.shape[1:], dtype=src.dtype)
    lib = _build_and_load()
    if lib is None:
        out[...] = src[idx]
        return out
    row_bytes = src.dtype.itemsize * int(np.prod(src.shape[1:], dtype=np.int64))
    lib.gather_rows(
        src.ctypes.data_as(ctypes.c_void_p),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(n), ctypes.c_int64(row_bytes),
        ctypes.c_int(n_threads))
    return out


def shuffled_indices(n, seed):
    """Fisher–Yates permutation of [0, n) (native when available)."""
    lib = _build_and_load()
    if lib is None:
        return np.random.default_rng(seed).permutation(n)
    idx = np.empty(n, dtype=np.int64)
    lib.shuffled_indices(
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(n), ctypes.c_uint64(seed))
    return idx
