"""ctypes bindings for the native fastgraph kernels.

Compiles ``native/fastgraph.cpp`` with g++ on first use (cached under
``native/build/``) and exposes numpy-friendly wrappers. Every function has
a pure-NumPy fallback, so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "fastgraph.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libfastgraph.so")

_lib = None
_tried = False


def _compile() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _LIB_PATH, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SRC):
        return None
    if not os.path.exists(_LIB_PATH) or \
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
        if not _compile():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    c_i32p = ctypes.POINTER(ctypes.c_int32)
    c_i64p = ctypes.POINTER(ctypes.c_int64)
    lib.fg_count_edges.argtypes = [ctypes.c_char_p]
    lib.fg_count_edges.restype = ctypes.c_int64
    lib.fg_parse_edge_file.argtypes = [ctypes.c_char_p, c_i32p, c_i32p,
                                       c_i64p, ctypes.c_int64]
    lib.fg_parse_edge_file.restype = ctypes.c_int64
    lib.fg_negative_sample.argtypes = [c_i32p, ctypes.c_int64, c_i64p,
                                       ctypes.c_int64, ctypes.c_int64,
                                       ctypes.c_uint64, ctypes.c_int32,
                                       c_i32p]
    lib.fg_negative_sample.restype = ctypes.c_int32
    lib.fg_build_csr.argtypes = [c_i32p, c_i32p, ctypes.c_int64,
                                 ctypes.c_int64, c_i64p, c_i32p]
    lib.fg_build_csr.restype = ctypes.c_int32
    lib.fg_degree_count.argtypes = [c_i32p, ctypes.c_int64, c_i64p,
                                    ctypes.c_int64]
    lib.fg_degree_count.restype = ctypes.c_int32
    _lib = lib
    return _lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def native_available() -> bool:
    return get_lib() is not None


def parse_edge_file_native(path: str):
    """Parse a tab-separated edge file -> (users, items, times) arrays.

    Returns None if the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    n = lib.fg_count_edges(path.encode())
    if n < 0:
        raise FileNotFoundError(path)
    users = np.empty(n, np.int32)
    items = np.empty(n, np.int32)
    times = np.empty(n, np.int64)
    got = lib.fg_parse_edge_file(path.encode(), _ptr(users, ctypes.c_int32),
                                 _ptr(items, ctypes.c_int32),
                                 _ptr(times, ctypes.c_int64), n)
    assert got == n, (got, n)
    return users, items, times


def negative_sample_native(users: np.ndarray, hist_keys: np.ndarray,
                           num_items: int, seed: int,
                           n_negs: int = 1):
    """Rejection-sample negatives in C++ (None if unavailable)."""
    lib = get_lib()
    if lib is None:
        return None
    users = np.ascontiguousarray(users, np.int32)
    hist_keys = np.ascontiguousarray(hist_keys, np.int64)
    out = np.empty((len(users), n_negs), np.int32)
    rc = lib.fg_negative_sample(
        _ptr(users, ctypes.c_int32), len(users),
        _ptr(hist_keys, ctypes.c_int64), len(hist_keys),
        num_items, np.uint64(seed), n_negs, _ptr(out, ctypes.c_int32))
    assert rc == 0
    return out


def build_csr_native(src: np.ndarray, dst: np.ndarray, num_nodes: int):
    """Counting-sort CSR assembly (None if unavailable)."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    indptr = np.empty(num_nodes + 1, np.int64)
    indices = np.empty(len(src), np.int32)
    rc = lib.fg_build_csr(_ptr(src, ctypes.c_int32),
                          _ptr(dst, ctypes.c_int32), len(src), num_nodes,
                          _ptr(indptr, ctypes.c_int64),
                          _ptr(indices, ctypes.c_int32))
    assert rc == 0
    return indptr, indices
