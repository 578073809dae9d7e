"""ctypes bindings for the C++ data plane (native/coldrec_native.cpp).

Auto-builds ``libcoldrec_native.so`` via make on first use (g++ is baked into
the image); every entry point has a numpy fallback so the framework runs
without a toolchain. The native path accelerates the host-side feeding hot
loops: CSV parsing and per-batch negative rejection sampling.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libcoldrec_native.so")

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(
                ["make", "-s", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.sample_negatives.argtypes = [
        i64p, i64p, i64p, ctypes.c_int64, ctypes.c_int64,
        i64p, ctypes.c_int64, ctypes.c_uint64, i64p,
    ]
    lib.permutation.argtypes = [ctypes.c_int64, ctypes.c_uint64, i64p]
    lib.count_csv_rows.argtypes = [ctypes.c_char_p]
    lib.count_csv_rows.restype = ctypes.c_int64
    lib.parse_interactions.argtypes = [ctypes.c_char_p, i64p, ctypes.c_int64]
    lib.parse_interactions.restype = ctypes.c_int64
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def sample_negatives_native(
    indptr: np.ndarray,
    items_sorted: np.ndarray,
    users: np.ndarray,
    n_candidates: int,
    seed: int,
    pool: Optional[np.ndarray] = None,
) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    users = np.ascontiguousarray(users, np.int64)
    indptr = np.ascontiguousarray(indptr, np.int64)
    items_sorted = np.ascontiguousarray(items_sorted, np.int64)
    out = np.empty(users.shape[0], np.int64)
    if pool is not None:
        pool = np.ascontiguousarray(pool, np.int64)
        pool_ptr, pool_n = _ptr(pool), pool.shape[0]
    else:
        pool_ptr, pool_n = _ptr(out), 0  # unused
    lib.sample_negatives(
        _ptr(indptr), _ptr(items_sorted), _ptr(users),
        users.shape[0], n_candidates, pool_ptr, pool_n,
        ctypes.c_uint64(seed & 0xFFFFFFFFFFFFFFFF), _ptr(out),
    )
    return out


def permutation_native(n: int, seed: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    out = np.empty(n, np.int64)
    lib.permutation(n, ctypes.c_uint64(seed & 0xFFFFFFFFFFFFFFFF), _ptr(out))
    return out


def parse_interactions_native(path: str) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    n = lib.count_csv_rows(path.encode())
    if n < 0:
        return None
    out = np.zeros((max(n, 1), 2), np.int64)
    got = lib.parse_interactions(path.encode(), _ptr(out), n)
    if got < 0:
        return None
    return out[:got]
