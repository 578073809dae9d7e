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

    # ALWAYS run make first: the Makefile's source dependency rebuilds a
    # stale .so from an older revision (cheap no-op when up to date). A
    # stale handle cannot be swapped in-process — glibc dlopen caches by
    # pathname — so rebuilding before the first CDLL is the only safe
    # point. flock serializes concurrent process startups so no process
    # dlopens a half-written .so (make truncates in place).
    try:
        import fcntl

        with open(os.path.join(_NATIVE_DIR, ".build.lock"), "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            try:
                subprocess.run(
                    ["make", "-s", "-C", _NATIVE_DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            finally:
                fcntl.flock(lk, fcntl.LOCK_UN)
    except Exception:
        pass  # fall through: an existing current .so may still load
    if not os.path.exists(_SO_PATH):
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    if not hasattr(lib, "ppr_push_topk"):
        # stale build survived (make failed): degrade to the numpy
        # fallbacks rather than raising on argtypes below
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
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.ppr_push_topk.argtypes = [
        ctypes.c_int64, ctypes.c_int64, i64p, i32p, i64p, i32p,
        ctypes.c_double, ctypes.c_double, ctypes.c_int32, i32p, f32p,
    ]
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


def ppr_push_topk_native(
    indptr: np.ndarray,  # (n+1,) graph CSR (users then items, self-loops)
    indices: np.ndarray,  # (nnz,)
    nu: int,
    obs_indptr: np.ndarray,  # (nu+1,) per-user observed items CSR
    obs_items: np.ndarray,  # sorted item LOCAL ids per user
    alpha: float,
    eps: float,
    topk: int,
):
    """Forward-push approximate PPR + per-user unobserved-item top-k
    (threaded C++). Returns (items (nu, topk) int32 pad -1,
    scores (nu, topk) f32) or None when the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = indptr.shape[0] - 1
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    obs_indptr = np.ascontiguousarray(obs_indptr, np.int64)
    obs_items = np.ascontiguousarray(obs_items, np.int32)
    out_items = np.empty((nu, topk), np.int32)
    out_vals = np.empty((nu, topk), np.float32)
    i32 = ctypes.POINTER(ctypes.c_int32)
    f32 = ctypes.POINTER(ctypes.c_float)
    lib.ppr_push_topk(
        n, nu, _ptr(indptr), indices.ctypes.data_as(i32),
        _ptr(obs_indptr), obs_items.ctypes.data_as(i32),
        ctypes.c_double(alpha), ctypes.c_double(eps),
        ctypes.c_int32(topk),
        out_items.ctypes.data_as(i32), out_vals.ctypes.data_as(f32),
    )
    return out_items, out_vals


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
