"""Exact inner-product k-nearest-neighbour search on device.

Replaces faiss.IndexFlatIP (KNN.py:67-73): queries x values inner products,
top-k per query. Used by the KNN cold-start model (content neighbours) and
by AGNN/FSGNN cosine-kNN graph construction.

On TPU the sweep routes through the fused Pallas retrieval kernel
(ops/pallas/retrieval.py) with no rated/candidate masks — the same
score+streaming-top-k program that serves eval (8-95x the XLA
matmul+top_k formulation, PERF.md). Off-TPU (and for tiny value sets or
huge k) it falls back to a blocked MXU matmul + ``jax.lax.top_k``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k",))
def _topk_chunk(q: jnp.ndarray, v: jnp.ndarray, k: int):
    from ..runtime.eval import _hierarchical_topk

    scores = q @ v.T
    # two-stage top-k: a flat 270k-wide sort hangs the remote compiler
    # (PERF.md eval-path lesson); exact with the same tie rule
    return _hierarchical_topk(scores, k)


def _knn_via_retrieval(
    q_all: np.ndarray, v_all: np.ndarray, k: int, interpret: bool = False
):
    """Unmasked kNN through the fused retrieval kernel. The contraction
    dim is zero-padded to a lane multiple (inner products unchanged); the
    'rated' reject list is a single pad-id column (rejects nothing)."""
    from .pallas.retrieval import LANES, retrieval_topk

    n_items, d = v_all.shape
    d_pad = ((d + LANES - 1) // LANES) * LANES
    if d_pad != d:
        q_all = np.pad(q_all, ((0, 0), (0, d_pad - d)))
        v_all = np.pad(v_all, ((0, 0), (0, d_pad - d)))
    rated = np.full((q_all.shape[0], 1), n_items, np.int32)
    excluded = np.zeros(n_items, dtype=bool)
    return retrieval_topk(
        q_all, v_all, rated, excluded, k, interpret=interpret
    )


def knn_inner_product(
    queries: np.ndarray, values: np.ndarray, k: int, chunk: int = 4096
):
    """Returns (scores (Q, k), indices (Q, k)) of the top-k values rows by
    inner product for each query row. Exact, like faiss IndexFlatIP."""
    from .pallas.retrieval import LANES, SLOTS

    q_all = np.asarray(queries, np.float32)
    v = np.asarray(values, np.float32)
    if (
        jax.devices()[0].platform == "tpu"
        and values.shape[0] >= 512
        and k + 1 <= SLOTS * LANES
        # the kernel's VMEM geometry targets embedding-width sweeps: its
        # (d, block) item window is double-buffered against the 16 MB
        # scoped budget, so wide-d content KNN (ML user 3469, BX 2312,
        # XING 2738 — one-time graph construction, not the eval hot path)
        # routes through the XLA chunked matmul + top_k below instead
        and values.shape[1] <= LANES
    ):
        # honour the chunk contract on the kernel path too: one unchunked
        # sweep over ~92k queries (AGNN/FSGNN graph construction at
        # book-crossing scale) holds ~755 MB of candidate planes at once
        out_s, out_i = [], []
        for start in range(0, q_all.shape[0], chunk):
            s, i = _knn_via_retrieval(q_all[start: start + chunk], v, k)
            out_s.append(s)
            out_i.append(i)
        return np.concatenate(out_s), np.concatenate(out_i)
    v = jnp.asarray(v)
    out_s, out_i = [], []
    for start in range(0, q_all.shape[0], chunk):
        s, i = _topk_chunk(jnp.asarray(q_all[start : start + chunk]), v, k)
        out_s.append(np.asarray(s))
        out_i.append(np.asarray(i))
    return np.concatenate(out_s), np.concatenate(out_i)


def knn_cosine(queries: np.ndarray, values: np.ndarray, k: int, chunk: int = 4096):
    """Top-k by cosine similarity (row-normalized inner product)."""
    qn = queries / np.maximum(
        np.linalg.norm(queries, axis=1, keepdims=True), 1e-12
    )
    vn = values / np.maximum(
        np.linalg.norm(values, axis=1, keepdims=True), 1e-12
    )
    return knn_inner_product(qn, vn, k, chunk)
