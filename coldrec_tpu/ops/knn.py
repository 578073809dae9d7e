"""Exact inner-product k-nearest-neighbour search on device.

Replaces faiss.IndexFlatIP (KNN.py:67-73): queries x values inner products
via a blocked MXU matmul + ``jax.lax.top_k``. Used by the KNN cold-start
model (content neighbours) and by AGNN/FSGNN cosine-kNN graph construction.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k",))
def _topk_chunk(q: jnp.ndarray, v: jnp.ndarray, k: int):
    scores = q @ v.T
    return jax.lax.top_k(scores, k)


def knn_inner_product(
    queries: np.ndarray, values: np.ndarray, k: int, chunk: int = 4096
):
    """Returns (scores (Q, k), indices (Q, k)) of the top-k values rows by
    inner product for each query row. Exact, like faiss IndexFlatIP."""
    v = jnp.asarray(values, jnp.float32)
    out_s, out_i = [], []
    q_all = np.asarray(queries, np.float32)
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
