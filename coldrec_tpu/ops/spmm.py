"""Sparse matrix-times-dense (SpMM) for graph propagation on TPU.

Replaces the reference's ``torch.sparse.mm`` COO SpMM (cuSPARSE) used by the
LightGCN family (LightGCN.py:90, NGCF.py:95, SimGCL.py:105, ...).

Design: the adjacency lives as flat row/col/val arrays sorted by row
(:class:`coldrec_tpu.data.builder.SparseGraphHost`). A propagation layer is
``gather rows of E by col -> scale by val -> segment_sum into rows`` —
all static shapes, compiled by XLA to fused gather + sorted scatter-add.
For the sharded multi-chip path see :mod:`coldrec_tpu.parallel.spmm_shard`.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class SparseGraph(NamedTuple):
    """Device-resident COO graph, rows sorted ascending."""

    rows: jnp.ndarray  # (nnz,) int32
    cols: jnp.ndarray  # (nnz,) int32
    vals: jnp.ndarray  # (nnz,) float32
    n_rows: int  # static

    @classmethod
    def from_host(cls, host) -> "SparseGraph":
        return cls(
            rows=jnp.asarray(host.rows),
            cols=jnp.asarray(host.cols),
            vals=jnp.asarray(host.vals),
            n_rows=int(host.shape[0]),
        )

    @classmethod
    def from_scipy(cls, mat) -> "SparseGraph":
        from coldrec_tpu.data.builder import SparseGraphHost

        return cls.from_host(SparseGraphHost.from_scipy(mat))


def spmm(graph: SparseGraph, x: jnp.ndarray) -> jnp.ndarray:
    """A @ x for COO A with row-sorted indices. x: (n_cols, d)."""
    gathered = x[graph.cols] * graph.vals[:, None]
    return jax.ops.segment_sum(
        gathered,
        graph.rows,
        num_segments=graph.n_rows,
        indices_are_sorted=True,
    )


def spmm_ref(host, x: np.ndarray) -> np.ndarray:
    """scipy oracle for tests."""
    import scipy.sparse as sp

    mat = sp.coo_matrix((host.vals, (host.rows, host.cols)), shape=host.shape)
    return np.asarray(mat @ x)
