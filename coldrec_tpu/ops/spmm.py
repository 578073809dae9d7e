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

import functools
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


def spmm(graph, x: jnp.ndarray) -> jnp.ndarray:
    """A @ x. Dispatches on representation: a callable (make_sym_spmm
    closure), an EllGraph, or a row-sorted COO SparseGraph."""
    if callable(graph):
        return graph(x)
    if isinstance(graph, EllGraph):
        return _ell_apply(graph, x)
    gathered = x[graph.cols] * graph.vals[:, None]
    return jax.ops.segment_sum(
        gathered,
        graph.rows,
        num_segments=graph.n_rows,
        indices_are_sorted=True,
    )


class EllGraph(NamedTuple):
    """Hybrid ELL + COO-tail layout for symmetric propagation matrices.

    Rows are padded to a fixed width K (95th-percentile degree by default):
    the ELL part computes A@X as a regular gather + weighted sum over K —
    no scatter. Overflow edges (heavy rows) go through the sorted-COO tail.
    On TPU this is ~1.7x faster than pure segment_sum for LightGCN-family
    adjacencies (scatter-add is the bottleneck; see PERF.md).
    """

    ell_cols: jnp.ndarray  # (N, K) int32, pad col = 0
    ell_vals: jnp.ndarray  # (N, K) float32, pad val = 0
    tail_rows: jnp.ndarray  # (T,) int32, sorted
    tail_cols: jnp.ndarray
    tail_vals: jnp.ndarray
    n_rows: int


def build_ell(host, k_percentile: float = 95.0) -> EllGraph:
    """Partition a row-sorted host COO graph into ELL + tail."""
    n = int(host.shape[0])
    deg = np.bincount(host.rows, minlength=n)
    k = int(np.percentile(deg, k_percentile)) if deg.size else 1
    k = max(8, ((k + 7) // 8) * 8)
    ell_cols = np.zeros((n, k), np.int32)
    ell_vals = np.zeros((n, k), np.float32)
    within = np.concatenate([np.arange(c) for c in deg]) if deg.sum() else np.zeros(0, np.int64)
    in_ell = within < k
    r_ell = host.rows[in_ell]
    ell_cols[r_ell, within[in_ell]] = host.cols[in_ell]
    ell_vals[r_ell, within[in_ell]] = host.vals[in_ell]
    tail = ~in_ell
    return EllGraph(
        ell_cols=jnp.asarray(ell_cols),
        ell_vals=jnp.asarray(ell_vals),
        tail_rows=jnp.asarray(host.rows[tail]),
        tail_cols=jnp.asarray(host.cols[tail]),
        tail_vals=jnp.asarray(host.vals[tail]),
        n_rows=n,
    )


def _ell_apply(graph: EllGraph, x: jnp.ndarray) -> jnp.ndarray:
    gathered = x[graph.ell_cols]  # (N, K, d)
    out = jnp.einsum("nk,nkd->nd", graph.ell_vals, gathered)
    if graph.tail_rows.shape[0]:
        out = out + jax.ops.segment_sum(
            x[graph.tail_cols] * graph.tail_vals[:, None],
            graph.tail_rows,
            num_segments=graph.n_rows,
            indices_are_sorted=True,
        )
    return out


def make_sym_spmm(host_or_ell):
    """f(x) = A @ x for SYMMETRIC A with a custom VJP that reuses the
    forward (A = A^T -> dX = A @ g), avoiding autodiff's scatter-add of the
    gather. The closure captures the graph as constants (not differentiated).
    """
    graph = (
        host_or_ell
        if isinstance(host_or_ell, EllGraph)
        else build_ell(host_or_ell)
    )

    @jax.custom_vjp
    def f(x):
        return _ell_apply(graph, x)

    def fwd(x):
        return _ell_apply(graph, x), None

    def bwd(_, g):
        return (_ell_apply(graph, g),)

    f.defvjp(fwd, bwd)
    return f


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def sym_spmm_arrays(
    n_rows: int, ell_cols, ell_vals, tail_rows, tail_cols, tail_vals, x
):
    """A @ x for SYMMETRIC A with the graph passed as jit ARGUMENTS.

    Same math and custom VJP as :func:`make_sym_spmm`, but nothing is
    closure-captured: a captured device array lowers to an HLO constant
    embedded in the compile request, and a model holding several
    book-crossing-scale graphs (FSGNN: ~300 MB across 4 adjacencies)
    overflows the remote compiler's request body (HTTP 413). Thread the
    five arrays through the jitted function's inputs (e.g. on the batch
    dict) and pass ``n_rows`` statically.
    """
    g = EllGraph(ell_cols, ell_vals, tail_rows, tail_cols, tail_vals, n_rows)
    return _ell_apply(g, x)


def _ssa_fwd(n_rows, c, v, tr, tc, tv, x):
    return sym_spmm_arrays(n_rows, c, v, tr, tc, tv, x), (c, v, tr, tc, tv)


def _ssa_bwd(n_rows, res, g):
    c, v, tr, tc, tv = res

    def zero(a):
        if jnp.issubdtype(a.dtype, jnp.integer):
            return np.zeros(a.shape, jax.dtypes.float0)
        return jnp.zeros_like(a)

    gx = _ell_apply(EllGraph(c, v, tr, tc, tv, n_rows), g)
    return (zero(c), zero(v), zero(tr), zero(tc), zero(tv), gx)


sym_spmm_arrays.defvjp(_ssa_fwd, _ssa_bwd)


def ell_arrays(graph: EllGraph):
    """The five array leaves of an EllGraph (bus form for sym_spmm_arrays)."""
    return (
        graph.ell_cols, graph.ell_vals,
        graph.tail_rows, graph.tail_cols, graph.tail_vals,
    )


def spmm_ref(host, x: np.ndarray) -> np.ndarray:
    """scipy oracle for tests."""
    import scipy.sparse as sp

    mat = sp.coo_matrix((host.vals, (host.rows, host.cols)), shape=host.shape)
    return np.asarray(mat @ x)
