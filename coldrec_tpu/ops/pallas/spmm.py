"""Experimental Pallas blocked ELL SpMM (round-2 candidate; not yet wired).

The XLA ELL path (ops/spmm.py::make_sym_spmm) gathers (N, K, d) from HBM and
reduces on the VPU. This kernel tiles rows and streams the gather through
VMEM with the weighted reduction fused, targeting the remaining HBM traffic:
each row tile loads only its K column indices/values plus the gathered X
rows, never materializing the (N, K, d) intermediate.

Current status: correct in interpret mode and on-chip for padded shapes;
throughput not yet ahead of the XLA path (dynamic row gathers from HBM are
latency-bound without manual double-buffered DMA). Kept out of the model
compute path until it wins; see ROADMAP.md.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _spmm_ell_kernel(k_width: int, x_ref, cols_ref, vals_ref, out_ref):
    # x_ref: full (N, d) in ANY/HBM-backed memory; cols/vals: (TR, K) tile
    tr = cols_ref.shape[0]
    acc = jnp.zeros((tr, x_ref.shape[1]), jnp.float32)
    for k in range(k_width):
        idx = cols_ref[:, k]
        rows = x_ref[idx]  # dynamic gather of TR rows
        acc = acc + rows * vals_ref[:, k][:, None]
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("tile_r", "interpret"))
def spmm_ell_pallas(
    x: jnp.ndarray,  # (N, d)
    ell_cols: jnp.ndarray,  # (N, K) int32
    ell_vals: jnp.ndarray,  # (N, K) float32
    tile_r: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    n, d = x.shape
    k_width = ell_cols.shape[1]
    assert n % tile_r == 0, (n, tile_r)
    grid = (n // tile_r,)
    kernel = functools.partial(_spmm_ell_kernel, k_width)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, d), lambda i: (0, 0)),
            pl.BlockSpec((tile_r, k_width), lambda i: (i, 0)),
            pl.BlockSpec((tile_r, k_width), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tile_r, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        interpret=interpret,
    )(x, ell_cols, ell_vals)


def spmm_ell_pallas_padded(x, ell_cols, ell_vals, tile_r=256, interpret=False):
    """Pad rows to a tile multiple and dispatch (host-friendly wrapper)."""
    n, d = x.shape
    n_pad = ((n + tile_r - 1) // tile_r) * tile_r
    if n_pad != n:
        x = jnp.concatenate([x, jnp.zeros((n_pad - n, d), x.dtype)])
        pad = jnp.zeros((n_pad - n, ell_cols.shape[1]), ell_cols.dtype)
        ell_cols = jnp.concatenate([ell_cols, pad])
        ell_vals = jnp.concatenate(
            [ell_vals, jnp.zeros((n_pad - n, ell_vals.shape[1]), ell_vals.dtype)]
        )
    out = spmm_ell_pallas(x, ell_cols, ell_vals, tile_r, interpret)
    return out[:n]
