"""Fused retrieval kernel: blocked dot-product + masking + streaming top-k.

Replaces the reference's eval hot path (BaseRecommender.py:170-183: full
U x I matmul -> scatter rated mask -> candidate mask -> torch.topk) and
faiss IndexFlatIP (KNN.py:67-73) with one Pallas kernel that never
materializes the (U, I) score matrix in HBM:

  grid = (item blocks); per block the kernel
    1. computes the (TU, IB) score tile on the MXU (user tile x item block),
    2. applies the fused exclusion mask (rated ∪ cross-split candidates),
    3. merges the block into a running (TU, K) top-k held in VMEM scratch
       via K argmax-extraction passes (pure VPU arithmetic — no sort).

HBM traffic per user tile drops from O(U_tile * I * 4B) score writes+reads
to the mask bytes alone (int8), ~8x less at book-crossing scale.

The mask tile is precomputed per user chunk by an XLA scatter (cheap:
O(rated) updates) — passing per-(user, item) state into the kernel as a
dense int8 plane keeps the kernel free of dynamic shapes.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

NEG = -10e8  # reference mask value (BaseRecommender.py:177-180)


def _retrieval_kernel(k: int, block_i: int, u_ref, it_ref, mask_ref,
                      vals_ref, idx_ref, run_vals, run_idx):
    j = pl.program_id(0)
    tu = u_ref.shape[0]

    @pl.when(j == 0)
    def _init():
        run_vals[:] = jnp.full_like(run_vals, NEG * 2.0)
        run_idx[:] = jnp.zeros_like(run_idx)

    scores = jnp.dot(
        u_ref[:], it_ref[:].T, preferred_element_type=jnp.float32
    )  # (TU, IB)
    excluded = mask_ref[:] != 0
    scores = jnp.where(excluded, NEG, scores)
    base = j * block_i
    col_ids = base + jax.lax.broadcasted_iota(jnp.int32, (tu, block_i), 1)

    allv = jnp.concatenate([run_vals[:], scores], axis=1)
    alli = jnp.concatenate([run_idx[:], col_ids], axis=1)
    width = allv.shape[1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (tu, width), 1)
    out_v = []
    out_i = []
    work = allv
    for _ in range(k):
        m = jnp.max(work, axis=1, keepdims=True)  # (TU, 1)
        am = jnp.argmax(work, axis=1)  # (TU,)
        onehot = pos == am[:, None]
        out_v.append(m[:, 0])
        out_i.append(jnp.sum(jnp.where(onehot, alli, 0), axis=1))
        work = jnp.where(onehot, NEG * 2.0, work)
    run_vals[:] = jnp.stack(out_v, axis=1)
    run_idx[:] = jnp.stack(out_i, axis=1)

    @pl.when(j == pl.num_programs(0) - 1)
    def _emit():
        vals_ref[:] = run_vals[:]
        idx_ref[:] = run_idx[:]


@functools.partial(
    jax.jit, static_argnames=("k", "block_i", "interpret")
)
def retrieval_topk_tile(
    user_tile: jnp.ndarray,  # (TU, d)
    item_emb: jnp.ndarray,  # (I, d)   I % block_i == 0 (pre-padded)
    mask_tile: jnp.ndarray,  # (TU, I) int8, nonzero = excluded
    k: int,
    block_i: int = 2048,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    tu, d = user_tile.shape
    n_items = item_emb.shape[0]
    assert n_items % block_i == 0, (n_items, block_i)
    grid = (n_items // block_i,)
    from jax.experimental.pallas import tpu as pltpu

    kernel = functools.partial(_retrieval_kernel, k, block_i)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tu, d), lambda j: (0, 0)),
            pl.BlockSpec((block_i, d), lambda j: (j, 0)),
            pl.BlockSpec((tu, block_i), lambda j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((tu, k), lambda j: (0, 0)),
            pl.BlockSpec((tu, k), lambda j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tu, k), jnp.float32),
            jax.ShapeDtypeStruct((tu, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tu, k), jnp.float32),
            pltpu.VMEM((tu, k), jnp.int32),
        ],
        interpret=interpret,
    )(user_tile, item_emb, mask_tile)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("n_items_pad",))
def build_mask_tile(
    rated_pad: jnp.ndarray,  # (TU, R) item ids, pad = item_num
    excluded: jnp.ndarray,  # (item_num,) bool candidate exclusion
    n_items_pad: int,
) -> jnp.ndarray:
    """(TU, n_items_pad) int8 exclusion plane via one scatter."""
    tu = rated_pad.shape[0]
    n_items = excluded.shape[0]
    base = jnp.broadcast_to(
        excluded.astype(jnp.int8), (tu, n_items)
    )
    pad_cols = n_items_pad - n_items
    plane = jnp.concatenate(
        [base, jnp.ones((tu, pad_cols), jnp.int8)], axis=1
    )
    rows = jnp.arange(tu, dtype=jnp.int32)[:, None]
    # pad index == n_items lands inside the padded (always-excluded) region
    return plane.at[rows, rated_pad].set(1, mode="drop")


def retrieval_topk(
    user_emb: np.ndarray,
    item_emb: np.ndarray,
    rated_pad: np.ndarray,  # (U, R) padded rated ids (pad = item_num)
    excluded: np.ndarray,  # (item_num,) bool
    k: int,
    tile_u: int = 256,
    block_i: int = 2048,
    interpret: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Full sweep over all users; returns (vals (U, k), ids (U, k))."""
    n_users, d = user_emb.shape
    n_items = item_emb.shape[0]
    n_items_pad = _round_up(n_items, block_i)
    items = jnp.asarray(
        np.concatenate(
            [item_emb, np.zeros((n_items_pad - n_items, d), item_emb.dtype)]
        )
    )
    excluded_j = jnp.asarray(excluded)
    out_v, out_i = [], []
    for start in range(0, n_users, tile_u):
        tile = user_emb[start : start + tile_u]
        rated = rated_pad[start : start + tile_u]
        pad_rows = tile_u - tile.shape[0]
        if pad_rows:
            tile = np.concatenate(
                [tile, np.zeros((pad_rows, d), tile.dtype)]
            )
            rated = np.concatenate(
                [rated, np.full((pad_rows, rated.shape[1]), n_items, rated.dtype)]
            )
        mask = build_mask_tile(
            jnp.asarray(rated.astype(np.int32)), excluded_j, n_items_pad
        )
        v, i = retrieval_topk_tile(
            jnp.asarray(tile), items, mask, k, block_i, interpret
        )
        out_v.append(np.asarray(v))
        out_i.append(np.asarray(i))
    vals = np.concatenate(out_v)[:n_users]
    ids = np.concatenate(out_i)[:n_users]
    return vals, ids
