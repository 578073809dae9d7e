"""Sharded building blocks: embedding lookup, SpMM, retrieval top-k merge.

These are the multi-chip equivalents of the single-chip ops (SURVEY §2.5):

  * **Row-sharded embedding lookup** — tables live row-sharded over the
    ``model`` axis; two comm strategies behind one signature: the
    id-exchange lookup (each shard gathers the rows it owns, one psum
    assembles the batch — O(B·d) wire bytes, flat in table height; the
    production path for large tables) and a whole-table all-gather fast
    path for tables comparable to the batch.
  * **Sharded SpMM** — adjacency edges are partitioned by destination-row
    shard (host-side, one-time, padded to equal length); each shard
    all-gathers the input rows then segment-sums locally. Output rows stay
    sharded; no psum needed because each shard owns its rows exclusively.
  * **Sharded retrieval top-k** — each shard scores users against its item
    rows, takes a local top-k, then all-gathers the k candidates and
    re-ranks: the classic item-axis-sharded retrieval merge.

All functions are shard_map'ed over a Mesh and reduce to the single-chip
path on a 1-device mesh.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import AXIS_MODEL


def shard_map(f, mesh, in_specs, out_specs, check=True):
    """jax.shard_map with replication checking ON by default.

    Pass ``check=False`` ONLY for ops whose out_specs claim replication of
    an ``all_gather`` result: jax (0.9.0) cannot statically infer that an
    all-gathered value is replicated (verified — psum outputs check fine,
    all_gather outputs raise), so those merges must bypass the checker.
    Everything else (psum-assembled lookups, row-sharded SpMM) keeps the
    checker active.
    """
    try:
        return jax.shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check,
        )
    except TypeError:  # older jax
        from jax.experimental.shard_map import shard_map as _sm

        return _sm(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=check,
        )


def shard_rows(mesh: Mesh, table: jnp.ndarray) -> jnp.ndarray:
    """Place an (N, d) table row-sharded over the model axis (N % axis == 0
    required; pad first with pad_rows)."""
    return jax.device_put(table, NamedSharding(mesh, P(AXIS_MODEL, None)))


def pad_rows(x: np.ndarray, multiple: int) -> np.ndarray:
    n = x.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return x
    return np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])


def sharded_lookup(
    mesh: Mesh, table: jnp.ndarray, ids: jnp.ndarray, mode: str = "auto"
):
    """Gather rows of a row-sharded table; ids replicated, result replicated.

    Two comm strategies behind one signature (SURVEY §2.5 TP row):

    * ``exchange`` — the id-exchange lookup: every shard gathers the id
      rows it OWNS (others masked to zero) and a psum over the model axis
      assembles the batch. Per-step comm is O(B·d) — independent of the
      table height, so a 270k-row table costs the same wire bytes as a
      1k-row one. This is the production path for large tables.
    * ``gather`` — all-gather the whole table then index locally. Comm is
      O(N·d) per step; cheaper only when the table is comparable to the
      batch (N ≲ n_shards · B, e.g. MovieLens-scale tables), because the
      psum moves B·d floats through every hop anyway.

    ``auto`` picks ``exchange`` when N > n_shards * B. Gradients flow
    through both (psum transposes to identity; the masked gather
    transposes to a scatter-add into the owning shard's rows).
    """
    n_model = mesh.shape[AXIS_MODEL]
    rps = table.shape[0] // n_model
    if mode == "auto":
        mode = "exchange" if table.shape[0] > n_model * ids.shape[0] else "gather"

    if mode == "gather":
        def f(local, ids):
            full = jax.lax.all_gather(local, AXIS_MODEL, tiled=True)
            return full[ids]
    else:
        def f(local, ids):
            shard = jax.lax.axis_index(AXIS_MODEL)
            loc = ids - shard * rps
            own = (loc >= 0) & (loc < rps)
            rows = local[jnp.where(own, loc, 0)]
            rows = jnp.where(own[:, None], rows, 0.0)
            return jax.lax.psum(rows, AXIS_MODEL)

    # gather mode's output is an all_gather result claimed replicated —
    # not statically inferable (see shard_map docstring); exchange mode's
    # psum checks fine.
    fm = shard_map(
        f, mesh, in_specs=(P(AXIS_MODEL, None), P()), out_specs=P(),
        check=(mode != "gather"),
    )
    return fm(table, ids)


class ShardedGraph:
    """Edges partitioned by destination-row shard, padded to equal length.

    ``rows``/``cols``/``vals`` have shape (n_shards * per_shard,); the
    leading axis is sharded so each device holds its own edge block. Padded
    edges carry val=0 and row=first-local-row, making them no-ops.
    """

    def __init__(self, mesh: Mesh, host_graph, n_rows_padded: int):
        n_shards = mesh.shape[AXIS_MODEL] * mesh.shape.get("data", 1)
        n_model = mesh.shape[AXIS_MODEL]
        self.mesh = mesh
        self.n_rows = n_rows_padded
        assert n_rows_padded % n_model == 0
        self.rows_per_shard = n_rows_padded // n_model
        rows, cols, vals = host_graph.rows, host_graph.cols, host_graph.vals
        shard_of = rows // self.rows_per_shard
        per = [np.flatnonzero(shard_of == s) for s in range(n_model)]
        width = max(max((p.size for p in per), default=1), 1)
        R = np.zeros((n_model, width), np.int32)
        C = np.zeros((n_model, width), np.int32)
        V = np.zeros((n_model, width), np.float32)
        for s, idx in enumerate(per):
            R[s, : idx.size] = rows[idx]
            C[s, : idx.size] = cols[idx]
            V[s, : idx.size] = vals[idx]
            R[s, idx.size :] = s * self.rows_per_shard  # no-op rows (val 0)
        from .distributed import host_to_global

        # host_to_global, NOT device_put: under a multi-process group each
        # process can only materialize its addressable shards (the same
        # round-2 defect fixed in warm_base._setup_mesh)
        sh = NamedSharding(mesh, P(AXIS_MODEL, None))
        self.rows_s = host_to_global(R, sh)
        self.cols_s = host_to_global(C, sh)
        self.vals_s = host_to_global(V, sh)


def sharded_spmm(graph: ShardedGraph, x: jnp.ndarray) -> jnp.ndarray:
    """A @ x with A row-sharded by ShardedGraph and x row-sharded. Output
    rows stay sharded over the model axis."""
    mesh = graph.mesh
    rps = graph.rows_per_shard

    def f(rows_l, cols_l, vals_l, x_local):
        x_full = jax.lax.all_gather(x_local, AXIS_MODEL, tiled=True)
        shard_id = jax.lax.axis_index(AXIS_MODEL)
        local_rows = rows_l[0] - shard_id * rps
        gathered = x_full[cols_l[0]] * vals_l[0][:, None]
        return jax.ops.segment_sum(gathered, local_rows, num_segments=rps)

    fm = shard_map(
        f, mesh,
        in_specs=(
            P(AXIS_MODEL, None), P(AXIS_MODEL, None),
            P(AXIS_MODEL, None), P(AXIS_MODEL, None),
        ),
        out_specs=P(AXIS_MODEL, None),
    )
    return fm(graph.rows_s, graph.cols_s, graph.vals_s, x)


def sharded_masked_topk(
    mesh: Mesh,
    user_emb: jnp.ndarray,  # (B, d) replicated
    item_emb: jnp.ndarray,  # (I, d) row-sharded over model (I % axis == 0)
    excluded: jnp.ndarray,  # (I,) bool sharded over model
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Item-axis-sharded retrieval: local score+top-k per shard, all-gather
    the k candidates, global re-rank. Returns replicated (vals, ids)."""
    n_model = mesh.shape[AXIS_MODEL]
    items_per = item_emb.shape[0] // n_model

    def f(u, items_l, excl_l):
        shard_id = jax.lax.axis_index(AXIS_MODEL)
        scores = u @ items_l.T  # (B, I/shards)
        scores = jnp.where(excl_l[None, :], -10e8, scores)
        lv, li = jax.lax.top_k(scores, min(k, items_l.shape[0]))
        li = li + shard_id * items_per
        av = jax.lax.all_gather(lv, AXIS_MODEL, axis=1, tiled=True)
        ai = jax.lax.all_gather(li, AXIS_MODEL, axis=1, tiled=True)
        gv, gpos = jax.lax.top_k(av, k)
        gi = jnp.take_along_axis(ai, gpos, axis=1)
        return gv, gi

    fm = shard_map(
        f, mesh,
        in_specs=(P(), P(AXIS_MODEL, None), P(AXIS_MODEL)),
        out_specs=(P(), P()),
        check=False,  # outputs are all_gather merges (see shard_map docstring)
    )
    return fm(user_emb, item_emb, excluded)


def sharded_retrieval_topk(
    mesh: Mesh,
    user_emb: jnp.ndarray,  # (B, d) replicated
    item_emb: jnp.ndarray,  # (I, d) row-sharded over model (I % axis == 0)
    rated_pad: np.ndarray,  # (B, R) global item ids, pad >= I
    excluded: jnp.ndarray,  # (I,) bool sharded over model
    k: int,
    tile_u: int = 256,
    block_i: int = 8192,
    interpret: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Item-axis-sharded retrieval through the fused Pallas kernel.

    Each shard runs the fused score+mask+streaming-top-k kernel
    (ops/pallas/retrieval.py) over its OWN item rows — the (B, I/n)
    score plane never touches HBM on any chip — then all-gathers its
    SLOTS*128 candidates and per-lane ghost bound over ICI. Rated items
    are rejected among the merged candidates and the survivor top-k is
    exact by the per-shard ghost argument: every non-candidate item was
    discarded inside its own shard at a value <= that shard's ghost.
    Rows whose merged ghost reaches the k-th value are recomputed via an
    exact per-shard overfetch path (top k+R per shard, gather, reject
    rated) — the multi-chip analog of retrieval_topk's fallback.

    Replaces the reference's replicated torch eval
    (BaseRecommender.py:170-183) for item spaces too large for one chip.
    """
    from ..ops.pallas.retrieval import (
        LANES, SLOTS, _fused_sweep, _resolve, _round_up,
    )

    n_model = mesh.shape[AXIS_MODEL]
    n_users, d = user_emb.shape
    n_items = item_emb.shape[0]
    assert n_items % n_model == 0, (n_items, n_model)
    items_per = n_items // n_model
    assert k + rated_pad.shape[1] <= SLOTS * LANES, (k, SLOTS * LANES)
    block_l = min(block_i, _round_up(items_per, LANES))
    i_pad_l = _round_up(items_per, block_l)
    b_pad = _round_up(n_users, tile_u)

    def f(u, items_l, excl_l):
        shard = jax.lax.axis_index(AXIS_MODEL)
        users = jnp.zeros((b_pad, d), u.dtype).at[:n_users].set(u)
        items_t = (
            jnp.zeros((d, i_pad_l), items_l.dtype)
            .at[:, :items_per].set(items_l.T)
        )
        excl_row = (
            jnp.ones((1, i_pad_l), jnp.int8)
            .at[0, :items_per].set(excl_l.astype(jnp.int8))
        )
        cv, ci, gh = _fused_sweep(
            users, items_t, excl_row, tile_u, block_l, interpret
        )
        # local -> global ids; pad columns (local id >= items_per) map to
        # the global pad id n_items — offsetting them would ALIAS into the
        # next shard's real id range and could surface as a concrete wrong
        # recommendation for users whose candidate pool is thinner than k
        ci = jnp.where(
            ci < items_per, ci + shard * items_per, n_items
        )
        av = jax.lax.all_gather(cv, AXIS_MODEL, axis=1, tiled=True)
        ai = jax.lax.all_gather(ci, AXIS_MODEL, axis=1, tiled=True)
        ag = jax.lax.all_gather(gh, AXIS_MODEL, axis=1, tiled=True)
        return av, ai, ag

    fm = shard_map(
        f, mesh,
        in_specs=(P(), P(AXIS_MODEL, None), P(AXIS_MODEL)),
        out_specs=(P(), P(), P()),
        check=False,  # outputs are all_gather merges (see shard_map docstring)
    )
    av, ai, ag = fm(user_emb, item_emb, excluded)
    rated = (
        jnp.full((b_pad, rated_pad.shape[1]), n_items, jnp.int32)
        .at[:n_users].set(jnp.asarray(rated_pad, jnp.int32))
    )
    vals_d, ids_d, sus_d = _resolve(av, ai, ag, rated, k)
    from ..ops.pallas.retrieval import _torch_tie_order, apply_exact_fallback

    vals, ids = _torch_tie_order(
        np.array(vals_d[:n_users]), np.array(ids_d[:n_users])
    )

    def exact_chunk(rows_pad):
        return _sharded_exact_rows(
            mesh,
            jnp.asarray(user_emb)[jnp.asarray(rows_pad)],
            item_emb,
            np.asarray(rated_pad)[rows_pad],
            excluded,
            k,
        )

    apply_exact_fallback(vals, ids, np.asarray(sus_d[:n_users]), exact_chunk)
    return vals, ids


def _sharded_exact_rows(mesh, users_rows, item_emb, rated_rows, excluded, k):
    """Exact fallback for ghost-flagged rows: per-shard overfetch top
    (k+R) with the candidate mask only, gather, reject rated globally,
    re-rank. Exact because at most R rated items can outrank a masked
    top-k element inside its shard."""
    n_model = mesh.shape[AXIS_MODEL]
    items_per = item_emb.shape[0] // n_model
    r = rated_rows.shape[1]
    fetch = min(k + r, items_per)

    def f(u, items_l, excl_l):
        shard = jax.lax.axis_index(AXIS_MODEL)
        scores = u @ items_l.T
        scores = jnp.where(excl_l[None, :], -10e8, scores)
        lv, li = jax.lax.top_k(scores, fetch)
        li = li + shard * items_per
        av = jax.lax.all_gather(lv, AXIS_MODEL, axis=1, tiled=True)
        ai = jax.lax.all_gather(li, AXIS_MODEL, axis=1, tiled=True)
        return av, ai

    fm = shard_map(
        f, mesh,
        in_specs=(P(), P(AXIS_MODEL, None), P(AXIS_MODEL)),
        out_specs=(P(), P()),
        check=False,  # outputs are all_gather merges (see shard_map docstring)
    )
    av, ai = fm(users_rows, item_emb, excluded)
    is_rated = jnp.any(
        ai[:, :, None] == jnp.asarray(rated_rows, jnp.int32)[:, None, :],
        axis=-1,
    )
    # reference MASK_VALUE: rated and candidate-excluded fillers must tie
    # at the same -10e8 level so filler ordering matches the single-chip
    # masked_topk fallback (and torch) when survivors < k
    av = jnp.where(is_rated, -10e8, av)
    vals, pos = jax.lax.top_k(av, k)
    ids = jnp.take_along_axis(ai, pos, axis=1)
    return vals, ids


def make_mesh_graph(mesh: Mesh, host_graph, n_nodes: int):
    """Â@x operator with edges and rows sharded over the model axis — a
    drop-in for the single-chip ``make_sym_spmm`` closure (ops/spmm.py
    dispatches on callables). Pads the node space to the axis size
    internally; pad rows have no edges so they stay zero. Each layer's
    collective pattern: all_gather of the input rows over ICI, local
    gather+segment-sum, output rows owned exclusively per shard (no psum).
    """
    n_model = mesh.shape[AXIS_MODEL]
    n_pad_total = n_nodes + ((-n_nodes) % n_model)
    sg = ShardedGraph(mesh, host_graph, n_pad_total)
    row = NamedSharding(mesh, P(AXIS_MODEL, None))

    def apply(x):
        pad = n_pad_total - n_nodes
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad, x.shape[1]), x.dtype)], axis=0
            )
        x = jax.lax.with_sharding_constraint(x, row)
        return sharded_spmm(sg, x)[:n_nodes]

    return apply
