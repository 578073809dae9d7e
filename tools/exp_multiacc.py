"""Experiment: P-way strided accumulator groups in the fused retrieval kernel.

PERF.md records the streaming top-2 extraction as bound by the m1/m2
dependency-chain LATENCY, not op count (the pairwise-slice merge cut ops
~20% and measured neutral). If that diagnosis is right, P independent
accumulator groups — group p owns item slices s with s % P == p, merged
into the exact block top-2 (+ 3rd-best ghost) once per block — should
recover the lost ILP at identical per-slice op count.

The merge is value- AND id-identical to the production single-chain
extraction: the block's per-lane top-2 is grouping-invariant, the merged
3rd-best is exactly max(all dropped), and the (value, then lower slice)
tie-break reproduces the earliest-slice-wins rule of the strict `>` chain.

Usage: python tools/exp_multiacc.py [--check] [--users 4096] [--items 270336]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from coldrec_tpu.ops.pallas.retrieval import (
    INIT_NEG,
    LANES,
    NEG,
    SLOTS,
    _fused_sweep,
    _resolve,
    _round_up,
)

DIM = 64
TOP_K = 20
MAX_RATED = 64


def _merge_two(ga, gb):
    """Exact per-lane top-2 of two (m1, m2, m3, a1, a2) groups.

    Tie rule: equal values keep the LOWER absolute slice index, matching
    the strict `c > m` chain's earliest-slice-wins behavior."""
    m1a, m2a, m3a, a1a, a2a = ga
    m1b, m2b, m3b, a1b, a2b = gb
    w = (m1a > m1b) | ((m1a == m1b) & (a1a < a1b))
    m1 = jnp.where(w, m1a, m1b)
    a1 = jnp.where(w, a1a, a1b)
    lo1 = jnp.where(w, m1b, m1a)
    lo1a = jnp.where(w, a1b, a1a)
    wm2 = jnp.where(w, m2a, m2b)
    wm2a = jnp.where(w, a2a, a2b)
    w2 = (lo1 > wm2) | ((lo1 == wm2) & (lo1a < wm2a))
    m2 = jnp.where(w2, lo1, wm2)
    a2 = jnp.where(w2, lo1a, wm2a)
    d2 = jnp.where(w2, wm2, lo1)  # dropped 3rd of the four tops
    lm2 = jnp.where(w, m2b, m2a)  # loser group's second — also dropped
    m3 = jnp.maximum(jnp.maximum(m3a, m3b), jnp.maximum(d2, lm2))
    return m1, m2, m3, a1, a2


def _multiacc_kernel(block_i, p_acc, u_ref, it_ref, excl_ref,
                     cv_ref, ci_ref, gh_ref, rv, ri, gh):
    j = pl.program_id(1)
    tu = u_ref.shape[0]
    g = block_i // LANES

    @pl.when(j == 0)
    def _init():
        rv[...] = jnp.full_like(rv, INIT_NEG)
        ri[...] = jnp.zeros_like(ri)
        gh[...] = jnp.full_like(gh, INIT_NEG)

    z = jnp.dot(u_ref[...], it_ref[...], preferred_element_type=jnp.float32)
    z = jnp.where(excl_ref[...] != 0, NEG, z)

    groups = []
    for _ in range(p_acc):
        groups.append([
            jnp.full((tu, LANES), INIT_NEG),
            jnp.full((tu, LANES), INIT_NEG),
            jnp.full((tu, LANES), INIT_NEG),
            jnp.zeros((tu, LANES), jnp.int32),
            jnp.zeros((tu, LANES), jnp.int32),
        ])
    for s in range(g):
        grp = groups[s % p_acc]
        m1, m2, m3, a1, a2 = grp
        c = z[:, s * LANES:(s + 1) * LANES]
        gt1 = c > m1
        gt2 = c > m2
        grp[2] = jnp.maximum(m3, jnp.minimum(c, m2))
        grp[4] = jnp.where(gt1, a1, jnp.where(gt2, s, a2))
        grp[1] = jnp.where(gt1, m1, jnp.maximum(c, m2))
        grp[3] = jnp.where(gt1, s, a1)
        grp[0] = jnp.maximum(c, m1)
    while len(groups) > 1:
        groups = [
            list(_merge_two(groups[i], groups[i + 1]))
            for i in range(0, len(groups) - 1, 2)
        ] + ([groups[-1]] if len(groups) % 2 else [])
    m1, m2, m3, a1, a2 = groups[0]

    base = j * block_i
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (tu, LANES), 1)
    ghost = jnp.maximum(gh[...], m3)
    for cv, ci in ((m1, base + a1 * LANES + lane_iota),
                   (m2, base + a2 * LANES + lane_iota)):
        for s in range(SLOTS):
            sv, si = rv[s], ri[s]
            swap = cv > sv
            rv[s] = jnp.where(swap, cv, sv)
            ri[s] = jnp.where(swap, ci, si)
            cv = jnp.where(swap, sv, cv)
            ci = jnp.where(swap, si, ci)
        ghost = jnp.maximum(ghost, cv)
    gh[...] = ghost

    @pl.when(j == pl.num_programs(1) - 1)
    def _emit():
        cv_ref[...] = jnp.concatenate([rv[s] for s in range(SLOTS)], axis=1)
        ci_ref[...] = jnp.concatenate([ri[s] for s in range(SLOTS)], axis=1)
        gh_ref[...] = gh[...]


@functools.partial(jax.jit, static_argnames=("tile_u", "block_i", "p_acc"))
def multiacc_sweep(users_pad, items_t, excl_row, tile_u, block_i, p_acc):
    b_pad, d = users_pad.shape
    i_pad = items_t.shape[1]
    grid = (b_pad // tile_u, i_pad // block_i)
    kernel = functools.partial(_multiacc_kernel, block_i, p_acc)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_u, d), lambda i, j: (i, 0)),
            pl.BlockSpec((d, block_i), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_i), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((tile_u, SLOTS * LANES), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_u, SLOTS * LANES), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_u, LANES), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, SLOTS * LANES), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, SLOTS * LANES), jnp.int32),
            jax.ShapeDtypeStruct((b_pad, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((SLOTS, tile_u, LANES), jnp.float32),
            pltpu.VMEM((SLOTS, tile_u, LANES), jnp.int32),
            pltpu.VMEM((tile_u, LANES), jnp.float32),
        ],
    )(users_pad, items_t, excl_row)


def chain_time(step, carry, n_iter=16, repeats=3):
    @jax.jit
    def run(c):
        def body(c, _):
            return step(c), None
        c, _ = jax.lax.scan(body, c, None, length=n_iter)
        return c

    jax.block_until_ready(run(carry))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run(carry))
        best = min(best, time.perf_counter() - t0)
    return best / n_iter


def make_inputs(n_users, n_items, tile_u, block_i, seed=0):
    rng = np.random.default_rng(seed)
    i_pad = _round_up(n_items, block_i)
    b_pad = _round_up(n_users, tile_u)
    users = np.zeros((b_pad, DIM), np.float32)
    users[:n_users] = rng.standard_normal((n_users, DIM)).astype(np.float32)
    items_t = np.zeros((DIM, i_pad), np.float32)
    items_t[:, :n_items] = rng.standard_normal(
        (n_items, DIM)).astype(np.float32).T
    excl = np.ones((1, i_pad), np.int8)
    live = np.ones(n_items, np.int8)
    live[rng.choice(n_items, n_items // 5, replace=False)] = 0
    excl[0, :n_items] = 1 - live
    rated = np.full((b_pad, MAX_RATED), n_items, np.int32)
    for u in range(n_users):
        n = rng.integers(MAX_RATED // 4, MAX_RATED)
        rated[u, :n] = rng.choice(n_items, n, replace=False)
    return (jnp.asarray(users), jnp.asarray(items_t), jnp.asarray(excl),
            jnp.asarray(rated))


def check(n_users=1024, n_items=24576, tile_u=256, block_i=2048):
    users, items_t, excl, rated = make_inputs(n_users, n_items, tile_u,
                                              block_i)
    ref = _fused_sweep(users, items_t, excl, tile_u, block_i)
    for p in (2, 4):
        got = multiacc_sweep(users, items_t, excl, tile_u, block_i, p)
        for name, a, b in zip("cv ci gh".split(), ref, got):
            a, b = np.asarray(a), np.asarray(b)
            if not np.array_equal(a, b):
                bad = np.flatnonzero((a != b).any(axis=-1) if a.ndim > 1
                                     else a != b)
                raise SystemExit(
                    f"P={p} {name} MISMATCH rows {bad[:5]} "
                    f"(first: {a[bad[0]][:8]} vs {b[bad[0]][:8]})")
        rv, ri, rs = _resolve(*ref, rated, TOP_K)
        gv, gi, gs = _resolve(*got, rated, TOP_K)
        assert np.array_equal(np.asarray(rv), np.asarray(gv))
        assert np.array_equal(np.asarray(ri), np.asarray(gi))
        assert np.array_equal(np.asarray(rs), np.asarray(gs))
        print(f"P={p}: bit-identical to production "
              f"(flag rate {np.asarray(gs).mean():.4f})")


def bench(n_users, n_items, tile_u, block_i):
    users, items_t, excl, rated = make_inputs(n_users, n_items, tile_u,
                                              block_i)

    def mk_step(p):
        def step(u):
            if p == 1:
                cv, ci, gh = _fused_sweep(u, items_t, excl, tile_u, block_i)
            else:
                cv, ci, gh = multiacc_sweep(u, items_t, excl, tile_u,
                                            block_i, p)
            dep = cv[:, :1] + gh[:, :1]
            return u + 1e-38 * dep
        return step

    pairs = n_users * n_items
    for p in (1, 2, 4, 8):
        t = chain_time(mk_step(p), users)
        print(f"P={p} block_i={block_i}: raw {pairs / t / 1e9:.1f} G pairs/s"
              f" ({t * 1e3:.2f} ms)", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--users", type=int, default=4096)
    ap.add_argument("--items", type=int, default=270336)
    ap.add_argument("--tile_u", type=int, default=256)
    ap.add_argument("--block_i", type=int, default=8192)
    args = ap.parse_args()
    if args.check:
        check()
    else:
        bench(args.users, args.items, args.tile_u, args.block_i)
