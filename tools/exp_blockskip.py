"""Block-skip experiment on the fused retrieval kernel (round-2 VERDICT #6).

Hypothesis under test: compute the block row-max first and skip the whole
top-2 extraction cascade (retrieval.py steps 3-5) via ``@pl.when`` for item
blocks whose max can't beat the running candidate floor — at k=20 over 270k
items most blocks are dominated per-user after the first few.

Key structural constraint the hypothesis must overcome: ``@pl.when``
predication is per PROGRAM, and one program covers a (tile_u, block_i)
tile — the skip fires only when ALL tile_u users are simultaneously
dominated. The experiment therefore measures:

  * two floors: lb0 = min over lanes of the per-lane TOP value (128
    candidates >= lb0 — enough since k + R = 84 <= 128, so theta >= lb0
    after rejecting <= R rated candidates) and lb7 = min over all
    SLOTS*128 running values (weaker floor, earlier in the stream);
  * tile_u in {256, 64} (smaller tiles make the all-users predicate easier
    but starve the MXU);
  * three data regimes: iid normal (bench headline), popularity-skewed
    norms in arbitrary item order (realistic trained tables), and
    norm-sorted item order (best case — after the first high-norm blocks
    the bound decays monotonically).

Exactness is unconditional by the ghost argument: a skipped block's values
are all "discarded", the ghost absorbs the block max, and any user whose
true top-k lost an item that way fails the ghost check and is recomputed
exactly — the experiment asserts final (vals, ids) equality vs production.

Usage:  python tools/exp_blockskip.py [--items 270336] [--users 4096]
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
    INIT_NEG, LANES, NEG, SLOTS, _fused_sweep, _resolve, _round_up,
)

DIM = 64
TOP_K = 20
MAX_RATED = 64


def _skip_kernel(block_i, floor_slot, u_ref, it_ref, excl_ref,
                 cv_ref, ci_ref, gh_ref, sk_ref, rv, ri, gh, sk):
    j = pl.program_id(1)
    tu = u_ref.shape[0]
    g = block_i // LANES

    @pl.when(j == 0)
    def _init():
        rv[...] = jnp.full_like(rv, INIT_NEG)
        ri[...] = jnp.zeros_like(ri)
        gh[...] = jnp.full_like(gh, INIT_NEG)
        sk[...] = jnp.zeros_like(sk)

    z = jnp.dot(u_ref[...], it_ref[...], preferred_element_type=jnp.float32)
    z = jnp.where(excl_ref[...] != 0, NEG, z)

    bmax = jnp.max(z, axis=1, keepdims=True)  # (TU, 1)
    lb = jnp.min(rv[floor_slot], axis=1, keepdims=True)  # (TU, 1)
    skip = jnp.all(bmax < lb)

    @pl.when(skip)
    def _skip():
        gh[...] = jnp.maximum(gh[...], bmax)  # discards bounded by block max
        sk[...] = sk[...] + 1  # (8, 128) broadcast counter block

    @pl.when(jnp.logical_not(skip))
    def _full():
        m1 = jnp.full((tu, LANES), INIT_NEG)
        m2 = jnp.full((tu, LANES), INIT_NEG)
        m3 = jnp.full((tu, LANES), INIT_NEG)
        a1 = jnp.zeros((tu, LANES), jnp.int32)
        a2 = jnp.zeros((tu, LANES), jnp.int32)
        for s in range(g):
            c = z[:, s * LANES:(s + 1) * LANES]
            gt1 = c > m1
            gt2 = c > m2
            m3 = jnp.maximum(m3, jnp.where(gt2, m2, c))
            a2 = jnp.where(gt1, a1, jnp.where(gt2, s, a2))
            m2 = jnp.where(gt1, m1, jnp.where(gt2, c, m2))
            a1 = jnp.where(gt1, s, a1)
            m1 = jnp.where(gt1, c, m1)

        base = j * block_i
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (tu, LANES), 1)
        ghost = jnp.maximum(gh[...], m3)
        cv1, ci1 = m1, base + a1 * LANES + lane_iota
        cv2, ci2 = m2, base + a2 * LANES + lane_iota
        for cv, ci in ((cv1, ci1), (cv2, ci2)):
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
        sk_ref[...] = sk[...]


@functools.partial(
    jax.jit, static_argnames=("tile_u", "block_i", "floor_slot", "interpret")
)
def _skip_sweep(users_pad, items_t, excl_row, tile_u, block_i,
                floor_slot, interpret=False):
    b_pad, d = users_pad.shape
    i_pad = items_t.shape[1]
    grid = (b_pad // tile_u, i_pad // block_i)
    kernel = functools.partial(_skip_kernel, block_i, floor_slot)
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
            pl.BlockSpec((8, LANES), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, SLOTS * LANES), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, SLOTS * LANES), jnp.int32),
            jax.ShapeDtypeStruct((b_pad, LANES), jnp.float32),
            jax.ShapeDtypeStruct((b_pad // tile_u * 8, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((SLOTS, tile_u, LANES), jnp.float32),
            pltpu.VMEM((SLOTS, tile_u, LANES), jnp.int32),
            pltpu.VMEM((tile_u, LANES), jnp.float32),
            pltpu.VMEM((8, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(users_pad, items_t, excl_row)


def _pad_inputs(ue, ie, tile_u, block_i):
    n_users, d = ue.shape
    n_items = ie.shape[0]
    i_pad = _round_up(n_items, block_i)
    b_pad = _round_up(n_users, tile_u)
    users = jnp.zeros((b_pad, d), jnp.float32).at[:n_users].set(ue)
    items_t = jnp.zeros((d, i_pad), jnp.float32).at[:, :n_items].set(ie.T)
    excl = jnp.ones((1, i_pad), jnp.int8).at[0, :n_items].set(0)
    return users, items_t, excl


def check_exact(ue, ie, rat, tile_u, block_i, floor_slot, interpret):
    """Final routed (vals, ids) must equal the production kernel's."""
    n_users, n_items = ue.shape[0], ie.shape[0]
    users, items_t, excl = _pad_inputs(ue, ie, tile_u, block_i)
    rated = (
        jnp.full((users.shape[0], rat.shape[1]), n_items, jnp.int32)
        .at[:n_users].set(jnp.asarray(rat))
    )
    cv0, ci0, gh0 = _fused_sweep(users, items_t, excl, tile_u, block_i,
                                 interpret)
    v0, i0, s0 = _resolve(cv0, ci0, gh0, rated, TOP_K)
    cv1, ci1, gh1, sk = _skip_sweep(users, items_t, excl, tile_u, block_i,
                                    floor_slot, interpret)
    v1, i1, s1 = _resolve(cv1, ci1, gh1, rated, TOP_K)
    # unflagged rows must agree exactly; flagged rows route to the exact
    # fallback in production so any flag pattern is correct — but count it
    ok_rows = ~(np.asarray(s0) | np.asarray(s1))
    assert np.array_equal(np.asarray(v1)[ok_rows], np.asarray(v0)[ok_rows])
    assert np.array_equal(np.asarray(i1)[ok_rows], np.asarray(i0)[ok_rows])
    n_blocks = items_t.shape[1] // block_i
    skips = np.asarray(sk)[::8, 0]  # one (8,128) broadcast block per tile
    return {
        "flags_prod": int(np.asarray(s0)[:n_users].sum()),
        "flags_skip": int(np.asarray(s1)[:n_users].sum()),
        "skip_rate": float(skips.mean() / n_blocks),
    }


def bench(sweep_fn, ue, ie, tile_u, block_i, n_iter=16, **kw):
    n_users, n_items = ue.shape[0], ie.shape[0]
    users, items_t, excl = _pad_inputs(ue, ie, tile_u, block_i)

    @jax.jit
    def chained(u):
        def body(u, _):
            out = sweep_fn(u, items_t, excl, tile_u, block_i, **kw)
            dep = out[0][:, :1] + out[2][:, :1]
            return u + 1e-38 * dep, None

        u, _ = jax.lax.scan(body, u, None, length=n_iter)
        return u

    jax.block_until_ready(chained(users))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(chained(users))
        best = min(best, time.perf_counter() - t0)
    return n_iter * n_users * n_items / best / 1e9


def make_tables(regime, n_users, n_items, rng):
    ue = rng.standard_normal((n_users, DIM)).astype(np.float32)
    ie = rng.standard_normal((n_items, DIM)).astype(np.float32)
    if regime in ("skew", "skew_sorted"):
        # popularity-skewed norms: zipf-ish scale, heavy head
        scale = (1.0 / np.arange(1, n_items + 1) ** 0.35).astype(np.float32)
        rng.shuffle(scale)
        ie *= scale[:, None] * 3.0
    if regime == "skew_sorted":
        order = np.argsort(-np.linalg.norm(ie, axis=1))
        ie = ie[order]
    return jnp.asarray(ue), jnp.asarray(ie)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--users", type=int, default=4096)
    p.add_argument("--items", type=int, default=270336)
    p.add_argument("--block_i", type=int, default=8192)
    p.add_argument("--interpret", action="store_true")
    args = p.parse_args()
    rng = np.random.default_rng(0)

    rat = np.full((args.users, MAX_RATED), args.items, dtype=np.int32)
    for u in range(args.users):
        n = rng.integers(MAX_RATED // 4, MAX_RATED)
        rat[u, :n] = rng.choice(args.items, n, replace=False)

    for regime in ("iid", "skew", "skew_sorted"):
        ue, ie = make_tables(regime, args.users, args.items, rng)
        prod = bench(_fused_sweep, ue, ie, 256, args.block_i,
                     interpret=args.interpret)
        print(f"[{regime}] production 256x{args.block_i}: {prod:.1f} G pairs/s")
        for tile_u in (256, 64):
            for floor_slot in (0, SLOTS - 1):
                stats = check_exact(ue, ie, rat, tile_u, args.block_i,
                                    floor_slot, args.interpret)
                thr = bench(
                    _skip_sweep, ue, ie, tile_u, args.block_i,
                    floor_slot=floor_slot, interpret=args.interpret,
                )
                print(
                    f"[{regime}] skip tile={tile_u} floor=rv[{floor_slot}]: "
                    f"{thr:.1f} G pairs/s  skip_rate={stats['skip_rate']:.3f} "
                    f"flags prod={stats['flags_prod']} "
                    f"skip={stats['flags_skip']}"
                )


if __name__ == "__main__":
    main()
