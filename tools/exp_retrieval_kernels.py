"""Kernel-variant experiments for the fused retrieval sweep (real TPU).

Times isolated Pallas variants to locate where the production kernel's
time goes. Variants:
  dotonly   — score tile + running rowmax only (kernel-side ceiling)
  dotonly_t — same with pre-transposed (d, IB) item blocks
  stream2d  — full top-2-per-lane extraction done as a fori_loop over
              contiguous (TU, 128) column slices (pure 2D VPU ops)
  prod      — the shipped kernel (ops/pallas/retrieval.py)

Usage: python tools/exp_retrieval_kernels.py [--items 270336]
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

LANES = 128
SLOTS = 8
NEG = -10e8
INIT_NEG = -4e9
EPS = 1e-38


def chain_time(step, carry, n_iter=16, repeats=3):
    @jax.jit
    def run(c):
        def body(c, _):
            return step(c)
        c, _ = jax.lax.scan(body, c, None, length=n_iter)
        return c

    out = jax.block_until_ready(run(carry))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(carry))
        best = min(best, time.perf_counter() - t0)
    return best / n_iter


# ---------------------------------------------------------------- dotonly
def _dot_kernel(transposed, u_ref, it_ref, out_ref, acc):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc[...] = jnp.full_like(acc, INIT_NEG)

    if transposed:
        z = jnp.dot(u_ref[...], it_ref[...],
                    preferred_element_type=jnp.float32)
    else:
        z = jnp.dot(u_ref[...], it_ref[...].T,
                    preferred_element_type=jnp.float32)
    acc[...] = jnp.maximum(acc[...], jnp.max(
        z.reshape(z.shape[0], -1, LANES), axis=1))

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_ref[...] = acc[...]


@functools.partial(jax.jit, static_argnames=("tile_u", "block_i", "transposed"))
def dot_sweep(users, items, tile_u, block_i, transposed):
    b, d = users.shape
    i_pad = items.shape[1] if transposed else items.shape[0]
    grid = (b // tile_u, i_pad // block_i)
    ispec = (pl.BlockSpec((d, block_i), lambda i, j: (0, j)) if transposed
             else pl.BlockSpec((block_i, d), lambda i, j: (j, 0)))
    return pl.pallas_call(
        functools.partial(_dot_kernel, transposed),
        grid=grid,
        in_specs=[pl.BlockSpec((tile_u, d), lambda i, j: (i, 0)), ispec],
        out_specs=pl.BlockSpec((tile_u, LANES), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_u, LANES), jnp.float32)],
    )(users, items)


# ---------------------------------------------------------------- stream2d
def _stream_kernel(block_i, u_ref, it_ref, excl_ref, cv_ref, ci_ref, gh_ref,
                   rv, ri, gh):
    j = pl.program_id(1)
    tu = u_ref.shape[0]
    g = block_i // LANES

    @pl.when(j == 0)
    def _():
        rv[...] = jnp.full_like(rv, INIT_NEG)
        ri[...] = jnp.zeros_like(ri)
        gh[...] = jnp.full_like(gh, INIT_NEG)

    z = jnp.dot(u_ref[...], it_ref[...], preferred_element_type=jnp.float32)
    z = jnp.where(excl_ref[...] != 0, NEG, z)

    m1 = jnp.full((tu, LANES), INIT_NEG)
    m2 = jnp.full((tu, LANES), INIT_NEG)
    m3 = jnp.full((tu, LANES), INIT_NEG)
    a1 = jnp.zeros((tu, LANES), jnp.int32)
    a2 = jnp.zeros((tu, LANES), jnp.int32)
    for s in range(g):
        c = z[:, s * LANES:(s + 1) * LANES]
        gt1 = c > m1
        gt2 = c > m2
        demoted = jnp.where(gt2, m2, c)
        m3 = jnp.maximum(m3, demoted)
        a2 = jnp.where(gt1, a1, jnp.where(gt2, s, a2))
        m2 = jnp.where(gt1, m1, jnp.where(gt2, c, m2))
        a1 = jnp.where(gt1, s, a1)
        m1 = jnp.where(gt1, c, m1)

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
    def _():
        cv_ref[...] = jnp.concatenate([rv[s] for s in range(SLOTS)], axis=1)
        ci_ref[...] = jnp.concatenate([ri[s] for s in range(SLOTS)], axis=1)
        gh_ref[...] = gh[...]


@functools.partial(jax.jit, static_argnames=("tile_u", "block_i"))
def stream_sweep(users, items_t, excl_row, tile_u, block_i):
    b, d = users.shape
    i_pad = items_t.shape[1]
    grid = (b // tile_u, i_pad // block_i)
    return pl.pallas_call(
        functools.partial(_stream_kernel, block_i),
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
            jax.ShapeDtypeStruct((b, SLOTS * LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, SLOTS * LANES), jnp.int32),
            jax.ShapeDtypeStruct((b, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((SLOTS, tile_u, LANES), jnp.float32),
            pltpu.VMEM((SLOTS, tile_u, LANES), jnp.int32),
            pltpu.VMEM((tile_u, LANES), jnp.float32),
        ],
    )(users, items_t, excl_row)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--users", type=int, default=1024)
    p.add_argument("--items", type=int, default=270336)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--tile_u", type=int, default=256)
    p.add_argument("--block_i", type=int, default=2048)
    p.add_argument("--only", default="")
    args = p.parse_args()
    only = set(filter(None, args.only.split(",")))

    B, I, D = args.users, args.items, args.dim
    tu, bi = args.tile_u, args.block_i
    pairs = B * I
    rng = np.random.default_rng(0)
    ue = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    ie = jnp.asarray(rng.standard_normal((I, D)).astype(np.float32))
    ie_t = ie.T.copy()
    excl = np.zeros((1, I), np.int8)
    excl[0, rng.choice(I, I // 5, replace=False)] = 1
    excl = jnp.asarray(excl)
    dev = jax.devices()[0]
    print(f"device={getattr(dev, 'device_kind', dev.platform)} "
          f"B={B} I={I} d={D} tile_u={tu} block_i={bi}")

    def report(name, t):
        print(f"{name:<28s} {pairs / t / 1e9:10.1f} G pairs/s   "
              f"({t * 1e6:8.1f} us)")

    if not only or "dotonly" in only:
        report("pallas dot+rowmax", chain_time(
            lambda u: (u + EPS * dot_sweep(u, ie, tu, bi, False)[:, :D],
                       None), ue, args.iters))
        report("pallas dot+rowmax (items^T)", chain_time(
            lambda u: (u + EPS * dot_sweep(u, ie_t, tu, bi, True)[:, :D],
                       None), ue, args.iters))

    if not only or "stream2d" in only:
        def step(u):
            cv, ci, gh = stream_sweep(u, ie_t, excl, tu, bi)
            return u + EPS * (cv[:, :D] + gh[:, :D]), None
        report("pallas stream2d full", chain_time(step, ue, args.iters))

    if not only or "prod" in only:
        from coldrec_tpu.ops.pallas import retrieval as rtr
        ipad = rtr._round_up(I, bi)
        items = jnp.concatenate(
            [ie_t, jnp.zeros((D, ipad - I), ie.dtype)], axis=1)
        excl_row = jnp.asarray(np.concatenate(
            [np.asarray(excl), np.ones((1, ipad - I), np.int8)], axis=1))

        def pstep(u):
            cv, ci, gh = rtr._fused_sweep(u, items, excl_row, tu, bi)
            return u + EPS * cv[:, :D], None
        report("prod kernel (no resolve)", chain_time(pstep, ue, args.iters))


if __name__ == "__main__":
    main()
