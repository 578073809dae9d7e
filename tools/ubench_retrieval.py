"""Microbenchmark for the retrieval sweep on the real TPU.

The axon backend is a remote tunnel: per-dispatch timings are unreliable
(dispatch pipelining + slow host link). Every variant is therefore timed as
N dependency-chained iterations inside ONE jitted lax.scan — one dispatch,
pure device time, the chain defeating any overlap between iterations.

Measures, at a given (B users, I items, d) shape:
  * bf16 / fp32 matmul with a cheap consumer (the MXU ceiling for scoring),
  * matmul materializing the (B, I) score plane to HBM,
  * XLA fused masked_topk (the production path, runtime/eval.py),
  * Pallas fused retrieval kernels (ops/pallas/retrieval.py),
and prints G scored-pairs/s. Run with the default env (real TPU).

Usage: python tools/ubench_retrieval.py [--items 270336] [--users 1024]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EPS = 1e-38  # dependency-injection scale: tiny but not constant-foldable


def chain_time(step, carry, n_iter=16, repeats=3, consts=()):
    """step: (carry, *consts) -> (carry, small_aux). Returns seconds per
    iteration. Large operands (e.g. the item table) MUST ride in
    ``consts`` so they enter the jit as arguments — closing over them
    bakes them into the HLO as literal constants and the remote-compile
    tunnel rejects the request body with HTTP 413 above ~100 MB (same
    trap as ops/spmm.py::sym_spmm_arrays)."""
    import jax

    @jax.jit
    def run(c, *cs):
        def body(c, _):
            return step(c, *cs)
        c, _ = jax.lax.scan(body, c, None, length=n_iter)
        return c


    def _sync(a):
        # block_until_ready is a no-op under some axon tunnel builds
        # (bench.py::device_sync): force completion via a 1-element fetch
        import numpy as _np
        _np.asarray(jax.device_get(jax.tree_util.tree_leaves(a)[0].ravel()[0]))
        return a

    carry = _sync(run(carry, *consts))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        carry = _sync(run(carry, *consts))  # fresh carry per rep
        best = min(best, time.perf_counter() - t0)
    return best / n_iter


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--users", type=int, default=1024)
    p.add_argument("--items", type=int, default=270336)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--rated", type=int, default=64)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--only", default="", help="comma list: mm,topk,pallas")
    args = p.parse_args()
    only = set(filter(None, args.only.split(",")))

    import jax
    import jax.numpy as jnp

    from coldrec_tpu.runtime.eval import masked_topk

    B, I, D, K, R = args.users, args.items, args.dim, args.k, args.rated
    dev = jax.devices()[0]
    print(f"device={getattr(dev, 'device_kind', dev.platform)} "
          f"B={B} I={I} d={D} k={K} R={R} iters/chain={args.iters}")
    pairs = B * I

    rng = np.random.default_rng(0)
    ue = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    ie = jnp.asarray(rng.standard_normal((I, D)).astype(np.float32))
    rated = np.full((B, R), I, np.int32)
    nr = rng.integers(R // 4, R, size=B)
    for u in range(B):
        rated[u, : nr[u]] = rng.choice(I, nr[u], replace=False)
    rated = jnp.asarray(rated)
    excl = np.zeros(I, bool)
    excl[rng.choice(I, I // 5, replace=False)] = True
    excl = jnp.asarray(excl)

    def report(name, t):
        print(f"{name:<26s} {pairs / t / 1e9:10.1f} G pairs/s   "
              f"({t * 1e6:8.1f} us)")

    if not only or "mm" in only:
        ieb = ie.astype(jnp.bfloat16)

        def mm_bf16(u, tbl):
            s = jnp.dot(u, tbl.T, preferred_element_type=jnp.float32)
            return u + EPS * s.max(axis=1, keepdims=True).astype(u.dtype)

        report("matmul bf16 (+rowmax)", chain_time(
            lambda c, tbl: (mm_bf16(c, tbl), None), ue.astype(jnp.bfloat16),
            args.iters, consts=(ieb,)))

        def mm_f32(u, tbl):
            s = u @ tbl.T
            return u + EPS * s.max(axis=1, keepdims=True)

        report("matmul fp32 (+rowmax)", chain_time(
            lambda c, tbl: (mm_f32(c, tbl), None), ue, args.iters,
            consts=(ie,)))

        def mm_hbm(u, tbl):
            s = u @ tbl.T  # consumed twice, forcing materialization
            return u + EPS * (s.max(axis=1, keepdims=True)
                              + s.min(axis=1, keepdims=True))

        report("matmul fp32 -> 2 reads", chain_time(
            lambda c, tbl: (mm_hbm(c, tbl), None), ue, args.iters,
            consts=(ie,)))

    if not only or "topk" in only:
        def xla_step(u, tbl, rt, ex):
            vals, _ = masked_topk(u @ tbl.T, rt, ex, K)
            return u + EPS * vals[:, :1]

        report("XLA masked_topk", chain_time(
            lambda c, tbl, rt, ex: (xla_step(c, tbl, rt, ex), None), ue,
            args.iters, consts=(ie, rated, excl)))

    if not only or "pallas" in only:
        from coldrec_tpu.ops.pallas import retrieval as rtr

        block_i = 2048
        ipad = rtr._round_up(I, block_i)
        items = jnp.concatenate(
            [ie.T, jnp.zeros((D, ipad - I), ie.dtype)], axis=1)
        tile_u = 256
        assert B % tile_u == 0, "bench users must be a tile multiple"
        excl_row = np.ones((1, ipad), np.int8)
        excl_row[0, :I] = np.asarray(excl).astype(np.int8)
        excl_row = jnp.asarray(excl_row)

        def pallas_step(u, tbl, ex, rt):
            cv, ci, gh = rtr._fused_sweep(u, tbl, ex, tile_u, block_i)
            v, _, sus = rtr._resolve(cv, ci, gh, rt, K)
            return u + EPS * (v[:, :1] + sus[:, None].astype(u.dtype))

        report("Pallas fused (kernel+resolve)", chain_time(
            lambda c, tbl, ex, rt: (pallas_step(c, tbl, ex, rt), None), ue,
            args.iters, consts=(items, excl_row, rated)))

        cv, ci, gh = rtr._fused_sweep(ue, items, excl_row, tile_u, block_i)
        _, _, sus = rtr._resolve(cv, ci, gh, rated, K)
        print(f"  ghost-flagged users: {int(np.asarray(sus).sum())}/{B} "
              f"(exact-fallback rate)")


if __name__ == "__main__":
    main()
