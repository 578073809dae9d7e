"""Chained-dependency microbench of fused-retrieval kernel variants.

Same honest methodology as tools/ubench_retrieval.py (N dependency-chained
sweeps inside ONE jitted lax.scan; repeated identical dispatches are
memoized by the remote backend and must not be timed).

Usage: python tools/ubench_kernel_variants.py [--users 4096] [--items 270336]
       [--variant f32_256_2048,bf16_256_2048,...]

Variant naming: <dtype>_<tile_u>_<block_i>.
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

from coldrec_tpu.ops.pallas.retrieval import _round_up, _sweep_padded

DIM = 64
TOP_K = 20
MAX_RATED = 64


def bench_variant(ue, ie, rat, exc, tile_u, block_i, bf16, n_iter=16):
    n_users, n_items = ue.shape[0], ie.shape[0]
    i_pad, b_pad = _round_up(n_items, block_i), _round_up(n_users, tile_u)

    @jax.jit
    def chained(u):
        def body(u, _):
            vals, _, sus = _sweep_padded(
                u, ie, rat, exc, i_pad, b_pad, tile_u, block_i, TOP_K,
                bf16=bf16,
            )
            dep = vals[:, :1] + sus[:, None].astype(u.dtype)
            return u + 1e-38 * dep, None

        u, _ = jax.lax.scan(body, u, None, length=n_iter)
        return u


    def _sync(a):
        # block_until_ready is a no-op under some axon tunnel builds
        # (bench.py::device_sync): force completion via a 1-element fetch
        import numpy as _np
        _np.asarray(jax.device_get(jax.tree_util.tree_leaves(a)[0].ravel()[0]))
        return a

    ue = _sync(chained(ue))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        ue = _sync(chained(ue))  # fresh args per rep: no memoization
        best = min(best, time.perf_counter() - t0)
    return n_iter * n_users * n_items / best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--users", type=int, default=4096)
    p.add_argument("--items", type=int, default=270336)
    p.add_argument(
        "--variant",
        default="f32_256_2048,f32_512_2048,bf16_256_2048,bf16_512_2048",
    )
    args = p.parse_args()

    rng = np.random.default_rng(0)
    ue = jnp.asarray(
        rng.standard_normal((args.users, DIM)).astype(np.float32)
    )
    ie = jnp.asarray(
        rng.standard_normal((args.items, DIM)).astype(np.float32)
    )
    rated = np.full((args.users, MAX_RATED), args.items, dtype=np.int32)
    for u in range(args.users):
        n = rng.integers(MAX_RATED // 4, MAX_RATED)
        rated[u, :n] = rng.choice(args.items, n, replace=False)
    rat = jnp.asarray(rated)
    excl = np.zeros(args.items, dtype=bool)
    excl[rng.choice(args.items, args.items // 5, replace=False)] = True
    exc = jnp.asarray(excl)

    for v in args.variant.split(","):
        dt, tu, bi = v.split("_")
        try:
            pps = bench_variant(ue, ie, rat, exc, int(tu), int(bi),
                                dt == "bf16")
            print(f"{v}: {pps / 1e9:.1f} G pairs/s", flush=True)
        except Exception as e:
            print(f"{v}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
