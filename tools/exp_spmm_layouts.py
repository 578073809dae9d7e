"""ELL SpMM layout experiment (round-4 VERDICT task 4 follow-through).

BENCH_r04's roofline shows the production einsum formulation
(``einsum('nk,nkd->nd', vals, x[cols])``) reaching only ~39% of the
measured random-row-gather ceiling. Hypothesis: XLA materializes the
(N, K, d) gathered operand to HBM, so each edge's 256 B row is written and
re-read once more — tripling traffic vs the minimal schedule. Candidates:

  A  einsum over gathered (N,K,d)          (production, ops/spmm.py)
  B  unrolled sum_k vals[:,k,None]*x[cols[:,k]]  (K gathers of (N,d), no
     3-D intermediate)
  C  lax.scan over K with an (N,d) accumulator (same traffic as B, O(1)
     program size)
  D  dot_general: reshape gather to (N,K,d) then jnp.sum(vals[...,None]*g)
     (control: same materialization as A, different op)

All exact (same adjacency, fp32); timings two-point dispatch-subtracted.

Usage: python tools/exp_spmm_layouts.py [--n 346112] [--k 24] [--d 64]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def two_point_chain(fn, arg, iters):
    import jax

    def timed(n):
        @jax.jit
        def run(a):
            def body(a, _):
                return fn(a), None

            a, _ = jax.lax.scan(body, a, None, length=n)
            return a

        jax.block_until_ready(run(arg))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(arg))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(2 * iters) - timed(iters)) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=346112)
    ap.add_argument("--k", type=int, default=24)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    n, k, d = args.n, args.k, args.d
    rng = np.random.default_rng(1)
    deg = np.minimum(rng.zipf(1.7, n) + 4, k).astype(np.int32)
    cols = np.zeros((n, k), np.int32)
    vals = np.zeros((n, k), np.float32)
    for s in range(0, n, 65536):
        e = min(s + 65536, n)
        c = rng.integers(0, n, (e - s, k), dtype=np.int32)
        m = np.arange(k)[None, :] < deg[s:e, None]
        cols[s:e] = np.where(m, c, 0)
        vals[s:e] = np.where(m, 1.0 / np.maximum(deg[s:e, None], 1), 0.0)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    cols_j, vals_j = jnp.asarray(cols), jnp.asarray(vals)
    cols_t = jnp.asarray(cols.T.copy())  # (K, N) for the scan variant
    vals_t = jnp.asarray(vals.T.copy())

    def ell_einsum(a):
        out = jnp.einsum("nk,nkd->nd", vals_j, a[cols_j])
        return a + 1e-38 * out

    def ell_unrolled(a):
        out = vals_j[:, 0, None] * a[cols_j[:, 0]]
        for j in range(1, k):
            out = out + vals_j[:, j, None] * a[cols_j[:, j]]
        return a + 1e-38 * out

    def ell_scan_k(a):
        def body(acc, kv):
            c, v = kv
            return acc + v[:, None] * a[c], None

        acc, _ = jax.lax.scan(
            body, jnp.zeros_like(a), (cols_t, vals_t)
        )
        return a + 1e-38 * acc

    def ell_mul_sum(a):
        g = a[cols_j]  # (N, K, d)
        out = jnp.sum(vals_j[:, :, None] * g, axis=1)
        return a + 1e-38 * out

    variants = {
        "A_einsum(prod)": ell_einsum,
        "B_unrolled": ell_unrolled,
        "C_scan_k": ell_scan_k,
        "D_mul_sum": ell_mul_sum,
    }
    # exactness vs production first
    ref = np.asarray(jax.jit(ell_einsum)(x))
    bytes_min = n * k * d * 4 + n * k * 8 + n * d * 4
    print(f"n={n} k={k} d={d}  minimal traffic/apply = {bytes_min/1e9:.2f} GB")
    for name, fn in variants.items():
        got = np.asarray(jax.jit(fn)(x))
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)
        t = two_point_chain(fn, x, args.iters)
        print(
            f"{name:16s} {t*1e3:9.2f} ms/apply   "
            f"{bytes_min/t/1e9:7.1f} GB/s (minimal-traffic basis)"
        )


if __name__ == "__main__":
    main()
