"""TPU scatter-add variants for the MF train-step backward.

The dense-grad build (zeros.at[idx].add(rows) for 4096-12288 random rows
into a 270k x 64 table) costs ~1.2 ms of the 2.9 ms fused step
(tools/exp_mf_step_decomp.py) vs a ~0.15 ms write floor. XLA:TPU
serializes scatter-adds when indices may repeat; variants:

  v0 baseline        zeros.at[idx].add(g)
  v1 sorted          rows sorted by idx, indices_are_sorted=True
  v2 unique          duplicates pre-combined per sorted run (prefix-sum
                     difference), each non-first row redirected to its
                     own distinct dump row -> indices truly UNIQUE, so
                     unique_indices=True is honest and XLA can scatter
                     without read-modify-write ordering.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N_ITEMS, DIM, B, N_ITER = 270_170, 64, 12_288, 32


def chain(fn, xs):
    def timed(n):
        @jax.jit
        def run(c):
            def body(c, x):
                out = fn(x)
                return c + 1e-38 * out[0, :1], None

            c, _ = jax.lax.scan(
                body, c, jax.tree.map(lambda a: a[:n], xs), length=n
            )
            return c

        c0 = jnp.zeros((1,), jnp.float32)
        jax.block_until_ready(run(c0))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(c0))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(N_ITER) - timed(N_ITER // 2)) / (N_ITER // 2)


def v0(x):
    return jnp.zeros((N_ITEMS, DIM), jnp.float32).at[x["idx"]].add(x["g"])


def v1(x):
    order = jnp.argsort(x["idx"])
    si, sg = x["idx"][order], x["g"][order]
    return jnp.zeros((N_ITEMS, DIM), jnp.float32).at[si].add(
        sg, indices_are_sorted=True
    )


def v2(x):
    order = jnp.argsort(x["idx"])
    si, sg = x["idx"][order], x["g"][order]
    row = jnp.arange(B, dtype=jnp.int32)
    is_first = jnp.concatenate([jnp.ones((1,), bool), si[1:] != si[:-1]])
    is_last = jnp.concatenate([si[1:] != si[:-1], jnp.ones((1,), bool)])
    # run sum landed on each run's FIRST row: prefix[last] - prefix[first-1]
    prefix = jnp.cumsum(sg, axis=0)
    last_of_run = jax.lax.associative_scan(
        jnp.minimum, jnp.where(is_last, row, B - 1), reverse=True
    )
    base = jnp.where((row > 0)[:, None], prefix[jnp.maximum(row - 1, 0)], 0.0)
    run_sum = prefix[last_of_run] - base  # correct at is_first rows
    # each non-first row gets its OWN dump slot -> indices globally unique
    tgt = jnp.where(is_first, si, N_ITEMS + row)
    out = jnp.zeros((N_ITEMS + B, DIM), jnp.float32).at[tgt].add(
        jnp.where(is_first[:, None], run_sum, 0.0), unique_indices=True
    )
    return out[:N_ITEMS]


def main():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N_ITEMS, (N_ITER, B), dtype=np.int32))
    g = jnp.asarray(rng.standard_normal((N_ITER, B, DIM)).astype(np.float32))
    xs = {"idx": idx, "g": g}

    # correctness first (tiny shapes, CPU-friendly sizes still on device)
    ref = np.zeros((N_ITEMS, DIM), np.float32)
    np.add.at(ref, np.array(idx[0]), np.array(g[0]))
    for name, fn in (("v1", v1), ("v2", v2)):
        got = np.array(fn({"idx": idx[0], "g": g[0]}))
        err = np.abs(got - ref).max()
        print(f"{name} max|err| = {err:.2e}", flush=True)
        assert err < 1e-3, name

    for name, fn in (("v0 baseline", v0), ("v1 sorted", v1), ("v2 unique", v2)):
        t = chain(fn, xs)
        print(f"{name}: {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
