#!/usr/bin/env python
"""On-chip timing of the XLA ELL SpMM slab (ops/spmm.py::_ell_apply, ELL
part) at the repo's two reference scales.

Historical note (VERDICT round-1 task 7): this tool originally A/B'd an
experimental Pallas blocked ELL kernel against this XLA path. The kernel
lost on both counts — Mosaic rejects the dynamic row gather outright on
this toolchain, and the op is random-HBM-gather-bound so a hand kernel
has no bandwidth to win back — and was deleted (PERF.md "Measured dead
end"). The XLA-side measurement remains useful for tracking the SpMM
workhorse round over round: 0.033 ms at the ML-like slab, ~124 ms at the
book-crossing-like slab.

Shapes: MovieLens-like (9.7k nodes / K=56) and book-crossing-like
(347k nodes / K=24); K values come from the 95th-percentile degree rule
in build_ell on power-law degree draws.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_ell(n, k, seed):
    rng = np.random.default_rng(seed)
    # power-law-ish degrees truncated at k (ELL slab only)
    deg = np.minimum(rng.zipf(1.7, n) + 4, k)
    cols = np.zeros((n, k), np.int32)
    vals = np.zeros((n, k), np.float32)
    for start in range(0, n, 65536):
        stop = min(start + 65536, n)
        block = stop - start
        c = rng.integers(0, n, (block, k), dtype=np.int32)
        mask = np.arange(k)[None, :] < deg[start:stop, None]
        cols[start:stop] = np.where(mask, c, 0)
        vals[start:stop] = np.where(
            mask, 1.0 / np.maximum(deg[start:stop, None], 1), 0.0
        ).astype(np.float32)
    return cols, vals


def time_chained(apply_fn, x, cols, vals, n_iter=20):
    """Dependency-chained timing: each iteration consumes the previous
    output, so the remote backend cannot memoize repeated identical
    dispatches (the round-1 artifact documented in PERF.md 'Honest
    retrieval timings')."""
    import jax

    @jax.jit
    def chained(x):
        def body(x, _):
            y = apply_fn(x, cols, vals)
            return x + 1e-38 * y, None

        x, _ = jax.lax.scan(body, x, None, length=n_iter)
        return x


    def _sync(a):
        # block_until_ready is a no-op under some axon tunnel builds
        # (bench.py::device_sync): force completion via a 1-element fetch
        import numpy as _np
        _np.asarray(jax.device_get(jax.tree_util.tree_leaves(a)[0].ravel()[0]))
        return a

    x = _sync(chained(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        x = _sync(chained(x))  # fresh args per rep: no memoization
        best = min(best, time.perf_counter() - t0)
    return best / n_iter


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices())
    results = {}
    for name, n, k, d in (
        ("ml", 9728, 56, 64),
        ("bc", 346112, 24, 64),
    ):
        cols_h, vals_h = make_ell(n, k, seed=1)
        x = jnp.asarray(
            np.random.default_rng(2).standard_normal((n, d)).astype(np.float32)
        )
        cols, vals = jnp.asarray(cols_h), jnp.asarray(vals_h)

        def xla_ell(x, cols, vals):
            return jnp.einsum("nk,nkd->nd", vals, x[cols])

        t_xla = time_chained(xla_ell, x, cols, vals)
        results[name] = {"xla_ms": round(t_xla * 1e3, 3)}
        print(name, json.dumps(results[name]))
    print("RESULT", json.dumps(results))


if __name__ == "__main__":
    main()
