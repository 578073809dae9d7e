#!/usr/bin/env python
"""On-chip A/B: XLA ELL SpMM (ops/spmm.py::_ell_apply, ELL part) vs the
experimental Pallas blocked kernel (ops/pallas/spmm.py::spmm_ell_pallas).

Decides VERDICT round-1 task 7: wire the Pallas kernel behind make_sym_spmm
if it wins at any real shape, else delete it and record the dead end.

Both paths consume the identical (x, ell_cols, ell_vals) ELL slab (COO tail
excluded on both sides — the tail is shared code either way). Shapes mirror
the repo's two reference scales: MovieLens-like (9.7k nodes / K=56) and
book-crossing-like (347k nodes / K=24); K values come from the 95th-
percentile degree rule in build_ell on power-law degree draws.
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
        vals[start:stop] = np.where(mask, 1.0 / np.maximum(deg[start:stop, None], 1), 0.0).astype(np.float32)
    return cols, vals


def time_fn(fn, *args, repeats=20):
    out = fn(*args)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / repeats


def main():
    import jax
    import jax.numpy as jnp

    from coldrec_tpu.ops.pallas.spmm import spmm_ell_pallas

    print("devices:", jax.devices())
    results = {}
    for name, n, k, d in (
        ("ml", 9728, 56, 64),
        ("bc", 346112, 24, 64),
    ):
        cols_h, vals_h = make_ell(n, k, seed=1)
        x = jnp.asarray(np.random.default_rng(2).standard_normal((n, d)).astype(np.float32))
        cols, vals = jnp.asarray(cols_h), jnp.asarray(vals_h)

        @jax.jit
        def xla_ell(x, cols, vals):
            return jnp.einsum("nk,nkd->nd", vals, x[cols])

        t_xla = time_fn(xla_ell, x, cols, vals)
        rows = {"xla_ms": round(t_xla * 1e3, 3)}
        for tile in (256, 512, 1024):
            if n % tile:
                continue
            try:
                t_p = time_fn(lambda x, c, v, t=tile: spmm_ell_pallas(x, c, v, tile_r=t), x, cols, vals)
                rows[f"pallas_t{tile}_ms"] = round(t_p * 1e3, 3)
            except Exception as e:  # noqa: BLE001
                rows[f"pallas_t{tile}_ms"] = f"ERR {type(e).__name__}: {e}"[:120]
        # correctness spot-check on the last tile that ran
        ref = np.asarray(xla_ell(x, cols, vals))
        try:
            got = np.asarray(spmm_ell_pallas(x, cols, vals, tile_r=512 if n % 512 == 0 else 256))
            rows["max_abs_err"] = float(np.abs(ref - got).max())
        except Exception:
            pass
        results[name] = rows
        print(name, json.dumps(rows))
    print("RESULT", json.dumps(results))


if __name__ == "__main__":
    main()
