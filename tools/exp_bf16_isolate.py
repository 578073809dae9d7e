"""bf16 vs f32 sweep decomposition (round-4 serving A/B diagnosis).

Times the RAW fused sweep (no resolve, no pad-in-loop) with
  (a) f32 operands,
  (b) bf16 operands PRE-CAST outside the timed chain,
and then the full _sweep_padded chain (pad+cast inside, as serving pays)
for both dtypes. Separates "bf16 kernel is slow" from "per-call cast/pad
is slow".

History: the first round-4 A/B measured "bf16" at 0.08x of fp32. This
script showed the kernel itself is FASTER in bf16 (296.6 vs 253.1 G raw)
and the padded path fine in both dtypes, which cornered the real cause:
ubench_serving passed ``bf16`` positionally into ``_sweep_padded``'s
``interpret`` slot, so the "bf16" arm was actually fp32 under Pallas
INTERPRET mode. ``_sweep_padded``'s flags are keyword-only now.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from coldrec_tpu.ops.pallas.retrieval import (
    _fused_sweep, _round_up, _sweep_padded, default_block_i,
)

N_ITEMS, N_USERS, D, K, BS, ITERS = 270_336, 92_107, 64, 20, 4096, 20


def chain_raw(users, items_t, excl_row, tile_u, block_i, n_iter):
    @jax.jit
    def run(u):
        def body(u, _):
            cv, ci, gh = _fused_sweep(u, items_t, excl_row, tile_u, block_i,
                                      False)
            dep = cv[:, :1].astype(u.dtype)
            return u + 0 * dep, None

        u, _ = jax.lax.scan(body, u, None, length=n_iter)
        return u

    jax.block_until_ready(run(users))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(users))
        best = min(best, time.perf_counter() - t0)
    return best / n_iter


def main():
    rng = np.random.default_rng(0)
    ue = rng.standard_normal((BS, D)).astype(np.float32)
    ie = rng.standard_normal((N_ITEMS, D)).astype(np.float32)
    block_i = default_block_i(N_ITEMS)
    i_pad = _round_up(N_ITEMS, block_i)
    b_pad = _round_up(BS, 256)
    tile_u = 256
    print(f"block_i={block_i} i_pad={i_pad} tile_u={tile_u}")

    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        users = jnp.zeros((b_pad, D), dt).at[:BS].set(ue.astype(dt))
        items_t = jnp.zeros((D, i_pad), dt).at[:, :N_ITEMS].set(
            jnp.asarray(ie.astype(dt)).T
        )
        excl_row = jnp.zeros((1, i_pad), jnp.int8)
        t = chain_raw(users, items_t, excl_row, tile_u, block_i, ITERS)
        print(f"raw sweep {name}: {t*1e3:8.2f} ms  "
              f"({BS*N_ITEMS/t/1e9:.1f} G pairs/s)")

    # full serving path (pad+cast inside jit per call)
    rated = jnp.full((BS, 1), N_ITEMS, jnp.int32)
    excluded = jnp.zeros(N_ITEMS, bool)
    ued, ied = jnp.asarray(ue), jnp.asarray(ie)
    for name, bf16 in (("f32", False), ("bf16", True)):
        @jax.jit
        def run(u):
            def body(u, _):
                vals, _, sus = _sweep_padded(
                    u, ied, rated, excluded, i_pad, b_pad, tile_u, block_i,
                    K, bf16=bf16,
                )
                dep = vals[:, :1] + sus[:, None].astype(u.dtype)
                return u + 0 * dep, None

            u, _ = jax.lax.scan(body, u, None, length=ITERS)
            return u

        jax.block_until_ready(run(ued))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(ued))
            best = min(best, time.perf_counter() - t0)
        t = best / ITERS
        print(f"padded path {name}: {t*1e3:8.2f} ms  "
              f"({BS*N_ITEMS/t/1e9:.1f} G pairs/s)")


if __name__ == "__main__":
    main()
