"""Decompose the fused MF train step's 3.47 ms at BX table shapes.

bench.py::bench_mf_train_step measures ~3.47 ms/step against a ~0.9 ms
HBM floor (dense Adam over 92.6 MB of params x3 states + dense grad
materialization). This times the pieces with the same two-point
chained-scan methodology to find where the other ~2.5 ms goes:

  * adam-only   — optimizer.update + apply on PRECOMPUTED dense grads;
  * grad-only   — value_and_grad of the BPR loss (zeros + 3 scatters);
  * full step   — grad + adam (the bench's body);
  * seg-grad    — grads via bincount-style segment_sum reformulation.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from coldrec_tpu.models.common import adam, xavier_uniform


# sorted-scatter-backward gather (the candidate that won 3.1x in isolation
# — tools/exp_scatter_variants.py — but ties in the full step below, which
# is why models keep plain indexing; see the NOTE in models/common.py)
@jax.custom_vjp
def lookup(table, ids):
    return table[ids]


def _lookup_fwd(table, ids):
    return table[ids], (table, ids)


def _lookup_bwd(res, ct):
    table, ids = res
    flat_ids = ids.reshape(-1)
    flat_ct = ct.reshape(flat_ids.shape[0], table.shape[1])
    order = jnp.argsort(flat_ids)
    dtable = (
        jnp.zeros_like(table)
        .at[flat_ids[order]]
        .add(flat_ct[order].astype(table.dtype), indices_are_sorted=True)
    )
    return dtable, np.zeros(ids.shape, jax.dtypes.float0)


lookup.defvjp(_lookup_fwd, _lookup_bwd)
from coldrec_tpu.ops.losses import bpr_loss, l2_reg_loss

N_USERS, N_ITEMS, DIM, BS, REG = 92_107, 270_170, 64, 4096, 1e-4
N_ITER = 32


def chain(fn, carry, aux, iters=N_ITER):
    """Two-point dispatch subtraction over a chained scan."""

    def timed(n):
        @jax.jit
        def run(c):
            def body(c, b):
                return fn(c, b), None

            xs = (jax.tree.map(lambda a: a[:n], aux)
                  if aux is not None else None)
            c, _ = jax.lax.scan(body, c, xs, length=n)
            return c

        jax.block_until_ready(run(carry))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(carry))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(iters) - timed(iters // 2)) / (iters // 2)


def main():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "user_emb": xavier_uniform(k1, (N_USERS, DIM)),
        "item_emb": xavier_uniform(k2, (N_ITEMS, DIM)),
    }
    optimizer = adam(1e-3)
    opt_state = optimizer.init(params)
    rng = np.random.default_rng(3)
    batches = {
        "user": jnp.asarray(rng.integers(0, N_USERS, (N_ITER, BS), dtype=np.int32)),
        "pos_item": jnp.asarray(rng.integers(0, N_ITEMS, (N_ITER, BS), dtype=np.int32)),
        "neg_item": jnp.asarray(rng.integers(0, N_ITEMS, (N_ITER, BS), dtype=np.int32)),
        "weight": jnp.ones((N_ITER, BS), jnp.float32),
    }

    def loss_fn(p, b):
        u = p["user_emb"][b["user"]]
        pos = p["item_emb"][b["pos_item"]]
        neg = p["item_emb"][b["neg_item"]]
        w = b["weight"]
        return bpr_loss(u, pos, neg, w) + l2_reg_loss(REG, u, pos, neg, weight=w)

    # --- full step (bench body) ---
    def full(carry, b):
        p, o = carry
        loss, g = jax.value_and_grad(loss_fn)(p, b)
        upd, o = optimizer.update(g, o, p)
        return (optax.apply_updates(p, upd) , o)

    t = chain(lambda c, b: full(c, b), (params, opt_state), batches)
    print(f"full step : {t*1e3:7.3f} ms", flush=True)

    # --- full step with the sorted-scatter lookup (models/common.py) ---
    def loss_fn_sorted(p, b):
        u = lookup(p["user_emb"], b["user"])
        pos = lookup(p["item_emb"], b["pos_item"])
        neg = lookup(p["item_emb"], b["neg_item"])
        w = b["weight"]
        return bpr_loss(u, pos, neg, w) + l2_reg_loss(REG, u, pos, neg, weight=w)

    def full_sorted(carry, b):
        p, o = carry
        loss, g = jax.value_and_grad(loss_fn_sorted)(p, b)
        upd, o = optimizer.update(g, o, p)
        return (optax.apply_updates(p, upd), o)

    t = chain(full_sorted, (params, opt_state), batches)
    print(f"full step (sorted lookup): {t*1e3:7.3f} ms", flush=True)

    # --- grad-only (dense zeros + scatter-adds) ---
    def gradonly(p, b):
        _, g = jax.value_and_grad(loss_fn)(p, b)
        return jax.tree.map(lambda x, gg: x + 1e-38 * gg, p, g)

    t = chain(gradonly, params, batches)
    print(f"grad only : {t*1e3:7.3f} ms", flush=True)

    # --- adam-only on fixed dense grads ---
    fixed_g = jax.tree.map(lambda x: (1e-3 * jnp.ones_like(x)), params)

    def adamonly(carry, b):
        p, o = carry
        upd, o = optimizer.update(fixed_g, o, p)
        return (optax.apply_updates(p, upd), o)

    t = chain(adamonly, (params, opt_state), batches)
    print(f"adam only : {t*1e3:7.3f} ms", flush=True)

    # --- lookup+loss only (no backward) ---
    def fwdonly(p, b):
        l = loss_fn(p, b)
        return jax.tree.map(lambda x: x + 1e-38 * l, p)

    t = chain(fwdonly, params, batches)
    print(f"fwd only  : {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
