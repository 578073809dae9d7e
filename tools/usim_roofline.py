"""USIM phase decomposition WITH denominators (round-4 VERDICT task 4).

USIM is the slowest model at scale (592.8 s/epoch BX first-run in the r3
sweep) and ROADMAP #4 claims "PPO's 5 gradient epochs are the floor" from
scheduling experiments alone. This tool proves or refutes that claim the
way the SpMM roofline did: measure each phase of one book-crossing epoch
AND an in-situ ceiling for it, so every phase carries a fraction-of-bound.

Phases (reference USIM.py:231-409,524-549):
  * rollout       — 3 x max_time sampling steps (t_full with n_ppo=0 ...
                    actually measured as the identity-optimize variant);
  * optimize      — target prep + n_ppo PPO gradient passes, isolated two
                    ways: (t_full - t_rollout) and (t_ppo5 - t_ppo1)/4 per
                    extra iteration;
  * inference     — the chunked greedy cold-item sweep (_eval_tables).

Ceiling: every hot op in all three phases is a (N, d)@(d, n_user) matmul
followed by a full-row reduction (logsumexp or streaming top-k) over
n_user ~ 92k columns — so the in-situ ceiling is the measured rate of
exactly that primitive chain at the same shapes on this chip (same
methodology as bench.py's measured gather ceiling for the SpMM). The
analytic matmul-equivalent counts per phase:

  rollout:   3*max_time steps x (2 matmul + 1 topk + 1 lse row-reduce)
             + 2 hoisted matmul+topk (item top-k planes, computed once)
  optimize:  n_chunks x [1 (target lse) + n_ppo x 3 (fwd z + softmax-bwd
             plane + dz@user_ext)] matmul-equivalents, n_chunks = 3*max_time
  inference: ceil(n_cold/blk) x max_time x (1 matmul + 1 lse)

All device timings use the two-point chained-dependency rule (CLAUDE.md):
sequential dependent calls (params feed the next call) timed at K and K/2
calls; the difference cancels the constant dispatch+sync cost.

Writes tools/USIM_ROOFLINE.json. Requires the cached BX dataset
(tools/bx_workdir — build via `python tools/scale_run.py --model MF`).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKDIR = os.path.join(REPO, "tools", "bx_workdir")


def device_sync(out):
    import jax

    leaf = [x for x in jax.tree_util.tree_leaves(out)
            if hasattr(x, "ravel")][0]
    np.asarray(jax.device_get(leaf.ravel()[0]))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=4,
                    help="long-chain length K (short = K/2)")
    args_cli = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from coldrec_tpu.config import make_args
    from coldrec_tpu.models import model_factory
    from coldrec_tpu.models.usim import _stream_topk
    from coldrec_tpu.runtime.trainer import Config
    from coldrec_tpu.utils.seeding import set_seed

    argv = [
        "--dataset", "bx", "--model", "USIM", "--cold_object", "item",
        "--data_dir", os.path.join(WORKDIR, "data"),
        "--emb_dir", os.path.join(WORKDIR, "emb"),
        "--backbone", "MF",
    ]
    args = make_args(argv)
    set_seed(args.seed)
    t0 = time.perf_counter()
    model = model_factory(Config(args))
    print(f"build: {time.perf_counter() - t0:.1f}s bs={model.batch_size} "
          f"max_time={model.max_time} n_user={model.n_user} "
          f"cold={model.cold_idx.shape[0]}", flush=True)

    batch = next(iter(model.batches()))
    items = jnp.asarray(batch["items"])
    valid = jnp.asarray(batch["weight"])
    B = int(items.shape[0])
    K = args_cli.chain

    def chained_step(step_fn, length):
        """Sequential dependent calls: each call's actor/critic feed the
        next, so no dispatch can be memoized; returns total wall for
        `length` calls after one warm/compile call."""
        state = (model.actor, model.actor_state, model.critic,
                 model.critic_state, model.target_actor, model.target_critic)
        key = jax.random.PRNGKey(0)
        out = step_fn(*state, items, valid, key)  # compile + warm
        device_sync(out)
        best = float("inf")
        for rep in range(2):
            cur = out
            t0 = time.perf_counter()
            for i in range(length):
                key = jax.random.PRNGKey(rep * length + i + 1)
                cur = step_fn(*cur[:4], cur[4], cur[5], items, valid, key)
            device_sync(cur)
            best = min(best, time.perf_counter() - t0)
        return best

    def two_point(step_fn):
        return (chained_step(step_fn, K) - chained_step(step_fn, K // 2)) / (
            K - K // 2)

    # ---- full step (n_ppo=5, production)
    t_full = two_point(model._train_step)
    print(f"full batch step        {t_full * 1e3:9.1f} ms", flush=True)

    # ---- n_ppo=1 variant: isolates the per-PPO-iteration cost
    model.n_ppo = 1
    step_ppo1 = jax.jit(model._batch_step)
    t_ppo1 = two_point(step_ppo1)
    model.n_ppo = 5
    print(f"n_ppo=1 batch step     {t_ppo1 * 1e3:9.1f} ms", flush=True)
    t_ppo_iter = max(t_full - t_ppo1, 0.0) / 4

    # ---- rollout-only (identity optimize)
    orig_dense, orig_chunk = model._optimize_dense, model._optimize_chunked
    ident = lambda actor, a_state, critic, c_state, *rest: (
        actor, a_state, critic, c_state)
    model._optimize_dense = ident
    model._optimize_chunked = ident
    step_roll = jax.jit(model._batch_step)
    t_roll = two_point(step_roll)
    model._optimize_dense, model._optimize_chunked = orig_dense, orig_chunk
    print(f"rollout-only step      {t_roll * 1e3:9.1f} ms", flush=True)

    t_opt = max(t_full - t_roll, 0.0)
    t_target_prep = max(t_opt - 5 * t_ppo_iter, 0.0)

    # ---- inference sweep (host-chunked; wall is the production cost)
    model._eval_tables()  # warm
    best_inf = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        device_sync(model._eval_tables())
        best_inf = min(best_inf, time.perf_counter() - t0)
    print(f"inference sweep        {best_inf * 1e3:9.1f} ms", flush=True)

    # ---- in-situ ceilings: the same primitive at the same shapes,
    # chained inside ONE jit (scan) with the two-point subtraction
    d = model.emb_size
    n_user = model.n_user - 1
    emb0 = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, d + 1)).astype(
            np.float32))
    wmat = jnp.asarray(
        np.random.default_rng(1).standard_normal((n_user, d + 1)).astype(
            np.float32))

    def prim_chain(body, iters):
        import functools

        @functools.partial(jax.jit, static_argnames=("length",))
        def run(x, length):
            def step(x, _):
                return body(x), None

            x, _ = jax.lax.scan(step, x, None, length=length)
            return x

        def timed(n):
            x = device_sync(run(emb0, n))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                x = device_sync(run(x, n))
                best = min(best, time.perf_counter() - t0)
            return best

        return (timed(2 * iters) - timed(iters)) / iters

    def mm_lse(x):
        z = x[:, : d + 1] @ wmat.T
        lse = jax.nn.logsumexp(z, axis=1)
        return x + 1e-38 * lse[:, None]

    def mm_topk(x):
        z = x[:, : d + 1] @ wmat.T
        v, _ = _stream_topk(z, 10)
        return x + 1e-38 * v[:, :1]

    t_mm_lse = prim_chain(mm_lse, 8)
    t_mm_topk = prim_chain(mm_topk, 8)
    print(f"ceiling matmul+lse     {t_mm_lse * 1e3:9.1f} ms  "
          f"matmul+topk {t_mm_topk * 1e3:9.1f} ms", flush=True)

    # ---- analytic matmul-equivalent counts
    mt = model.max_time
    roll_floor = 3 * mt * (t_mm_lse + t_mm_topk + t_mm_lse) + 2 * t_mm_topk
    n_chunks = 3 * mt
    opt_iter_floor = n_chunks * 3 * t_mm_lse
    opt_target_floor = n_chunks * t_mm_lse
    blk = model._infer_blk
    n_inf_chunks = int(np.ceil(model.cold_idx.shape[0] / blk))
    inf_floor = n_inf_chunks * mt * t_mm_lse * (blk / B)

    n_batches = int(np.ceil(
        np.unique(model.data.train_pairs[:, 1]).shape[0] / model.batch_size))

    def frac(floor, got):
        return round(floor / got, 3) if got > 0 else None

    out = {
        "config": {"bs": B, "max_time": mt, "n_user": model.n_user,
                   "n_cold": int(model.cold_idx.shape[0]),
                   "infer_blk": int(blk), "batches_per_epoch": n_batches},
        "phases_ms_per_batch": {
            "full_step": round(t_full * 1e3, 1),
            "rollout": round(t_roll * 1e3, 1),
            "optimize_total": round(t_opt * 1e3, 1),
            "optimize_per_ppo_iter": round(t_ppo_iter * 1e3, 1),
            "optimize_target_prep": round(t_target_prep * 1e3, 1),
        },
        "inference_ms_per_epoch": round(best_inf * 1e3, 1),
        "ceilings_ms": {
            "matmul_lse_rowreduce": round(t_mm_lse * 1e3, 2),
            "matmul_stream_topk": round(t_mm_topk * 1e3, 2),
        },
        "floor_fraction": {
            "rollout": frac(roll_floor, t_roll),
            "optimize_ppo5": frac(5 * opt_iter_floor,
                                  5 * t_ppo_iter if t_ppo_iter else 1),
            "optimize_target_prep": frac(opt_target_floor, t_target_prep),
            "inference": frac(inf_floor, best_inf),
        },
        "epoch_accounting_s": {
            "train_phase": round(t_full * n_batches, 1),
            "inference": round(best_inf, 1),
            "total_excl_eval": round(t_full * n_batches + best_inf, 1),
        },
        "methodology": (
            "two-point chained-dependency timing (K and K/2 dependent "
            "calls; difference cancels dispatch+sync constants); ceilings "
            "are the measured rate of the same (N,d)@(d,n_user) matmul + "
            "full-row reduce primitive chained inside one jit at the "
            "same shapes on the same chip"
        ),
    }
    path = os.path.join(REPO, "tools", "USIM_ROOFLINE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print(f"-> {path}", flush=True)


if __name__ == "__main__":
    main()
