"""USIM phase decomposition WITH denominators (round-4 VERDICT task 4).

USIM is the slowest model at scale and ROADMAP #4 claimed "PPO's 5
gradient epochs are the floor" from scheduling experiments alone. This
tool measures each phase of the BX batch step against an in-situ ceiling,
SpMM-roofline style, so the claim carries a fraction-of-bound.

Methodology — stage-truncated program copies, NOT monkeypatching:
an earlier version of this tool replaced ``_optimize_chunked`` with an
identity and re-jitted; that measurement was DOUBLY invalid: (a) jax.jit
defers tracing to the first call, so restoring the real method before the
timing loop silently re-measured the full step, and (b) with an identity
optimize nothing consumes the rollout, and syncing on an output leaf that
aliases an unchanged input returns without waiting. Here each stage is a
separate full jit of a truncated copy of ``_batch_step`` whose outputs
force every remaining phase (a 1e-38 perturbation of the returned critic
by a sum over the rollout transitions), timed by single-call wall with a
changed-leaf fetch, all stages interleaved in ONE process so tunnel
window drift (CLAUDE.md: >30x between windows) cannot skew a comparison.

Phases (reference USIM.py:231-409,524-549):
  rollout    3 x max_time sampling steps + prologue top-ks + stacking
  target     the PPO target pass (lp/q/advantage over all chunks)
  ppo5       5 PPO gradient iterations (the reference's inner epochs)
  inference  the chunked greedy cold-item sweep (_eval_tables)

Ceilings: the hot op everywhere is a (N, d)@(d, n_user) matmul followed
by a full-row reduce (logsumexp or streaming top-k) over ~92k columns —
measured as a chained primitive at the same shapes on the same chip.

Writes tools/USIM_ROOFLINE.json. Requires tools/bx_workdir (build via
`python tools/scale_run.py --model MF`).
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKDIR = os.path.join(REPO, "tools", "bx_workdir")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args_cli = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from coldrec_tpu.config import make_args
    from coldrec_tpu.models import model_factory
    from coldrec_tpu.models.common import linear
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
    m = model_factory(Config(args))
    print(f"build: {time.perf_counter() - t0:.1f}s bs={m.batch_size} "
          f"max_time={m.max_time} n_user={m.n_user} "
          f"cold={m.cold_idx.shape[0]}", flush=True)
    batch = next(iter(m.batches()))
    items = jnp.asarray(batch["items"])
    valid = jnp.asarray(batch["weight"])
    B = int(items.shape[0])

    def sync_arr(x):
        np.asarray(jax.device_get(x.ravel()[0]))
        return x

    def make_step(stage):
        """A copy of _batch_step truncated at `stage`; every retained
        phase feeds the returned critic so nothing can be dead-coded."""

        def step(actor, a_state, critic, c_state, target_actor,
                 target_critic, items, valid, key):
            item_emb = m.item_table[items]
            content = m.content[items]
            _, topk_user = _stream_topk(
                item_emb @ m.user_ext[:-1].T, min(m.k, m.n_user - 1))
            tops = m._target_topk(item_emb)
            state0 = jax.lax.stop_gradient(m._map_content(content))

            def time_step(carry, _):
                state, dones, state_time, key = carry
                key, sk = jax.random.split(key)
                action, pos_i, user_i, neg_i, mam = m._sample_mask(
                    state, item_emb, sk, target_actor, state_time,
                    topk_user=topk_user)
                reward = m._reward(item_emb, state, action, dones, tops)
                ue = m.user_ext[action] * (
                    1.0 - dones.astype(jnp.float32))[:, None]
                next_state = state + ue * m.rate
                new_dones = dones | (action == m.n_user - 1)
                idx_state = jnp.concatenate(
                    [state, state_time[:, None]], 1)
                idx_next = jnp.concatenate(
                    [next_state, (state_time - 1)[:, None]], 1)
                out = (idx_state, action, reward, idx_next, new_dones,
                       pos_i, user_i, neg_i, mam, valid)
                return (next_state, new_dones, state_time - 1, key), out

            def rollout(key, _):
                key, _sub = jax.random.split(key)
                init = (state0, jnp.zeros(B, bool),
                        jnp.full(B, float(m.max_time)), key)
                (_s, _d, _t, key), outs = jax.lax.scan(
                    time_step, init, None, length=m.max_time)
                return key, outs

            key, trans = jax.lax.scan(rollout, key, None, length=3)
            stack = lambda i: trans[i].reshape(
                (-1,) + trans[i].shape[3:]) if trans[i].ndim > 3 \
                else trans[i].reshape(-1)
            b_state, b_action, b_reward, b_next = (
                stack(0), stack(1), stack(2), stack(3))
            b_dones = stack(4).astype(jnp.float32)
            b_idx = (stack(5), stack(6), stack(7), stack(8))
            b_w = stack(9)

            def critic_of(c, s):
                return linear(c["fc1"], s)[:, 0]

            w_sum = jnp.maximum(jnp.sum(b_w), 1.0)
            t_total = b_state.shape[0]
            chunk = items.shape[0]
            n_chunks = t_total // chunk

            def rs(x):
                return x.reshape((n_chunks, chunk) + x.shape[1:])

            xs = (rs(b_state), rs(b_action), rs(b_reward), rs(b_next),
                  rs(b_dones), tuple(rs(i) for i in b_idx), rs(b_w))
            dep = 1e-38 * (jnp.sum(b_reward) + jnp.sum(b_state[0]) + w_sum)

            if stage in ("target", "full"):
                def tgt_body(_, x):
                    s, a, r, nx, dn, idxs, _w = x
                    lp = m._log_probs_masked(target_actor, s, a, idxs)
                    q = r + m.discount * critic_of(target_critic, nx) * (
                        1 - dn)
                    adv = q - critic_of(target_critic, s)
                    return None, (lp, q, adv)

                _, (c_tlp, c_tq, c_adv) = jax.lax.scan(tgt_body, None, xs)
                dep = dep + 1e-38 * (jnp.sum(c_tlp) + jnp.sum(c_tq)
                                     + jnp.sum(c_adv))
            if stage in ("iters", "full"):
                if stage == "iters":
                    z = rs(jnp.zeros(t_total))
                    c_tlp = c_tq = c_adv = z
                xs_full = xs + tuple(
                    jax.lax.stop_gradient(t) for t in (c_tlp, c_tq, c_adv))

                def ppo_iter(carry, _):
                    actor, a_state, critic, c_state = carry

                    def chunk_losses(a, c, x):
                        s, act, _r, _nx, _dn, idxs, w, tlp, tq, adv = x
                        lp = m._log_probs_masked(a, s, act, idxs)
                        ratio = jnp.exp(lp - tlp)
                        surr1 = ratio * adv
                        surr2 = jnp.clip(ratio, 0.8, 1.2) * adv
                        la = jnp.sum(-jnp.minimum(surr1, surr2) * w) / w_sum
                        lc = jnp.sum(
                            (critic_of(c, s) - tq) ** 2 * w) / w_sum
                        return la, lc

                    def accum(g, x):
                        ga = jax.grad(
                            lambda a: chunk_losses(a, critic, x)[0])(actor)
                        gc = jax.grad(
                            lambda c: chunk_losses(actor, c, x)[1])(critic)
                        return (
                            jax.tree_util.tree_map(jnp.add, g[0], ga),
                            jax.tree_util.tree_map(jnp.add, g[1], gc),
                        ), None

                    zeros = (
                        jax.tree_util.tree_map(jnp.zeros_like, actor),
                        jax.tree_util.tree_map(jnp.zeros_like, critic),
                    )
                    (ga, gc), _ = jax.lax.scan(accum, zeros, xs_full)
                    upd, a_state = m.actor_opt.update(ga, a_state, actor)
                    actor = optax.apply_updates(actor, upd)
                    upd, c_state = m.critic_opt.update(gc, c_state, critic)
                    critic = optax.apply_updates(critic, upd)
                    return (actor, a_state, critic, c_state), None

                (actor, a_state, critic, c_state), _ = jax.lax.scan(
                    ppo_iter, (actor, a_state, critic, c_state), None,
                    length=m.n_ppo)

            critic = jax.tree_util.tree_map(lambda x: x + dep, critic)
            return actor, a_state, critic, c_state, actor, critic

        return step

    def run(fn, n):
        st = (m.actor, m.actor_state, m.critic, m.critic_state,
              m.target_actor, m.target_critic)
        out = fn(*st, items, valid, jax.random.PRNGKey(0))
        sync_arr(out[2]["fc1"]["w"])
        ts = []
        for i in range(n):
            t0 = time.perf_counter()
            out = fn(*out[:4], out[4], out[5], items, valid,
                     jax.random.PRNGKey(i + 1))
            sync_arr(out[2]["fc1"]["w"])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    stages = {}
    for stage in ("rollout", "target", "iters", "full"):
        stages[stage] = run(jax.jit(make_step(stage)), args_cli.reps)
        print(f"stage {stage:8s} {stages[stage] * 1e3:9.1f} ms", flush=True)
    t_real = run(m._train_step, args_cli.reps)
    print(f"real step     {t_real * 1e3:9.1f} ms", flush=True)

    t_roll = stages["rollout"]
    t_target = max(stages["target"] - t_roll, 0.0)
    t_ppo5 = max(stages["iters"] - t_roll, 0.0)

    # inference sweep (host-chunked; wall IS the production cost)
    m._eval_tables()
    best_inf = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = m._eval_tables()
        sync_arr(out[1])
        best_inf = min(best_inf, time.perf_counter() - t0)
    print(f"inference     {best_inf * 1e3:9.1f} ms/epoch", flush=True)

    # in-situ primitive ceilings at the same shapes
    d = m.emb_size
    n_user = m.n_user - 1
    emb0 = jnp.asarray(np.random.default_rng(0).standard_normal(
        (B, d + 1)).astype(np.float32))
    wmat = jnp.asarray(np.random.default_rng(1).standard_normal(
        (n_user, d + 1)).astype(np.float32))

    def prim_chain(body, iters):
        @functools.partial(jax.jit, static_argnames=("length",))
        def runp(x, length):
            def stepp(x, _):
                return body(x), None

            x, _ = jax.lax.scan(stepp, x, None, length=length)
            return x

        def timed(n):
            x = runp(emb0, n)
            sync_arr(x)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                x = runp(x, n)
                sync_arr(x)
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

    mt = m.max_time
    n_chunks = 3 * mt
    # rollout: per step 2 matmul+reduce + 1 stream-topk; + 2 hoisted topks
    roll_floor = 3 * mt * (2 * t_mm_lse + t_mm_topk) + 2 * t_mm_topk
    # target: 1 matmul+lse per chunk; ppo iter: fwd + ~2 bwd equivalents
    target_floor = n_chunks * t_mm_lse
    ppo5_floor = m.n_ppo * n_chunks * 3 * t_mm_lse
    blk = m._infer_blk
    inf_floor = (int(np.ceil(m.cold_idx.shape[0] / blk)) * mt
                 * t_mm_lse * (blk / B))

    n_batches = int(np.ceil(np.unique(
        m.data.train_pairs[:, 1]).shape[0] / m.batch_size))

    def frac(floor, got):
        return round(floor / got, 3) if got > 0 else None

    out = {
        "config": {"bs": B, "max_time": mt, "n_user": m.n_user,
                   "n_cold": int(m.cold_idx.shape[0]), "n_ppo": m.n_ppo,
                   "infer_blk": int(blk), "batches_per_epoch": n_batches},
        "stage_walls_ms": {k: round(v * 1e3, 1) for k, v in stages.items()},
        "real_step_ms": round(t_real * 1e3, 1),
        "phases_ms_per_batch": {
            "rollout_and_overhead": round(t_roll * 1e3, 1),
            "ppo_target_prep": round(t_target * 1e3, 1),
            "ppo_5_iterations": round(t_ppo5 * 1e3, 1),
            "ppo_per_iteration": round(t_ppo5 / m.n_ppo * 1e3, 1),
        },
        "phase_share_of_step": {
            "rollout_and_overhead": round(t_roll / t_real, 3),
            "ppo_target_prep": round(t_target / t_real, 3),
            "ppo_5_iterations": round(t_ppo5 / t_real, 3),
        },
        "inference_ms_per_epoch": round(best_inf * 1e3, 1),
        "ceilings_ms": {
            "matmul_lse_rowreduce": round(t_mm_lse * 1e3, 2),
            "matmul_stream_topk": round(t_mm_topk * 1e3, 2),
        },
        "floor_fraction": {
            "rollout_and_overhead": frac(roll_floor, t_roll),
            "ppo_target_prep": frac(target_floor, t_target),
            "ppo_5_iterations": frac(ppo5_floor, t_ppo5),
            "inference": frac(inf_floor, best_inf),
        },
        "epoch_accounting_s": {
            "train_phase": round(t_real * n_batches, 1),
            "inference": round(best_inf, 1),
            "total_excl_eval": round(t_real * n_batches + best_inf, 1),
        },
        "consistency_check": {
            "sum_of_phases_ms": round(
                (t_roll + t_target + t_ppo5) * 1e3, 1),
            "full_stage_ms": round(stages["full"] * 1e3, 1),
        },
        "methodology": (
            "stage-truncated full jits (each later stage adds one phase; "
            "outputs force all retained phases), single-call wall with "
            "changed-leaf fetch, all stages interleaved in one process; "
            "ceilings are the chained (N,d)@(d,n_user) matmul + full-row "
            "reduce primitive at the same shapes on the same chip"
        ),
    }
    path = os.path.join(REPO, "tools", "USIM_ROOFLINE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print(f"-> {path}", flush=True)


if __name__ == "__main__":
    main()
