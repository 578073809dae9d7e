"""Profile one USIM batch step at book-crossing scale: rollout vs PPO.

Builds USIM on the cached tools/bx_workdir dataset (run
``python tools/scale_run.py --model MF`` first to create it), then times
steady-state:

  * the full jitted ``_batch_step`` (3 rollouts -> PPO(5) -> termination);
  * a rollout-only variant (optimize replaced by identity);
  * the chunked greedy inference sweep over the cold items.

Usage: python tools/profile_usim_bx.py [--bs 1024]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKDIR = os.path.join(REPO, "tools", "bx_workdir")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=0, help="override batch size")
    args_cli = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from coldrec_tpu.config import make_args
    from coldrec_tpu.models import model_factory
    from coldrec_tpu.runtime.trainer import Config
    from coldrec_tpu.utils.seeding import set_seed

    argv = [
        "--dataset", "bx", "--model", "USIM", "--cold_object", "item",
        "--data_dir", os.path.join(WORKDIR, "data"),
        "--emb_dir", os.path.join(WORKDIR, "emb"),
        "--backbone", "MF",
    ]
    if args_cli.bs:
        argv += ["--bs", str(args_cli.bs)]
    args = make_args(argv)
    set_seed(args.seed)
    t0 = time.perf_counter()
    model = model_factory(Config(args))
    print(f"build: {time.perf_counter() - t0:.1f}s  "
          f"bs={model.batch_size} max_time={model.max_time} "
          f"n_user={model.n_user} items={model.data.item_num}", flush=True)

    batch = next(iter(model.batches()))
    items = jnp.asarray(batch["items"])
    valid = jnp.asarray(batch["weight"])
    step_args = lambda key: (
        model.actor, model.actor_state, model.critic, model.critic_state,
        model.target_actor, model.target_critic, items, valid, key,
    )

    def timeit(name, fn, n=3):
        k = jax.random.PRNGKey(0)
        out = fn(k)  # compile
        jax.block_until_ready(out)
        best = float("inf")
        for i in range(n):
            k = jax.random.PRNGKey(i + 1)
            t0 = time.perf_counter()
            jax.block_until_ready(fn(k))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:24s} {best * 1e3:8.1f} ms", flush=True)
        return best

    full = timeit("full _batch_step", lambda k: model._train_step(
        *step_args(k)))

    # rollout-only: identity optimize
    orig_dense, orig_chunk = model._optimize_dense, model._optimize_chunked
    ident = lambda actor, a_state, critic, c_state, *rest: (
        actor, a_state, critic, c_state)
    model._optimize_dense = ident
    model._optimize_chunked = ident
    rollout_step = jax.jit(model._batch_step)
    roll = timeit("rollout-only", lambda k: rollout_step(*step_args(k)))
    model._optimize_dense, model._optimize_chunked = orig_dense, orig_chunk

    print(f"{'=> optimize phase':24s} {(full - roll) * 1e3:8.1f} ms", flush=True)

    t0 = time.perf_counter()
    model._eval_tables()
    print(f"{'inference sweep (cold)':24s} {(time.perf_counter() - t0) * 1e3:8.1f} ms"
          f"  ({model.cold_idx.shape[0]} cold items)", flush=True)

    n_batches = int(np.ceil(
        np.unique(model.data.train_pairs[:, 1]).shape[0] / model.batch_size))
    print(f"batches/epoch: {n_batches}  -> est. train phase "
          f"{full * n_batches:.1f}s/epoch", flush=True)


if __name__ == "__main__":
    main()
