"""USIM book-crossing-scale phase profile (round-2 VERDICT weak #3).

USIM is the slowest model in the BX sweep (592.8 s/epoch first-run, 455.1
steady). One epoch = 163 train batches (rollout 3x max_time + chunked
PPO(5)) + a chunked greedy inference rollout over ~54k cold items
(_eval_tables, every epoch) + the validation sweep. This tool times each
phase separately on the real chip so the cut lands where the time is:

    python tools/profile_usim.py [--batches 3]

Uses the cached BX dataset (tools/bx_workdir; build via scale_run.py).
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
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, default=3)
    args = p.parse_args()

    import jax

    from coldrec_tpu.config import default_args
    from coldrec_tpu.models import model_factory
    from coldrec_tpu.runtime.trainer import Config

    margs = default_args(
        model="USIM", dataset="bx", cold_object="item",
        data_dir=os.path.join(WORKDIR, "data"),
        emb_dir=os.path.join(WORKDIR, "emb"),
        epochs=1, save_emb=False,
    )
    t0 = time.perf_counter()
    model = model_factory(Config(margs))
    jax.block_until_ready(model.item_emb)
    print(f"init (incl first _eval_tables + compiles): "
          f"{time.perf_counter() - t0:.1f}s")

    # ---- train batches (first = compile, then steady)
    it = model.batches()
    times = []
    for n in range(args.batches + 1):
        batch = next(it)
        t0 = time.perf_counter()
        out = model._train_step(
            model.actor, model.actor_state, model.critic,
            model.critic_state, model.target_actor, model.target_critic,
            np.asarray(batch["items"]), np.asarray(batch["weight"]),
            model.next_key(),
        )
        jax.block_until_ready(out[0])
        dt = time.perf_counter() - t0
        (model.actor, model.actor_state, model.critic, model.critic_state,
         model.target_actor, model.target_critic) = out
        times.append(dt)
        print(f"train batch {n}: {dt:.2f}s{' (compile)' if n == 0 else ''}")
    steady = float(np.median(times[1:]))
    n_batches = int(
        -(-np.unique(model.data.train_pairs[:, 1]).shape[0]
          // model.batch_size)
    )
    print(f"steady train batch: {steady:.2f}s x {n_batches} batches "
          f"= {steady * n_batches:.0f}s/epoch train phase")

    # ---- per-epoch _eval_tables (chunked greedy inference rollout)
    for rep in range(2):
        t0 = time.perf_counter()
        ue, ie = model._eval_tables()
        jax.block_until_ready(ie)
        print(f"_eval_tables rep {rep}: {time.perf_counter() - t0:.1f}s "
              f"({model.cold_idx.shape[0]} cold items, "
              f"chunk {model._infer_blk}, max_time {model.max_time})")
    model.user_emb, model.item_emb = ue, ie
    model._score_fn = None

    # ---- validation sweep
    t0 = time.perf_counter()
    model.valid("all")
    print(f"validation sweep: {time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
