"""Measure fused-K-step training (lax.scan, one dispatch) vs K per-batch
dispatches at a given scale shape.

Motivation: an epoch at XING shape is ~942 train-step dispatches; through
this environment's remote TPU tunnel each dispatch pays launch latency, and
the XING sweep showed device-bound graph models varying ±30% with tunnel
state. A K-step scan compiles the step once and amortizes the launch over K
steps — the classic "no data-dependent host round trips inside the hot
loop" TPU rule. Semantics are identical: same batches, same order, same
optimizer updates (asserted here).

Usage: python tools/exp_fused_steps.py [--model LightGCN] [--shape xing]
         [--k 32] [--iters 3]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="LightGCN")
    ap.add_argument("--shape", default="xing")
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--iters", type=int, default=3)
    args_cli = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    import scale_run as sr

    sr._set_shape(args_cli.shape)
    sr.build_dataset()
    from coldrec_tpu.config.base import make_args
    from coldrec_tpu.data.builder import ColdStartDataset
    from coldrec_tpu.models import model_factory
    from coldrec_tpu.runtime.trainer import Config
    from coldrec_tpu.utils.seeding import set_seed

    set_seed(2024)
    argv = [
        "--model", args_cli.model, "--dataset", sr.DATASET,
        "--data_dir", os.path.join(sr.WORKDIR, "data"),
        "--emb_dir", os.path.join(sr.WORKDIR, "emb"),
        "--epochs", "1",
    ]
    args = make_args(argv)
    data = ColdStartDataset.from_split_dir(
        args.data_dir, args.dataset, args.cold_object
    )
    model = model_factory(Config(args, data))
    assert not model.stateful and not model.uses_rng_in_loss, (
        "experiment targets the plain warm-backbone step"
    )

    # stack K batches from the production sampler
    K, B = args_cli.k, model.batch_size
    batches = []
    for i, b in enumerate(model.batches()):
        if i >= K:
            break
        batches.append(b)
    K = len(batches)
    stacked = {
        key: jnp.asarray(np.stack([b[key] for b in batches]))
        for key in batches[0]
    }

    def fused(params, opt_state, bs):
        def body(carry, b):
            p, o = carry
            loss, grads = jax.value_and_grad(model.loss_fn)(p, b, None)
            updates, o = model.optimizer.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return (p, o), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), bs
        )
        return params, opt_state, losses

    fused_jit = jax.jit(fused, donate_argnums=(0, 1))

    def copy_tree(t):
        return jax.tree_util.tree_map(lambda x: jnp.array(x), t)

    # --- equivalence: K dispatched steps == one fused scan
    p1, o1 = copy_tree(model.params), copy_tree(model.opt_state)
    seq_losses = []
    for i in range(K):
        b = {k: jnp.asarray(v) for k, v in batches[i].items()}
        p1, o1, loss = model._step(p1, o1, b)
        seq_losses.append(float(loss))
    p2, o2 = copy_tree(model.params), copy_tree(model.opt_state)
    p2, o2, losses2 = fused_jit(p2, o2, stacked)
    np.testing.assert_allclose(
        np.asarray(losses2), np.asarray(seq_losses), rtol=2e-4
    )
    l1 = jax.tree_util.tree_leaves(p1)
    l2 = jax.tree_util.tree_leaves(p2)
    for a, b_ in zip(l1, l2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=3e-4, atol=3e-6
        )
    print(f"equivalence OK over {K} steps (losses + final params)")

    # --- timing
    def time_seq():
        p, o = copy_tree(model.params), copy_tree(model.opt_state)
        t0 = time.perf_counter()
        loss = None
        for i in range(K):
            b = {k: jnp.asarray(v) for k, v in batches[i].items()}
            p, o, loss = model._step(p, o, b)
        jax.block_until_ready(loss)
        return time.perf_counter() - t0

    def time_fused():
        p, o = copy_tree(model.params), copy_tree(model.opt_state)
        t0 = time.perf_counter()
        p, o, losses = fused_jit(p, o, stacked)
        jax.block_until_ready(losses)
        return time.perf_counter() - t0

    time_seq(); time_fused()  # warm
    seq = min(time_seq() for _ in range(args_cli.iters))
    fus = min(time_fused() for _ in range(args_cli.iters))
    print(
        f"model={args_cli.model} shape={args_cli.shape} K={K} B={B}\n"
        f"sequential: {seq*1e3:9.1f} ms  ({seq/K*1e3:7.2f} ms/step)\n"
        f"fused scan: {fus*1e3:9.1f} ms  ({fus/K*1e3:7.2f} ms/step)\n"
        f"speedup: {seq/fus:.2f}x"
    )


if __name__ == "__main__":
    main()
