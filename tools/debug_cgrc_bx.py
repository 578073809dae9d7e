"""Bisect the CGRC book-crossing-scale TPU worker crash.

Builds CGRC on the cached bx_workdir dataset and runs the pieces of the
train step separately (loss value only, then value_and_grad, then the
L_E scan in isolation) so the crashing computation is identified.

Usage: python tools/debug_cgrc_bx.py [stage]
  stage in {value, grad, le_value, le_grad, lr_grad} (default: value)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKDIR = os.path.join(REPO, "tools", "bx_workdir")


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "value"
    sys.argv = [
        "debug", "--dataset", "bx", "--model", "CGRC",
        "--cold_object", "item",
        "--data_dir", os.path.join(WORKDIR, "data"),
        "--emb_dir", os.path.join(WORKDIR, "emb"),
        "--epochs", "1",
    ]
    from coldrec_tpu.config import make_args
    from coldrec_tpu.models import model_factory
    from coldrec_tpu.runtime.trainer import Config
    from coldrec_tpu.utils.seeding import set_seed

    set_seed(0)
    args = make_args()
    config = Config(args)
    t0 = time.perf_counter()
    model = model_factory(config)
    print(f"init (incl. forward_tables): {time.perf_counter() - t0:.1f}s",
          flush=True)

    import jax
    import jax.numpy as jnp

    batch = next(iter(model.batches()))
    batch = model._place_batch(batch)
    key = model.next_key()

    if stage in ("value", "grad"):
        fn = model.loss_fn
        if stage == "grad":
            fn = jax.value_and_grad(model.loss_fn)
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        out = jax.block_until_ready(jfn(model.params, batch, key))
        loss = out[0] if stage == "grad" else out
        print(f"{stage}: loss={float(loss):.5f} "
              f"first-call {time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        jax.block_until_ready(jfn(model.params, batch, key))
        print(f"{stage}: steady {time.perf_counter() - t0:.3f}s", flush=True)
        return

    # isolate L_E / L_R
    import numpy as np

    def le_only(params, key):
        n_i = model.data.item_num
        k1, k2, _ = jax.random.split(key, 3)
        x_all = model._item_x(params)
        cold_mask = (
            jax.random.uniform(k1, (n_i,)) < model.rho
        ) & model._eligible
        graph_m = model._masked_graph_vals(cold_mask)
        h_u_bar = model._propagate_frozen(
            graph_m, params["user_emb"], x_all, model.Lg, cold_mask
        )
        tp = model.data.train_pairs
        eidx = jax.random.randint(k2, (model.le_max,), 0, tp.shape[0])
        e_pairs = jnp.asarray(tp.astype(np.int32))[eidx]
        e_u, e_i = e_pairs[:, 0], e_pairs[:, 1]
        e_w = cold_mask[e_i].astype(jnp.float32)
        pos, lse, has_valid = model._edge_softmax_terms(
            params, h_u_bar[e_u], e_u, e_i, x_all, cold_mask
        )
        e_w = e_w * has_valid.astype(jnp.float32)
        return jnp.sum(-(pos - lse) * e_w) / jnp.maximum(jnp.sum(e_w), 1.0)

    def lr_only(params, batch, key):
        n_i = model.data.item_num
        _, _, k3 = jax.random.split(key, 3)
        x_all = model._item_x(params)
        z_u, z_i = model._lightgcn_full(
            model.full_graph, params["user_emb"], x_all, model.Lf
        )
        bs = batch["user"].shape[0]
        n_extra = model.ranking_neg * 8
        extra = jax.random.randint(k3, (n_extra,), 0, n_i)
        b_items = jnp.concatenate([batch["pos_item"], extra])
        sim = (z_u[batch["user"]] @ z_i[b_items].T) / model.tau
        not_rated = ~model._rated_mask(
            batch["user"], jnp.broadcast_to(b_items, (bs, b_items.shape[0]))
        )
        le_row = jax.nn.logsumexp(
            jnp.where(not_rated, sim, jnp.finfo(sim.dtype).min), axis=1
        )
        pos_s = jnp.diag(sim[:, :bs])
        w = batch["weight"] * jnp.any(not_rated, axis=1)
        return jnp.sum(-(pos_s - le_row) * w) / jnp.maximum(jnp.sum(w), 1.0)

    def prop_only(params, key):
        n_i = model.data.item_num
        k1, _, _ = jax.random.split(key, 3)
        x_all = model._item_x(params)
        cold_mask = (
            jax.random.uniform(k1, (n_i,)) < model.rho
        ) & model._eligible
        graph_m = model._masked_graph_vals(cold_mask)
        h_u_bar = model._propagate_frozen(
            graph_m, params["user_emb"], x_all, model.Lg, cold_mask
        )
        return jnp.sum(h_u_bar)

    def scan_only(params, key):
        n_i = model.data.item_num
        k1, k2, _ = jax.random.split(key, 3)
        x_all = model._item_x(params)
        cold_mask = (
            jax.random.uniform(k1, (n_i,)) < model.rho
        ) & model._eligible
        tp = model.data.train_pairs
        eidx = jax.random.randint(k2, (model.le_max,), 0, tp.shape[0])
        e_pairs = jnp.asarray(tp.astype(np.int32))[eidx]
        e_u, e_i = e_pairs[:, 0], e_pairs[:, 1]
        h_e = params["user_emb"][e_u]  # skip propagation: user rows direct
        pos, lse, has_valid = model._edge_softmax_terms(
            params, h_e, e_u, e_i, x_all, cold_mask
        )
        return jnp.sum(pos) + jnp.sum(lse) + jnp.sum(has_valid)

    def scan_nomember(params, key):
        """The L_E scan with rated-membership replaced by all-False."""
        n_i = model.data.item_num
        k1, k2, _ = jax.random.split(key, 3)
        x_all = model._item_x(params)
        cold_mask = (
            jax.random.uniform(k1, (n_i,)) < model.rho
        ) & model._eligible
        tp = model.data.train_pairs
        eidx = jax.random.randint(k2, (model.le_max,), 0, tp.shape[0])
        e_pairs = jnp.asarray(tp.astype(np.int32))[eidx]
        e_u, e_i = e_pairs[:, 0], e_pairs[:, 1]
        hu, xi_all = model._edge_parts(params, params["user_emb"][e_u], x_all)
        hsz = int(model.args.cgrc_mlp_hidden)
        blk = 1024
        pad = (-n_i) % blk
        xi_pad = jnp.concatenate([xi_all, jnp.zeros((pad, hsz))]) if pad else xi_all
        cm_pad = jnp.concatenate([cold_mask, jnp.zeros(pad, bool)]) if pad else cold_mask
        ids = jnp.arange(n_i + pad, dtype=jnp.int32).reshape(-1, blk)
        neg_inf = jnp.finfo(jnp.float32).min

        @jax.checkpoint
        def body(carry, idx):
            m, s = carry
            lg = model._block_logits(params, hu, xi_pad[idx])
            valid = cm_pad[idx][None, :] & True
            lg = jnp.where(valid, lg, neg_inf)
            bm = jnp.max(lg, axis=1)
            nm = jnp.maximum(m, bm)
            scale = jnp.where(nm == neg_inf, 0.0, jnp.exp(m - nm))
            add = jnp.sum(jnp.where(valid, jnp.exp(lg - nm[:, None]), 0.0), 1)
            return (nm, s * scale + add), None

        init = (jnp.full((model.le_max,), neg_inf, jnp.float32),
                jnp.zeros((model.le_max,), jnp.float32))
        (m, s), _ = jax.lax.scan(body, init, ids)
        return jnp.sum(m) + jnp.sum(s)

    def member_only(params, key):
        """Only the vmapped-searchsorted membership over all item blocks."""
        n_i = model.data.item_num
        _, k2, _ = jax.random.split(key, 3)
        tp = model.data.train_pairs
        eidx = jax.random.randint(k2, (model.le_max,), 0, tp.shape[0])
        e_pairs = jnp.asarray(tp.astype(np.int32))[eidx]
        e_u = e_pairs[:, 0]
        rated = model._rated_all[e_u]
        blk = 1024
        pad = (-n_i) % blk
        ids = jnp.arange(n_i + pad, dtype=jnp.int32).reshape(-1, blk)

        def member(row, q):
            p = jnp.minimum(jnp.searchsorted(row, q), row.shape[0] - 1)
            return row[p] == q

        def body(acc, idx):
            valid = jax.vmap(lambda r: member(r, idx))(rated)
            return acc + jnp.sum(valid), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), ids)
        return acc

    if stage == "scan_nomember":
        out = jax.block_until_ready(jax.jit(scan_nomember)(model.params, key))
        print(f"{stage}: {float(out):.5f}", flush=True)
        return
    if stage == "member_only":
        out = jax.block_until_ready(jax.jit(member_only)(model.params, key))
        print(f"{stage}: {float(out)}", flush=True)
        return

    if stage == "prop_value":
        jfn = jax.jit(prop_only)
        out = jax.block_until_ready(jfn(model.params, key))
        print(f"{stage}: {float(out):.5f}", flush=True)
        return
    if stage == "scan_value":
        cap = os.environ.get("CGRC_CAP")
        if cap:
            model._DENSE_ELEMS_CAP = int(cap)
        jfn = jax.jit(scan_only)
        out = jax.block_until_ready(jfn(model.params, key))
        print(f"{stage}: {float(out):.5f}", flush=True)
        return

    if stage == "le_value":
        jfn = jax.jit(le_only)
        out = jax.block_until_ready(jfn(model.params, key))
    elif stage == "le_grad":
        jfn = jax.jit(jax.value_and_grad(le_only))
        out = jax.block_until_ready(jfn(model.params, key))
        out = out[0]
    elif stage == "lr_grad":
        jfn = jax.jit(jax.value_and_grad(lr_only))
        out = jax.block_until_ready(jfn(model.params, batch, key))
        out = out[0]
    else:
        raise SystemExit(f"unknown stage {stage}")
    print(f"{stage}: {float(out):.5f}", flush=True)


if __name__ == "__main__":
    main()
