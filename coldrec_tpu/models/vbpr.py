"""VBPR cold-start model (reference: model/VBPR.py).

Dual-score model: score = P·Q (id tables, warm-started from the backbone and
fine-tuned) + PQ2·(content·W) (visual/content path). Two optimizers —
Adagrad(lr1) on {P, Q, PQ2}, Adam(lr2) on W (VBPR.py:18-19) — expressed as
optax.multi_transform. Loss = sum softplus(neg-pos) + manual weighted L2
(VBPR.py:136-165; the (lr, wd) pairs apply wd in the loss, optimizer
weight_decay stays 0). Eval concatenates the two factor pairs so the base
dot-product sweep computes score1+score2 in one MXU matmul. Saves the 5
tensors AMR requires verbatim (VBPR.py:49-54).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .cold_base import ColdStartModelBase
from .common import adagrad, adam, make_train_step, xavier_uniform


class VBPR(ColdStartModelBase):
    def __init__(self, config):
        super().__init__(config)
        backbone = self.load_backbone()
        d = self.emb_size
        k1, k2 = jax.random.split(self.next_key())
        aux_rows = (
            self.data.user_num
            if self.args.cold_object == "item"
            else self.data.item_num
        )
        self.params = {
            "P": backbone["user_emb"],
            "Q": backbone["item_emb"],
            "PQ2": xavier_uniform(k1, (aux_rows, d)),
            "W": xavier_uniform(k2, (self.content_dim, d)),
        }
        self.content = self.cold_side_content
        self.lr1, self.wd1 = [float(x) for x in self.args.p_emb]
        self.lr2, self.wd2 = [float(x) for x in self.args.p_ctx]
        self.setup_optimizer()

    def setup_optimizer(self):
        labels = {"P": "emb", "Q": "emb", "PQ2": "emb", "W": "ctx"}
        self.optimizer = optax.multi_transform(
            {"emb": adagrad(self.lr1), "ctx": adam(self.lr2)}, labels
        )
        self.opt_state = self.optimizer.init(self.params)

        def loss_no_key(params, batch):
            return self.loss_fn(params, batch, None)

        self._step = make_train_step(loss_no_key, self.optimizer)
        self._forward_jit = jax.jit(self.forward_tables)
        self.user_emb, self.item_emb = self._forward_jit(self.params)
        self.best_user_emb, self.best_item_emb = self.user_emb, self.item_emb
        self._score_fn = None

    # --------------------------------------------------------------- scores
    def _pair_scores(self, params, uid, iid):
        p1 = jnp.sum(params["P"][uid] * params["Q"][iid], axis=1)
        if self.args.cold_object == "item":
            p2 = jnp.sum(
                params["PQ2"][uid] * (self.content[iid] @ params["W"]), axis=1
            )
        else:
            p2 = jnp.sum(
                (self.content[uid] @ params["W"]) * params["PQ2"][iid], axis=1
            )
        return p1 + p2

    def loss_fn(self, params, batch, key):
        uid, iid, nid = batch["user"], batch["pos_item"], batch["neg_item"]
        w = batch["weight"]
        pred_p = self._pair_scores(params, uid, iid)
        pred_n = self._pair_scores(params, uid, nid)
        bpr = jnp.sum(jax.nn.softplus(-(pred_p - pred_n)) * w)
        wcol = w[:, None]
        if self.args.cold_object == "item":
            emb_regs = (
                jnp.sum(params["P"][uid] ** 2 * wcol)
                + jnp.sum(params["PQ2"][uid] ** 2 * wcol)
                + jnp.sum(params["Q"][iid] ** 2 * wcol)
                + jnp.sum(params["Q"][nid] ** 2 * wcol)
            )
        else:
            emb_regs = (
                jnp.sum(params["P"][uid] ** 2 * wcol)
                + jnp.sum(params["PQ2"][iid] ** 2 * wcol)
                + jnp.sum(params["PQ2"][nid] ** 2 * wcol)
                + jnp.sum(params["Q"][iid] ** 2 * wcol)
                + jnp.sum(params["Q"][nid] ** 2 * wcol)
            )
        ctx_regs = jnp.sum(params["W"] ** 2)
        return bpr + self.wd1 * emb_regs + self.wd2 * ctx_regs

    # ----------------------------------------------------------------- eval
    def forward_tables(self, params):
        """Concatenated factors: [P ∥ aux_u] · [Q ∥ aux_i]^T = score1+score2."""
        if self.args.cold_object == "item":
            aux_u = params["PQ2"]
            aux_i = self.content[: self.data.item_num] @ params["W"]
        else:
            aux_u = self.content[: self.data.user_num] @ params["W"]
            aux_i = params["PQ2"]
        user_table = jnp.concatenate([params["P"], aux_u], axis=1)
        item_table = jnp.concatenate([params["Q"], aux_i], axis=1)
        return user_table, item_table

    def save(self):
        super().save()
        # materialize to host NOW: the params buffers are donated (deleted)
        # by the next train step, so holding references would dangle
        p = self.params
        if self.args.cold_object == "item":
            aux_u = np.asarray(p["PQ2"])
            aux_i = np.asarray(self.content[: self.data.item_num] @ p["W"])
        else:
            aux_u = np.asarray(self.content[: self.data.user_num] @ p["W"])
            aux_i = np.asarray(p["PQ2"])
        self._best_extra = {
            "user_emb_main_P": np.asarray(p["P"]),
            "item_emb_main_Q": np.asarray(p["Q"]),
            "user_emb_aux": aux_u,
            "item_emb_aux": aux_i,
            "W": np.asarray(p["W"]),
        }

    def extra_saved_tensors(self):
        return getattr(self, "_best_extra", {})
