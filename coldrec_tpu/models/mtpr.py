"""MTPR cold-start model (reference: model/MTPR.py).

Counterfactual dual representation: normal ``fimg`` = [id-emb ∥ content·W]
vs zeroed-ID ``zimg`` = [0 ∥ content·W] (MTPR.py:126-138); 4-way multi-task
softplus BPR over (ii, ff, if, fi) combinations (MTPR.py:181-185); three
optimizer groups — Adagrad(lr1) on {P, Q}, Adam(lr2) on {W, weu}, Adam(lr3)
on {wei} (MTPR.py:19-21); manual weighted L2 (187-202). The cold-object
side's id table has width 2d? No — the WARM side doubles (P is (U, 2d) under
item cold-start) and projections weu/wei map 2d -> d (MTPR.py:87-112).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from .cold_base import ColdStartModelBase
from .common import adagrad, adam, make_train_step, xavier_uniform


class MTPR(ColdStartModelBase):
    def __init__(self, config):
        super().__init__(config)
        d = self.emb_size
        keys = jax.random.split(self.next_key(), 5)
        if self.args.cold_object == "item":
            p_shape = (self.data.user_num, 2 * d)
            q_shape = (self.data.item_num, d)
        else:
            p_shape = (self.data.user_num, d)
            q_shape = (self.data.item_num, 2 * d)
        self.params = {
            "P": xavier_uniform(keys[0], p_shape),
            "Q": xavier_uniform(keys[1], q_shape),
            "W": xavier_uniform(keys[2], (self.content_dim, d)),
            "weu": xavier_uniform(keys[3], (2 * d, d)),
            "wei": xavier_uniform(keys[4], (2 * d, d)),
        }
        self.content = self.cold_side_content
        self.lr1, self.wd1 = [float(x) for x in self.args.p_emb]
        self.lr2, self.wd2 = [float(x) for x in self.args.p_ctx]
        self.lr3, self.wd3 = [float(x) for x in self.args.p_proj]
        self.setup_optimizer()

    def setup_optimizer(self):
        labels = {"P": "emb", "Q": "emb", "W": "ctx", "weu": "ctx", "wei": "proj"}
        self.optimizer = optax.multi_transform(
            {
                "emb": adagrad(self.lr1),
                "ctx": adam(self.lr2),
                "proj": adam(self.lr3),
            },
            labels,
        )
        self.opt_state = self.optimizer.init(self.params)

        def loss_no_key(params, batch):
            return self.loss_fn(params, batch, None)

        self._step = make_train_step(loss_no_key, self.optimizer)
        self._forward_jit = jax.jit(self.forward_tables)
        self.user_emb, self.item_emb = self._forward_jit(self.params)
        self.best_user_emb, self.best_item_emb = self.user_emb, self.item_emb
        self._score_fn = None

    # --------------------------------------------------------------- pieces
    def _user_vec(self, params, uid, factual: bool):
        if self.args.cold_object == "item":
            return params["P"][uid] @ params["weu"]
        ctx = self.content[uid] @ params["W"]
        idp = params["P"][uid] if factual else jnp.zeros_like(params["P"][uid])
        return jnp.concatenate([idp, ctx], axis=1) @ params["weu"]

    def _item_vec(self, params, iid, factual: bool):
        if self.args.cold_object == "item":
            ctx = self.content[iid] @ params["W"]
            idq = params["Q"][iid] if factual else jnp.zeros_like(params["Q"][iid])
            return jnp.concatenate([idq, ctx], axis=1) @ params["wei"]
        return params["Q"][iid] @ params["wei"]

    def _pred(self, params, uid, iid, fu: bool, fi: bool):
        return jnp.sum(
            self._user_vec(params, uid, fu) * self._item_vec(params, iid, fi),
            axis=1,
        )

    def loss_fn(self, params, batch, key):
        uid, iid, nid = batch["user"], batch["pos_item"], batch["neg_item"]
        w = batch["weight"]

        def bpr(pp, pn):
            return jnp.sum(jax.nn.softplus(-(pp - pn)) * w)

        # under item cold-start the user side is always factual; the
        # counterfactual flag flips the item representation (and vice versa)
        loss = (
            bpr(self._pred(params, uid, iid, True, True),
                self._pred(params, uid, nid, True, True))  # ii
            + bpr(self._pred(params, uid, iid, False, False),
                  self._pred(params, uid, nid, False, False))  # ff
            + bpr(self._pred(params, uid, iid, True, True),
                  self._pred(params, uid, nid, False, False))  # if
            + bpr(self._pred(params, uid, iid, False, False),
                  self._pred(params, uid, nid, True, True))  # fi
        )
        wcol = w[:, None]
        emb_regs = (
            jnp.sum(params["P"][uid] ** 2 * wcol)
            + jnp.sum(params["Q"][iid] ** 2 * wcol)
            + jnp.sum(params["Q"][nid] ** 2 * wcol)
        )
        ctx_regs = jnp.sum(params["W"] ** 2) + jnp.sum(params["weu"] ** 2)
        proj_regs = jnp.sum(params["wei"] ** 2)
        return loss + self.wd1 * emb_regs + self.wd2 * ctx_regs + self.wd3 * proj_regs

    def forward_tables(self, params):
        if self.args.cold_object == "item":
            user_table = params["P"] @ params["weu"]
            ctx = self.content[: self.data.item_num] @ params["W"]
            item_table = (
                jnp.concatenate([params["Q"], ctx], axis=1) @ params["wei"]
            )
        else:
            ctx = self.content[: self.data.user_num] @ params["W"]
            user_table = (
                jnp.concatenate([params["P"], ctx], axis=1) @ params["weu"]
            )
            item_table = params["Q"] @ params["wei"]
        return user_table, item_table
