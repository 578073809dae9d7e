"""DUIF cold-start model (reference: model/DUIF.py).

The cold-object side table is replaced entirely by a bias-free linear
projection of content (DUIF.py:87-91); the warm side is a learned xavier
table. Trained jointly with BPR + L2 — a "joint" model, no backbone.
"""
from __future__ import annotations

import jax

from ..ops.losses import bpr_loss, l2_reg_loss
from .cold_base import ColdStartModelBase
from .common import linear, linear_params, xavier_uniform


class DUIF(ColdStartModelBase):
    def __init__(self, config):
        super().__init__(config)
        k1, k2, k3 = jax.random.split(self.next_key(), 3)
        self.params = {
            "user_emb": xavier_uniform(k1, (self.data.user_num, self.emb_size)),
            "item_emb": xavier_uniform(k2, (self.data.item_num, self.emb_size)),
            "projector": linear_params(
                k3, self.content_dim, self.emb_size, bias=False
            ),
        }
        self.content = self.cold_side_content
        self.setup_optimizer()

    def forward_tables(self, params):
        if self.args.cold_object == "item":
            proj = linear(params["projector"], self.content[: self.data.item_num])
            return params["user_emb"], proj
        proj = linear(params["projector"], self.content[: self.data.user_num])
        return proj, params["item_emb"]

    def loss_fn(self, params, batch, key):
        user_table, item_table = self.forward_tables(params)
        u = user_table[batch["user"]]
        pos = item_table[batch["pos_item"]]
        neg = item_table[batch["neg_item"]]
        w = batch["weight"]
        return bpr_loss(u, pos, neg, w) + l2_reg_loss(
            self.reg, u, pos, neg, weight=w
        )
