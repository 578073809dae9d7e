"""BPR-MF warm backbone (reference: model/MF.py).

Two xavier-initialized embedding tables; score = U V^T; BPR + L2 loss;
Adam; best tables written to the embedding bus (MF.py:44-46).
"""
from __future__ import annotations

import jax

from ..ops.losses import bpr_loss, l2_reg_loss
from .common import xavier_uniform
from .warm_base import WarmBackboneTrainer


class MF(WarmBackboneTrainer):
    def __init__(self, config):
        super().__init__(config)
        k1, k2 = jax.random.split(self.next_key())
        self.params = {
            "user_emb": xavier_uniform(k1, (self.data.user_num, self.emb_size)),
            "item_emb": xavier_uniform(k2, (self.data.item_num, self.emb_size)),
        }
        self.setup_optimizer()

    def loss_fn(self, params, batch, key):
        u = params["user_emb"][batch["user"]]
        pos = params["item_emb"][batch["pos_item"]]
        neg = params["item_emb"][batch["neg_item"]]
        w = batch["weight"]
        return bpr_loss(u, pos, neg, w) + l2_reg_loss(
            self.reg, u, pos, neg, weight=w
        )

    def forward_tables(self, params):
        return params["user_emb"], params["item_emb"]
