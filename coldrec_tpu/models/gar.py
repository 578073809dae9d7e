"""GAR cold-start generator (reference: model/GAR.py).

Generator-vs-recommender adversarial-ish objective (GAR.py:25-31):
  gen_loss = (1-alpha)*BPR(u, gen, pos) + alpha*MSE(pos, gen)
  rec_loss = (1-beta)*BPR(u, pos, gen) + beta*BPR(u, pos, neg)
Generator = content -> 2d tanh -> d tanh MLP (GAR.py:102-107). Backbone
tables are loaded from the bus and FINE-TUNED (loaded as plain Parameters,
GAR.py:110-115 — not frozen). Eval patches cold rows with generator output.
"""
from __future__ import annotations

import jax

from ..ops.losses import bpr_loss, l2_reg_loss, mse_loss
from .cold_base import ColdStartModelBase
from .common import mlp_apply, mlp_params


class GAR(ColdStartModelBase):
    def __init__(self, config):
        super().__init__(config)
        backbone = self.load_backbone()
        d = self.emb_size
        self.params = {
            "user_emb": backbone["user_emb"],
            "item_emb": backbone["item_emb"],
            "generator": mlp_params(
                self.next_key(), [self.content_dim, 2 * d, d]
            ),
        }
        self.alpha = float(self.args.alpha)
        self.beta = float(self.args.beta)
        self.content = self.cold_side_content
        self.setup_optimizer()

    def _generate(self, params, idx):
        return mlp_apply(
            params["generator"],
            self.content[idx],
            activation=jax.numpy.tanh,
            final_activation=jax.numpy.tanh,
        )

    def loss_fn(self, params, batch, key):
        u = params["user_emb"][batch["user"]]
        pos = params["item_emb"][batch["pos_item"]]
        neg = params["item_emb"][batch["neg_item"]]
        w = batch["weight"]
        if self.args.cold_object == "item":
            gen = self._generate(params, batch["pos_item"])
            gen_loss = (1 - self.alpha) * bpr_loss(u, gen, pos, w) + (
                self.alpha
            ) * mse_loss(gen, pos, w)
        else:
            gen = self._generate(params, batch["user"])
            gen_loss = (1 - self.alpha) * bpr_loss(pos, gen, u, w) + (
                self.alpha
            ) * mse_loss(gen, u, w)
        rec_loss = (1 - self.beta) * bpr_loss(u, pos, gen, w) + self.beta * bpr_loss(
            u, pos, neg, w
        )
        return gen_loss + rec_loss + l2_reg_loss(
            self.reg, u, pos, neg, gen, weight=w
        )

    def forward_tables(self, params):
        gen = self._generate(params, self.cold_idx)
        return self.patch_cold_rows(
            params["user_emb"], params["item_emb"], gen
        )
