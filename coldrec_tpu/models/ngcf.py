"""NGCF warm backbone (reference: model/NGCF.py).

Per layer: side = Â·E; E' = LeakyReLU(W_gc(side) + W_bi(E ⊙ side));
mean over layers 0..L (NGCF.py:90-104). Per-layer learned Linears.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.losses import bpr_loss, l2_reg_loss
from ..ops.spmm import spmm
from .common import linear, linear_params, xavier_uniform
from .warm_base import WarmBackboneTrainer


class NGCF(WarmBackboneTrainer):
    def __init__(self, config):
        super().__init__(config)
        self.n_layers = int(self.args.layers)
        self.graph = self.build_graph()
        keys = jax.random.split(self.next_key(), 2 + 2 * self.n_layers)
        self.params = {
            "user_emb": xavier_uniform(
                keys[0], (self.data.user_num, self.emb_size)
            ),
            "item_emb": xavier_uniform(
                keys[1], (self.data.item_num, self.emb_size)
            ),
            "W_gc": [
                linear_params(keys[2 + 2 * l], self.emb_size, self.emb_size)
                for l in range(self.n_layers)
            ],
            "W_bi": [
                linear_params(keys[3 + 2 * l], self.emb_size, self.emb_size)
                for l in range(self.n_layers)
            ],
        }
        self.setup_optimizer()

    def loss_fn(self, params, batch, key):
        user_table, item_table = self.forward_tables(params)
        u = user_table[batch["user"]]
        pos = item_table[batch["pos_item"]]
        neg = item_table[batch["neg_item"]]
        w = batch["weight"]
        return bpr_loss(u, pos, neg, w) + l2_reg_loss(
            self.reg, u, pos, neg, weight=w
        )

    def forward_tables(self, params):
        ego = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        acc = ego
        for l in range(self.n_layers):
            side = spmm(self.graph, ego)
            summed = linear(params["W_gc"][l], side)
            bi = linear(params["W_bi"][l], ego * side)
            ego = jax.nn.leaky_relu(summed + bi, negative_slope=0.01)
            acc = acc + ego
        mean = acc / (self.n_layers + 1)
        return mean[: self.data.user_num], mean[self.data.user_num :]
