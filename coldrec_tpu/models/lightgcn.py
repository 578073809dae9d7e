"""LightGCN warm backbone (reference: model/LightGCN.py).

L rounds of normalized-adjacency propagation ``E_{k+1} = Â E_k`` over the
(U+I)-node bipartite graph, final embedding = mean over layers 0..L
(LightGCN.py:86-96). The SpMM is a gather + sorted segment-sum
(:func:`coldrec_tpu.ops.spmm.spmm`) compiled by XLA; on a device mesh the
rows of Â and E are co-sharded (see parallel/).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.losses import bpr_loss, l2_reg_loss
from ..ops.spmm import SparseGraph, spmm
from .common import xavier_uniform
from .warm_base import WarmBackboneTrainer


def lightgcn_propagate(
    graph: SparseGraph,
    user_emb: jnp.ndarray,
    item_emb: jnp.ndarray,
    n_layers: int,
    include_ego: bool = True,
):
    """Returns (user_table, item_table) averaged over propagation layers."""
    ego = jnp.concatenate([user_emb, item_emb], axis=0)
    acc = ego if include_ego else jnp.zeros_like(ego)
    count = 1 if include_ego else 0
    for _ in range(n_layers):
        ego = spmm(graph, ego)
        acc = acc + ego
        count += 1
    mean = acc / count
    n_users = user_emb.shape[0]
    return mean[:n_users], mean[n_users:]


class LightGCN(WarmBackboneTrainer):
    def __init__(self, config):
        super().__init__(config)
        self.n_layers = int(self.args.layers)
        self.graph = self.build_graph()
        k1, k2 = jax.random.split(self.next_key())
        self.params = {
            "user_emb": xavier_uniform(k1, (self.data.user_num, self.emb_size)),
            "item_emb": xavier_uniform(k2, (self.data.item_num, self.emb_size)),
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
        return lightgcn_propagate(
            self.graph, params["user_emb"], params["item_emb"], self.n_layers
        )
