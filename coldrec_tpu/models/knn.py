"""KNN cold-start baseline (reference: model/KNN.py).

Trains its own MF or LightGCN encoder (selected by --backbone, KNN.py:12-15)
with BPR+L2; cold embeddings = mean of the k warm neighbours' embeddings
where neighbours are precomputed by exact inner-product search over CONTENT
(faiss IndexFlatIP -> ops/knn.py blocked matmul + top_k, KNN.py:63-77).
"""
from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from ..ops.knn import knn_inner_product
from ..ops.losses import bpr_loss, l2_reg_loss
from ..ops.spmm import make_sym_spmm
from .cold_base import ColdStartModelBase
from .common import xavier_uniform
from .lightgcn import lightgcn_propagate


class KNN(ColdStartModelBase):
    def __init__(self, config):
        super().__init__(config)
        self.use_gcn = self.args.backbone != "MF"
        if self.use_gcn:
            self.graph = make_sym_spmm(self.data.norm_adj)
            self.n_layers = int(self.args.layers)
        self.knn_num = int(self.args.knn_num)
        k1, k2 = jax.random.split(self.next_key())
        self.params = {
            "user_emb": xavier_uniform(k1, (self.data.user_num, self.emb_size)),
            "item_emb": xavier_uniform(k2, (self.data.item_num, self.emb_size)),
        }
        self._neighbor_ids = jnp.asarray(self._precompute_neighbors())
        self.setup_optimizer()

    def _precompute_neighbors(self) -> np.ndarray:
        """(n_cold, k) mapped warm ids nearest in content space (KNN.py:63-77)."""
        if self.args.cold_object == "item":
            content = self.data.item_content
            cold = self.data.mapped_cold_item_idx
            warm = self.data.mapped_warm_item_idx
        else:
            content = self.data.user_content
            cold = self.data.mapped_cold_user_idx
            warm = self.data.mapped_warm_user_idx
        _, idx = knn_inner_product(content[cold], content[warm], self.knn_num)
        return warm[idx]

    def _encoder_tables(self, params):
        if self.use_gcn:
            return lightgcn_propagate(
                self.graph, params["user_emb"], params["item_emb"], self.n_layers
            )
        return params["user_emb"], params["item_emb"]

    def loss_fn(self, params, batch, key):
        ut, it = self._encoder_tables(params)
        u = ut[batch["user"]]
        pos = it[batch["pos_item"]]
        neg = it[batch["neg_item"]]
        w = batch["weight"]
        return bpr_loss(u, pos, neg, w) + l2_reg_loss(
            self.reg, u, pos, neg, weight=w
        )

    def forward_tables(self, params):
        ut, it = self._encoder_tables(params)
        table = it if self.args.cold_object == "item" else ut
        gen = jnp.mean(table[self._neighbor_ids], axis=1)
        return self.patch_cold_rows(ut, it, gen)
