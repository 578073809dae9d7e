"""SimGCL warm backbone (reference: model/SimGCL.py).

LightGCN propagation with per-layer uniform random noise
``sign(e) * normalize(U(0,1)) * eps`` when perturbed (SimGCL.py:101-113);
CL loss = InfoNCE between two independently perturbed views on the unique
batch users/items (53-60). Layer mean is over layers 1..L — layer 0 is
EXCLUDED, unlike LightGCN (SimGCL.py:110-111). L2 reg applied to user+pos
only (SimGCL.py:29).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.losses import (
    _normalize,
    bpr_loss,
    info_nce_masked,
    l2_reg_loss,
    unique_padded,
)
from ..ops.spmm import spmm
from .common import xavier_uniform
from .warm_base import WarmBackboneTrainer


def simgcl_forward(graph, user_emb, item_emb, n_layers, eps, key=None,
                   noise=None):
    """Perturbed (key or noise given) or clean LightGCN-style forward,
    mean over layers 1..L. ``noise`` — an (L, U+I, d) stack of pre-drawn
    U(0,1) tensors — overrides ``key``; the torch-oracle test uses it to
    feed both frameworks identical noise (SimGCL.py:101-109)."""
    ego = jnp.concatenate([user_emb, item_emb], axis=0)
    acc = jnp.zeros_like(ego)
    for layer in range(n_layers):
        ego = spmm(graph, ego)
        if noise is not None:
            ego = ego + jnp.sign(ego) * _normalize(noise[layer]) * eps
        elif key is not None:
            key, sub = jax.random.split(key)
            nz = jax.random.uniform(sub, ego.shape, ego.dtype)
            ego = ego + jnp.sign(ego) * _normalize(nz) * eps
        acc = acc + ego
    mean = acc / n_layers
    n_users = user_emb.shape[0]
    return mean[:n_users], mean[n_users:]


class SimGCL(WarmBackboneTrainer):
    uses_rng_in_loss = True

    def __init__(self, config):
        super().__init__(config)
        self.n_layers = int(self.args.layers)
        self.eps = float(self.args.eps)
        self.cl_rate = float(self.args.cl_rate)
        self.tau = float(self.args.tau)
        self.graph = self.build_graph()
        k1, k2 = jax.random.split(self.next_key())
        self.params = {
            "user_emb": xavier_uniform(k1, (self.data.user_num, self.emb_size)),
            "item_emb": xavier_uniform(k2, (self.data.item_num, self.emb_size)),
        }
        self.setup_optimizer()

    def loss_fn(self, params, batch, key, noise_pair=None):
        user_table, item_table = self.forward_tables(params)
        u = user_table[batch["user"]]
        pos = item_table[batch["pos_item"]]
        neg = item_table[batch["neg_item"]]
        w = batch["weight"]
        rec = bpr_loss(u, pos, neg, w)
        k1, k2 = jax.random.split(key)
        n1, n2 = noise_pair if noise_pair is not None else (None, None)
        uv1, iv1 = simgcl_forward(
            self.graph, params["user_emb"], params["item_emb"],
            self.n_layers, self.eps, k1, noise=n1,
        )
        uv2, iv2 = simgcl_forward(
            self.graph, params["user_emb"], params["item_emb"],
            self.n_layers, self.eps, k2, noise=n2,
        )
        bs = batch["user"].shape[0]
        uu, um = unique_padded(batch["user"], w, bs, self.data.user_num)
        iu, im = unique_padded(batch["pos_item"], w, bs, self.data.item_num)
        cl = info_nce_masked(uv1[uu], uv2[uu], um, self.tau) + info_nce_masked(
            iv1[iu], iv2[iu], im, self.tau
        )
        return rec + l2_reg_loss(self.reg, u, pos, weight=w) + self.cl_rate * cl

    def forward_tables(self, params):
        return simgcl_forward(
            self.graph, params["user_emb"], params["item_emb"],
            self.n_layers, self.eps, None,
        )
