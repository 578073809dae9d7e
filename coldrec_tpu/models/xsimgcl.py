"""XSimGCL warm backbone (reference: model/XSimGCL.py).

A single perturbed forward returns both the final (mean over layers 1..L)
embeddings and a snapshot at layer l_cl; CL is InfoNCE between the two
(XSimGCL.py:106-124, 58-63). Cheaper than SimGCL (1 perturbed forward, not
3 total). Validates 1 <= l_cl <= layers (XSimGCL.py:14-18).
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


class XSimGCL(WarmBackboneTrainer):
    uses_rng_in_loss = True

    def __init__(self, config):
        super().__init__(config)
        self.n_layers = int(self.args.layers)
        self.layer_cl = int(self.args.l_cl)
        if not (1 <= self.layer_cl <= self.n_layers):
            raise ValueError(
                "XSimGCL requires 1 <= l_cl <= layers; "
                f"got l_cl={self.layer_cl}, layers={self.n_layers}."
            )
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

    def _forward(self, params, key, noise=None):
        """Returns (user, item, cl_user, cl_item); key=None -> clean.
        ``noise`` — a pre-drawn (L, U+I, d) U(0,1) stack — overrides key
        (used by the torch-oracle test to feed both frameworks identical
        noise, XSimGCL.py:112-114)."""
        ego = jnp.concatenate(
            [params["user_emb"], params["item_emb"]], axis=0
        )
        acc = jnp.zeros_like(ego)
        cl_snapshot = ego
        for layer in range(self.n_layers):
            ego = spmm(self.graph, ego)
            if noise is not None:
                ego = ego + jnp.sign(ego) * _normalize(noise[layer]) * self.eps
            elif key is not None:
                key, sub = jax.random.split(key)
                nz = jax.random.uniform(sub, ego.shape, ego.dtype)
                ego = ego + jnp.sign(ego) * _normalize(nz) * self.eps
            acc = acc + ego
            if layer == self.layer_cl - 1:
                cl_snapshot = ego
        mean = acc / self.n_layers
        nu = self.data.user_num
        return mean[:nu], mean[nu:], cl_snapshot[:nu], cl_snapshot[nu:]

    def loss_fn(self, params, batch, key, noise=None):
        ut, it, cu, ci = self._forward(params, key, noise=noise)
        u = ut[batch["user"]]
        pos = it[batch["pos_item"]]
        neg = it[batch["neg_item"]]
        w = batch["weight"]
        rec = bpr_loss(u, pos, neg, w)
        bs = batch["user"].shape[0]
        uu, um = unique_padded(batch["user"], w, bs, self.data.user_num)
        iu, im = unique_padded(batch["pos_item"], w, bs, self.data.item_num)
        cl = info_nce_masked(ut[uu], cu[uu], um, self.tau) + info_nce_masked(
            it[iu], ci[iu], im, self.tau
        )
        return rec + l2_reg_loss(self.reg, u, pos, weight=w) + self.cl_rate * cl

    def forward_tables(self, params):
        ut, it, _, _ = self._forward(params, None)
        return ut, it
