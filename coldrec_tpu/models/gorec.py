"""GoRec cold-start CVAE (reference: model/GoRec.py).

CVAE over warm embeddings conditioned on L2-normalized content: encoder
fc(BN,tanh) -> (mu, logvar) plus a content-only prior branch (mu_zgc,
logvar_zgc); losses = MSE reconstruction + uniformity on mu
(log mean exp(-2 d^2) over pairwise distances, GoRec.py:199-201) +
KLDiv(log softmax-ish z ∥ softmax zgc) elementwise-mean (GoRec.py:41-45);
k-means clustering of the warm table at init (labels saved; means unused in
the loss, GoRec.py:133-141). Inference: mu-only decode of ALL rows of the
cold-side table (GoRec.py:167-189); the eval content is NOT normalized
(train-loop normalizes, eval passes raw — reference quirk preserved).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kmeans import kmeans
from .cold_base import ColdStartModelBase
from .common import (
    batchnorm_apply,
    batchnorm_params,
    batchnorm_state,
    dropout,
    linear,
    linear_params,
    xavier_uniform,
)


def _uniformity(mu, weight):
    """log mean_{i<j} exp(-2||mu_i - mu_j||^2) over valid pairs.

    For unit rows ||xi - xj||^2 = 2 - 2 xi.xj, so the pairwise distances
    come from ONE (B, B) Gram matmul on the MXU — the broadcasted
    difference form materializes a (B, B, d) tensor (4.3 GB/step at
    bs=4096), which made GoRec 14x slower than the reference's
    torch.pdist on the parity host."""
    x = mu / jnp.maximum(jnp.linalg.norm(mu, axis=1, keepdims=True), 1e-12)
    sq = jnp.maximum(2.0 - 2.0 * (x @ x.T), 0.0)
    pair_w = weight[:, None] * weight[None, :]
    iu = jnp.triu(jnp.ones_like(pair_w), k=1)
    pair_w = pair_w * iu
    val = jnp.exp(-2.0 * sq)
    mean = jnp.sum(val * pair_w) / jnp.maximum(jnp.sum(pair_w), 1.0)
    return jnp.log(mean)


class GoRec(ColdStartModelBase):
    stateful = True
    uses_rng_in_loss = True

    def __init__(self, config):
        super().__init__(config)
        self.backbone = self.load_backbone()
        self.content = self.cold_side_content
        d = self.emb_size
        c = self.content_dim
        self.uni_coeff = float(self.args.uni_coeff)
        self.kl_coeff = float(self.args.kl_coeff)
        self.drop_rate = float(self.args.dropout)
        keys = jax.random.split(self.next_key(), 8)

        def torch_default_w(key, n_in, n_out):
            # nn.Linear(bias=False) default weight init (the fc blocks,
            # GoRec.py:219/252, are NOT re-initialized by the reference)
            b = float(1.0 / np.sqrt(n_in))
            return jax.random.uniform(key, (n_in, n_out), minval=-b, maxval=b)

        def head(key, n_in, n_out):
            # reference explicitly xavier_uniform_'s the four heads'
            # WEIGHTS (GoRec.py:228-231); biases keep the torch default
            kw, kb = jax.random.split(key)
            bb = float(1.0 / np.sqrt(n_in))
            return {
                "w": xavier_uniform(kw, (n_in, n_out)),
                "b": jax.random.uniform(kb, (n_out,), minval=-bb, maxval=bb),
            }

        self.params = {
            "enc_fc": {"w": torch_default_w(keys[0], d + c, d)},
            "enc_bn": batchnorm_params(d),
            "l_mu": head(keys[1], d, d),
            "l_var": head(keys[2], d, d),
            "l_mu_zgc": head(keys[3], c, d),
            "l_var_zgc": head(keys[4], c, d),
            "dec_fc": {"w": torch_default_w(keys[5], d + c, d)},
            "dec_bn": batchnorm_params(d),
            "gen": [
                linear_params(keys[6], d, d),
                linear_params(keys[7], d, d),
            ],
        }
        # Round-2 fix: these inits were previously INVERTED (xavier on the
        # fc blocks, torch-default on the heads), which slowed early
        # convergence enough to fail warm-cell parity at ml scale with
        # runs=7 (equal-epoch comparison; at 30 epochs the old init
        # OVERSHOT the reference's 10-epoch warm recall).
        self.net_state = {"enc_bn": batchnorm_state(d), "dec_bn": batchnorm_state(d)}
        # k-means clustering of the warm table (labels saved to the bus)
        table = (
            self.backbone["item_emb"]
            if self.args.cold_object == "item"
            else self.backbone["user_emb"]
        )
        _, labels = kmeans(
            self.next_key(), table, int(self.args.pre_cluster_num)
        )
        self.cluster_label = np.asarray(labels)
        self.setup_optimizer()

    # ------------------------------------------------------------- encoders
    def _encode(self, params, state, warm, side, training, weight=None):
        mu_zgc = linear(params["l_mu_zgc"], side)
        logvar_zgc = linear(params["l_var_zgc"], side)
        h = jnp.concatenate([side, warm], axis=1) @ params["enc_fc"]["w"]
        h, bn_state = batchnorm_apply(
            params["enc_bn"], state["enc_bn"], h, training, weight=weight
        )
        h = jnp.tanh(h)
        return (
            linear(params["l_mu"], h),
            linear(params["l_var"], h),
            mu_zgc,
            logvar_zgc,
            bn_state,
        )

    def _decode(self, params, state, z, side, training, weight=None):
        h = jnp.concatenate([side, z], axis=1) @ params["dec_fc"]["w"]
        h, bn_state = batchnorm_apply(
            params["dec_bn"], state["dec_bn"], h, training, weight=weight
        )
        h = jnp.tanh(h)
        for blk in params["gen"]:
            h = linear(blk, h)
        return h, bn_state

    def loss_fn(self, params, state, batch, key):
        side_idx = (
            batch["pos_item"] if self.args.cold_object == "item" else batch["user"]
        )
        table = (
            self.backbone["item_emb"]
            if self.args.cold_object == "item"
            else self.backbone["user_emb"]
        )
        warm = table[side_idx]
        side = self.content[side_idx]
        side = side / jnp.maximum(
            jnp.linalg.norm(side, axis=1, keepdims=True), 1e-12
        )
        w = batch["weight"]
        k1, k2, k3 = jax.random.split(key, 3)
        mu, logvar, mu_zgc, logvar_zgc, enc_bn = self._encode(
            params, state, warm, side, True, weight=w
        )
        z = jax.random.normal(k1, mu.shape) * jnp.exp(0.5 * logvar) + mu
        zgc = (
            jax.random.normal(k2, mu_zgc.shape) * jnp.exp(0.5 * logvar_zgc)
            + mu_zgc
        )
        side_dropped = dropout(k3, side, self.drop_rate, True)
        rec, dec_bn = self._decode(
            params, {**state, "enc_bn": enc_bn}, z, side_dropped, True, weight=w
        )
        new_state = {"enc_bn": enc_bn, "dec_bn": dec_bn}

        wcol = w[:, None]
        denom = jnp.maximum(jnp.sum(w) * warm.shape[1], 1.0)
        rec_loss = jnp.sum((rec - warm) ** 2 * wcol) / denom
        uni_loss = self.uni_coeff * _uniformity(mu, w)
        z_sm = jax.nn.softmax(z, axis=1)
        zgc_sm = jax.nn.softmax(zgc, axis=1)
        log_z = jnp.log(z_sm + 1e-10)
        # torch KLDivLoss(log_z, zgc): zgc*(log zgc - log_z), elementwise mean
        kl_el = jnp.where(
            zgc_sm > 0, zgc_sm * (jnp.log(jnp.maximum(zgc_sm, 1e-38)) - log_z), 0.0
        )
        kl_loss = self.kl_coeff * jnp.sum(kl_el * wcol) / denom
        return rec_loss + uni_loss + kl_loss, new_state

    def forward_tables(self, params, state):
        if self.args.cold_object == "item":
            warm = self.backbone["item_emb"]
            side = self.content[: self.data.item_num]
        else:
            warm = self.backbone["user_emb"]
            side = self.content[: self.data.user_num]
        mu, _, _, _, _ = self._encode(params, state, warm, side, False)
        rec, _ = self._decode(params, state, mu, side, False)
        if self.args.cold_object == "item":
            return self.backbone["user_emb"], rec
        return rec, self.backbone["item_emb"]

    def extra_saved_tensors(self):
        return {"cluster_label": self.cluster_label}
