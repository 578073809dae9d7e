"""AGNN cold-start model (reference: model/AGNN.py).

Content encoder MLP -> gated KNN aggregation over precomputed cosine-KNN
warm neighbours (add/erase gates + LeakyReLU fusion, AGNN.py:219-243); dual
2-layer VAEs reconstruct the backbone embedding from the semantic x
(AGNN.py:251-263); loss = BPR(gcn) + w*BPR(gen) + w*align-MSE +
lambda*(recon+KL) + L2 (AGNN.py:285-317). Backbone tables frozen unless
--agnn_finetune; xavier init with --agnn_no_backbone. Eval materializes the
full GCN tables (one jit — no chunking needed under XLA) and patches cold
rows with mu-decoded VAE output (training=False -> z = mu).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.knn import knn_cosine
from ..ops.losses import bpr_loss, l2_reg_loss, mse_loss
from .cold_base import ColdStartModelBase
from .common import dropout, linear, linear_params, xavier_uniform


def cosine_knn_warm(features: np.ndarray, warm_ids: np.ndarray, k: int):
    """(n, k) warm global ids nearest by cosine, excluding self for warm
    queries (AGNN.py:48-82)."""
    n = features.shape[0]
    nw = warm_ids.shape[0]
    kk = min(k + 1, nw)
    _, idx = knn_cosine(features, features[warm_ids], kk)
    chosen = warm_ids[idx]  # (n, kk) global ids, best first
    out = np.zeros((n, k), dtype=np.int64)
    rows = np.arange(n)
    for i in range(n):
        row = chosen[i]
        row = row[row != i][: min(k, nw)]
        if row.size < k:
            row = np.concatenate(
                [row, np.full(k - row.size, row[-1] if row.size else warm_ids[0])]
            )
        out[i] = row
    return out


def _vae_init(key, d):
    keys = jax.random.split(key, 5)
    return {
        "enc1": linear_params(keys[0], d, d),
        "mu": linear_params(keys[1], d, d),
        "logvar": linear_params(keys[2], d, d),
        "dec1": linear_params(keys[3], d, d),
        "dec2": linear_params(keys[4], d, d),
    }


def _vae_q(p, x):
    h = jax.nn.relu(linear(p["enc1"], x))
    return linear(p["mu"], h), linear(p["logvar"], h)


def _vae_p(p, z):
    return linear(p["dec2"], jax.nn.relu(linear(p["dec1"], z)))


class AGNN(ColdStartModelBase):
    uses_rng_in_loss = True

    def __init__(self, config):
        super().__init__(config)
        d = self.emb_size
        self.drop = float(self.args.agnn_dropout)
        n_u, n_i = self.data.user_num, self.data.item_num
        keys = jax.random.split(self.next_key(), 16)
        if bool(self.args.agnn_no_backbone):
            user_emb = xavier_uniform(keys[0], (n_u, d))
            item_emb = xavier_uniform(keys[1], (n_i, d))
            self._finetune = True
        else:
            backbone = self.load_backbone()
            user_emb = backbone["user_emb"]
            item_emb = backbone["item_emb"]
            self._finetune = bool(self.args.agnn_finetune)

        # content (pad/truncate to table rows); missing side falls back to ids
        def _pad(content, rows):
            if content is None:
                return None
            out = np.zeros((rows, content.shape[1]), np.float32)
            n = min(rows, content.shape[0])
            out[:n] = content[:n]
            return out

        item_np = _pad(self.data.item_content, n_i)
        user_np = _pad(self.data.user_content, n_u)
        if item_np is None and self.args.cold_object == "item":
            raise ValueError("AGNN item cold-start requires item content")
        if user_np is None and self.args.cold_object == "user":
            raise ValueError("AGNN user cold-start requires user content")
        self._has_item_content = item_np is not None
        self._has_user_content = user_np is not None
        self.item_content = (
            jnp.asarray(item_np) if item_np is not None else None
        )
        self.user_content = (
            jnp.asarray(user_np) if user_np is not None else None
        )

        k = int(self.args.agnn_knn_k)
        warm_i = np.asarray(self.data.mapped_warm_item_idx, np.int64)
        warm_u = np.asarray(self.data.mapped_warm_user_idx, np.int64)
        item_feat = item_np if item_np is not None else np.asarray(item_emb)
        user_feat = user_np if user_np is not None else np.asarray(user_emb)
        self.knn_item = jnp.asarray(cosine_knn_warm(item_feat, warm_i, k))
        self.knn_user = jnp.asarray(cosine_knn_warm(user_feat, warm_u, k))

        f_i = item_np.shape[1] if item_np is not None else d
        f_u = user_np.shape[1] if user_np is not None else d
        self.params = {
            "user_emb": user_emb,
            "item_emb": item_emb,
            "enc_item": [
                linear_params(keys[2], f_i, 2 * d),
                linear_params(keys[3], 2 * d, d),
            ],
            "enc_user": [
                linear_params(keys[4], f_u, 2 * d),
                linear_params(keys[5], 2 * d, d),
            ],
            "dense_self": linear_params(keys[6], 2 * d, d),
            "dense_hop": linear_params(keys[7], 2 * d, d),
            "dense_addgate": linear_params(keys[8], 2 * d, d),
            "dense_erasegate": linear_params(keys[9], 2 * d, d),
            "user_vae": _vae_init(keys[10], d),
            "item_vae": _vae_init(keys[11], d),
        }
        self.setup_optimizer()

    def _maybe_frozen(self, params):
        if self._finetune:
            return params
        return {
            **params,
            "user_emb": jax.lax.stop_gradient(params["user_emb"]),
            "item_emb": jax.lax.stop_gradient(params["item_emb"]),
        }

    # ------------------------------------------------------------- encoders
    def _semantic_x(self, params, idx, is_user, key):
        if is_user:
            feat = (
                self.user_content[idx]
                if self._has_user_content
                else params["user_emb"][idx]
            )
            enc = params["enc_user"]
        else:
            feat = (
                self.item_content[idx]
                if self._has_item_content
                else params["item_emb"][idx]
            )
            enc = params["enc_item"]
        h = jax.nn.relu(linear(enc[0], feat))
        if key is not None:
            h = dropout(key, h, self.drop, True)
        return linear(enc[1], h)

    def _gcn_embed(self, params, idx, is_user, key):
        x = self._semantic_x(params, idx, is_user, key)
        table = params["user_emb"] if is_user else params["item_emb"]
        knn = self.knn_user if is_user else self.knn_item
        e = table[idx]
        self_embed = linear(params["dense_self"], jnp.concatenate([x, e], 1))
        neigh_e = table[knn[idx]]  # (B, K, d)
        b, kk, d = neigh_e.shape
        self_rep = jnp.broadcast_to(self_embed[:, None, :], (b, kk, d))
        hop_raw = linear(
            params["dense_hop"], jnp.concatenate([self_rep, neigh_e], -1)
        )
        add_gate = jax.nn.sigmoid(
            linear(params["dense_addgate"], jnp.concatenate([self_rep, hop_raw], -1))
        )
        hop_g = jnp.mean(hop_raw * add_gate, axis=1)
        erase_gate = jax.nn.sigmoid(
            linear(
                params["dense_erasegate"],
                jnp.concatenate([self_embed, jnp.mean(hop_raw, axis=1)], 1),
            )
        )
        return jax.nn.leaky_relu(
            (1.0 - erase_gate) * self_embed + hop_g, negative_slope=0.2
        )

    def loss_fn(self, params, batch, key):
        params = self._maybe_frozen(params)
        keys = jax.random.split(key, 5)
        w = batch["weight"]
        u_g = self._gcn_embed(params, batch["user"], True, keys[0])
        pos_g = self._gcn_embed(params, batch["pos_item"], False, keys[1])
        neg_g = self._gcn_embed(params, batch["neg_item"], False, keys[2])
        rank_loss = bpr_loss(u_g, pos_g, neg_g, w)

        if self.args.cold_object == "item":
            x = self._semantic_x(params, batch["pos_item"], False, keys[3])
            target = params["item_emb"][batch["pos_item"]]
            vae = params["item_vae"]
        else:
            x = self._semantic_x(params, batch["user"], True, keys[3])
            target = params["user_emb"][batch["user"]]
            vae = params["user_vae"]
        mu, logvar = _vae_q(vae, x)
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(keys[4], mu.shape)
        gen = _vae_p(vae, z)
        recon_loss = mse_loss(gen, target, w)
        kl_el = jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar), axis=1)
        kl_loss = -0.5 * jnp.sum(kl_el * w) / jnp.maximum(jnp.sum(w), 1.0)
        if self.args.cold_object == "item":
            gen_rank = bpr_loss(u_g, gen, neg_g, w)
        else:
            gen_rank = bpr_loss(gen, pos_g, neg_g, w)
        align = mse_loss(gen, target, w)
        reg_loss = l2_reg_loss(self.reg, u_g, pos_g, neg_g, gen, weight=w)
        return (
            rank_loss
            + float(self.args.agnn_rank_weight) * gen_rank
            + float(self.args.agnn_align_weight) * align
            + float(self.args.agnn_vae_lambda) * (recon_loss + kl_loss)
            + reg_loss
        )

    def forward_tables(self, params):
        n_u, n_i = self.data.user_num, self.data.item_num
        u_all = self._gcn_embed(
            params, jnp.arange(n_u, dtype=jnp.int32), True, None
        )
        i_all = self._gcn_embed(
            params, jnp.arange(n_i, dtype=jnp.int32), False, None
        )
        # patch cold rows with mu-decoded VAE output
        if self.args.cold_object == "item":
            x = self._semantic_x(params, self.cold_idx, False, None)
            mu, _ = _vae_q(params["item_vae"], x)
            i_all = i_all.at[self.cold_idx].set(_vae_p(params["item_vae"], mu))
        else:
            x = self._semantic_x(params, self.cold_idx, True, None)
            mu, _ = _vae_q(params["user_vae"], x)
            u_all = u_all.at[self.cold_idx].set(_vae_p(params["user_vae"], mu))
        return u_all, i_all
