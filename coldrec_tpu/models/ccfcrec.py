"""CCFCRec cold-start model (reference: model/CCFCRec.py). Item-only.

Attribute attention (learned global attribute scores + magnitude gating
over continuous content, CCFCRec.py:199-219) -> 2-layer generator MLP ->
q_v_c; contrastive terms: q_v_c vs P positive co-occurring items with a
PxN negative grid, plus self-contrast vs the item's own embedding
(CCFCRec.py:53-75); BPR-style rank terms on both the real and generated
embeddings vs a negative user (77-87); lambda1 blend. Optional backbone
pretrain (frozen or trainable). Eval patches cold item rows with q_v_c.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data.sampler import ccfcrec_batches, warm_item_pool
from .cold_base import ColdStartModelBase
from .common import linear


def _xavier_normal(key, shape):
    fan_in, fan_out = shape[-2], shape[-1]
    std = (2.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.normal(key, shape) * std


class CCFCRec(ColdStartModelBase):
    def __init__(self, config):
        super().__init__(config)
        self.require_item_cold()
        a_dim = int(self.args.attr_present_dim)
        i_dim = int(self.args.implicit_dim)
        cat_dim = int(self.args.cat_implicit_dim)
        self.tau = float(self.args.tau)
        self.lambda1 = float(self.args.lambda1)
        self.P = int(self.args.positive_number)
        self.N = int(self.args.negative_number)
        self.S = int(self.args.self_neg_number)
        self.content = self.cold_side_content
        self.uses_missing_sentinel = (
            float((self.content == -1).mean()) > 0.01
        )
        keys = jax.random.split(self.next_key(), 8)
        if bool(self.args.pretrain):
            backbone = self.load_backbone()
            user_emb = backbone["user_emb"]
            item_emb = backbone["item_emb"]
            self._emb_trainable = bool(self.args.pretrain_update)
        else:
            user_emb = _xavier_normal(keys[0], (self.data.user_num, i_dim))
            item_emb = _xavier_normal(keys[1], (self.data.item_num, i_dim))
            self._emb_trainable = True
        emb_dim = int(item_emb.shape[1])
        self.params = {
            "user_embedding": user_emb,
            "item_embedding": item_emb,
            "attr_matrix": _xavier_normal(keys[2], (self.content_dim, a_dim)),
            "attr_W1": _xavier_normal(keys[3], (a_dim, a_dim)),
            "attr_b1": _xavier_normal(keys[4], (a_dim, 1)),
            "attr_W2": _xavier_normal(keys[5], (a_dim, 1)),
            "gen1": {
                "w": _xavier_normal(keys[6], (a_dim, cat_dim)),
                "b": jnp.zeros((cat_dim,)),
            },
            "gen2": {
                "w": _xavier_normal(keys[7], (cat_dim, emb_dim)),
                "b": jnp.zeros((emb_dim,)),
            },
        }
        self._pool = warm_item_pool(self.data)
        self.setup_optimizer()

    def batches(self):
        return ccfcrec_batches(
            self.data, self.batch_size, self.host_rng,
            self.P, self.N, self.S, self._pool,
        )

    # ------------------------------------------------------------ generator
    def _q_v_c(self, params, i_idx):
        """Attribute attention + generator (CCFCRec.py:189-222)."""
        eps = 1e-8
        attribute = self.content[i_idx]
        if self.uses_missing_sentinel:
            valid = attribute != -1
            value = jnp.where(valid, attribute, 0.0)
        else:
            valid = jnp.ones_like(attribute, dtype=bool)
            value = attribute
        z_v = (
            (params["attr_matrix"] @ params["attr_W1"] + params["attr_b1"][:, 0])
            @ params["attr_W2"]
        )[:, 0]
        magnitude = jnp.abs(value)
        active = valid & (magnitude > eps)
        has_active = jnp.any(active, axis=1, keepdims=True)
        effective = jnp.where(has_active, active, valid)
        z_v_mask = z_v[None, :] + jnp.log(jnp.maximum(magnitude, eps))
        z_v_mask = jnp.where(effective, z_v_mask, -1e6)
        attn = jax.nn.softmax(z_v_mask, axis=1)
        weighted = jnp.where(has_active, attn * value, attn)
        q_v_a = weighted @ params["attr_matrix"]
        h = jax.nn.leaky_relu(linear(params["gen1"], q_v_a))
        return linear(params["gen2"], h)

    def loss_fn(self, params, batch, key):
        if not self._emb_trainable:
            params = {
                **params,
                "user_embedding": jax.lax.stop_gradient(params["user_embedding"]),
                "item_embedding": jax.lax.stop_gradient(params["item_embedding"]),
            }
        w = batch["weight"]
        q_v_c = self._q_v_c(params, batch["pos_item"])  # (B, d)
        ie = params["item_embedding"]
        ue = params["user_embedding"]

        def cos_sim(a, b):
            na = jnp.maximum(jnp.linalg.norm(a, axis=-1), 1e-12)
            nb = jnp.maximum(jnp.linalg.norm(b, axis=-1), 1e-12)
            return jnp.sum(a * b, axis=-1) / (self.tau * na * nb)

        pos_emb = ie[batch["pos_grid"]]  # (B, P, d)
        pos_exp = jnp.exp(cos_sim(q_v_c[:, None, :], pos_emb))  # (B, P)
        neg_emb = ie[batch["neg_grid"]]  # (B, P, N, d)
        neg_exp = jnp.exp(cos_sim(q_v_c[:, None, None, :], neg_emb))
        neg_sum = jnp.sum(neg_exp, axis=2)  # (B, P)
        contrast = -jnp.log(pos_exp / (pos_exp + neg_sum))
        contrast_sum = jnp.sum(jnp.sum(contrast, axis=1) * w) / self.P

        self_neg_emb = ie[batch["self_negs"]]  # (B, S, d)
        self_neg_sum = jnp.sum(
            jnp.exp(cos_sim(q_v_c[:, None, :], self_neg_emb)), axis=1
        )
        self_pos_exp = jnp.exp(cos_sim(q_v_c, ie[batch["pos_item"]]))
        self_contrast = -jnp.log(self_pos_exp / (self_pos_exp + self_neg_sum))
        self_contrast_sum = jnp.sum(self_contrast * w)

        item_emb = ie[batch["pos_item"]]
        user_emb = ue[batch["user"]]
        neg_user_emb = ue[batch["neg_user"]]
        y_uv = jnp.sum(item_emb * user_emb, axis=1)
        y_kv = jnp.sum(item_emb * neg_user_emb, axis=1)
        rank1 = -jnp.sum(jax.nn.log_sigmoid(y_uv - y_kv) * w)
        y_uv2 = jnp.sum(q_v_c * user_emb, axis=1)
        y_kv2 = jnp.sum(q_v_c * neg_user_emb, axis=1)
        rank2 = -jnp.sum(jax.nn.log_sigmoid(y_uv2 - y_kv2) * w)
        return self.lambda1 * (contrast_sum + self_contrast_sum) + (
            1 - self.lambda1
        ) * (rank1 + rank2)

    def forward_tables(self, params):
        gen = self._q_v_c(params, self.cold_idx)
        return self.patch_cold_rows(
            params["user_embedding"], params["item_embedding"], gen
        )
