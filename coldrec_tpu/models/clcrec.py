"""CLCRec cold-start model (reference: model/CLCRec.py). Item-only.

Contrastive U-I and I-feature learning: 2-layer leaky-relu content encoder
(CLCRec.py:106-115); loss1 = NCE(pos-item emb, item features over the
(1+num_neg) group), loss2 = NCE(user emb, hybrid item set where a
``num_sample`` fraction of item embeddings is replaced by features)
(125-148); negatives are warm-only pool samples without replacement
(utils.py:191-233); reg = mean row-norm of user/item embeddings.
Eval: learned tables with cold item rows = encoder(content) (155-157).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data.sampler import pairwise_batches_multi_neg, warm_item_pool
from .cold_base import ColdStartModelBase
from .common import linear, linear_params, xavier_uniform


class CLCRec(ColdStartModelBase):
    uses_rng_in_loss = True

    def __init__(self, config):
        super().__init__(config)
        self.require_item_cold()
        self.num_neg = int(self.args.num_neg)
        self.temp = float(self.args.temp_value)
        self.lr_lambda = float(self.args.lr_lambda)
        self.num_sample = float(self.args.num_sample)
        keys = jax.random.split(self.next_key(), 4)
        self.params = {
            "user_emb": xavier_uniform(keys[0], (self.data.user_num, self.emb_size)),
            "item_emb": xavier_uniform(keys[1], (self.data.item_num, self.emb_size)),
            "enc1": linear_params(keys[2], self.content_dim, 256),
            "enc2": linear_params(keys[3], 256, self.emb_size),
        }
        self.content = self.cold_side_content
        self._pool = warm_item_pool(self.data)
        self.setup_optimizer()

    def batches(self):
        return pairwise_batches_multi_neg(
            self.data, self.batch_size, self.host_rng, self.num_neg, self._pool
        )

    def _encode(self, params, idx):
        x = jax.nn.leaky_relu(linear(params["enc1"], self.content[idx]))
        return linear(params["enc2"], x)

    def _group_nce(self, anchor, others, weight):
        """-log(pos/sum) over (B, 1+num_neg) groups (CLCRec.py:117-123)."""
        scores = jnp.exp(
            jnp.sum(anchor * others, axis=-1) / self.temp
        )  # (B, 1+n)
        pos = scores[:, 0]
        loss = -jnp.log(pos / jnp.sum(scores, axis=1))
        return jnp.sum(loss * weight) / jnp.maximum(jnp.sum(weight), 1.0)

    def loss_fn(self, params, batch, key, rand_index=None):
        """``rand_index`` (optional) overrides the hybrid-set replacement
        draw — the torch-oracle test injects the same indices into both
        frameworks (CLCRec.py:142-144)."""
        b = batch["user"].shape[0]
        n1 = 1 + self.num_neg
        # (B, 1+n) item groups: col 0 = positive, rest = warm negatives
        items = jnp.concatenate(
            [batch["pos_item"][:, None], batch["neg_items"]], axis=1
        )
        w = batch["weight"]
        users = batch["user"]
        feats = self._encode(params, items.reshape(-1)).reshape(b, n1, -1)
        item_embs = params["item_emb"][items]
        pos_item_emb = params["item_emb"][batch["pos_item"]][:, None, :]
        user_emb = params["user_emb"][users][:, None, :]

        def _norm(x):
            return x / jnp.maximum(
                jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12
            )

        head_feat = _norm(feats)
        head_embed = _norm(pos_item_emb)

        # hybrid set: num_sample fraction of flattened rows replaced by feats
        flat_emb = item_embs.reshape(b * n1, -1)
        flat_feat = feats.reshape(b * n1, -1)
        if rand_index is None:
            n_replace = int(b * n1 * self.num_sample)
            rand_index = jax.random.randint(key, (n_replace,), 0, b * n1)
        hybrid = flat_emb.at[rand_index].set(flat_feat[rand_index])
        hybrid = hybrid.reshape(b, n1, -1)

        loss1 = self._group_nce(head_embed, head_feat, w)
        loss2 = self._group_nce(user_emb, hybrid, w)
        w_rep = jnp.repeat(w, n1)
        reg = (
            jnp.sum(jnp.linalg.norm(user_emb[:, 0], axis=1) * w)
            / jnp.maximum(jnp.sum(w), 1.0)
            + jnp.sum(
                jnp.linalg.norm(flat_emb, axis=1) * w_rep
            )
            / jnp.maximum(jnp.sum(w_rep), 1.0)
        ) / 2.0
        return (
            self.lr_lambda * loss1
            + (1 - self.lr_lambda) * loss2
            + self.reg * reg
        )

    def forward_tables(self, params):
        gen = self._encode(params, self.cold_idx)
        return self.patch_cold_rows(
            params["user_emb"], params["item_emb"], gen
        )
