"""MetaEmbedding cold-start generator (reference: model/MetaEmbedding.py).

MAML-lite: meta embedding = Dense(content)/5 (MetaEmbedding.py:129-138);
loss_a = BCE-with-logits of scores using the meta embedding; one gradient
step with lr/10 on the meta embedding gives the adapted embedding; loss_b
re-scores with it; total = alpha*loss_a + (1-alpha)*loss_b
(MetaEmbedding.py:30-47). The reference's second-order
``torch.autograd.grad(retain_graph=True)`` (194) is a nested ``jax.grad``.
Backbone tables frozen; eval patches cold rows with the meta embeddings.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .cold_base import ColdStartModelBase
from .common import linear, linear_params


def _bce_with_logits(logits, targets, weight):
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    return jnp.sum(loss * weight) / jnp.maximum(jnp.sum(weight), 1.0)


class MetaEmbedding(ColdStartModelBase):
    def __init__(self, config):
        super().__init__(config)
        self.backbone = self.load_backbone()
        self.content = self.cold_side_content
        self.cold_lr = self.lr / 10.0
        self.alpha = float(self.args.alpha)
        self.params = {
            "dense": linear_params(
                self.next_key(), self.content_dim, self.emb_size
            )
        }
        self.setup_optimizer()

    def _meta_emb(self, params, idx):
        return linear(params["dense"], self.content[idx]) / 5.0

    def loss_fn(self, params, batch, key):
        uid = jnp.concatenate([batch["user"], batch["user"]])
        iid = jnp.concatenate([batch["pos_item"], batch["neg_item"]])
        w = jnp.concatenate([batch["weight"], batch["weight"]])
        n = batch["user"].shape[0]
        targets = jnp.concatenate([jnp.ones((n,)), jnp.zeros((n,))])
        ue = self.backbone["user_emb"][uid]
        ie = self.backbone["item_emb"][iid]

        cold_idx = iid if self.args.cold_object == "item" else uid
        meta = self._meta_emb(params, cold_idx)

        def loss_a_of(meta_emb):
            if self.args.cold_object == "item":
                y = jnp.sum(ue * meta_emb, axis=1)
            else:
                y = jnp.sum(meta_emb * ie, axis=1)
            return _bce_with_logits(y, targets, w)

        loss_a, grads = jax.value_and_grad(loss_a_of)(meta)
        adapted = meta - self.cold_lr * grads  # differentiable through grads
        loss_b = loss_a_of(adapted)
        return self.alpha * loss_a + (1 - self.alpha) * loss_b

    def forward_tables(self, params):
        gen = self._meta_emb(params, self.cold_idx)
        return self.patch_cold_rows(
            self.backbone["user_emb"], self.backbone["item_emb"], gen
        )
