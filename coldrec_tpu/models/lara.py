"""LARA cold-start conditional GAN (reference: model/LARA.py).

Generator: [content ∥ backbone emb] -> 3x tanh Linear -> fake embedding
(LARA.py:116-140); discriminator scores [content ∥ emb] (142-152). One joint
Adam over everything (17, 43): D gets real/fake/counter BCE terms, G fools D
— both terms backprop into both nets and into the (trainable) backbone
tables, exactly as the reference's single optimizer does. Uses the LARA
sampler (pos pair + negative user AND negative item, utils.py:160-188).
Eval: the cold-object side table is replaced ENTIRELY by generator output
for all entities (LARA.py:116-128).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data.sampler import pairwise_batches_with_neg_users
from .cold_base import ColdStartModelBase
from .common import linear, linear_params


def _bce_logits_mean(logits, targets, weight):
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    # reference applies BCE per-element then means over (B, d) logits
    w = weight.reshape((-1,) + (1,) * (loss.ndim - 1))
    return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w) * loss.shape[-1], 1.0)


class LARA(ColdStartModelBase):
    def __init__(self, config):
        super().__init__(config)
        backbone = self.load_backbone()
        d = self.emb_size
        cdim = self.content_dim
        keys = jax.random.split(self.next_key(), 6)
        self.params = {
            "user_emb": backbone["user_emb"],
            "item_emb": backbone["item_emb"],
            "G1": linear_params(keys[0], cdim + d, d),
            "G2": linear_params(keys[1], d, d),
            "G3": linear_params(keys[2], d, d),
            "D1": linear_params(keys[3], cdim + d, d),
            "D2": linear_params(keys[4], d, d),
            "D3": linear_params(keys[5], d, d),
        }
        self.content = self.cold_side_content
        self.setup_optimizer()

    def batches(self):
        return pairwise_batches_with_neg_users(
            self.data, self.batch_size, self.host_rng
        )

    def _generator(self, params, idx):
        table = (
            params["item_emb"]
            if self.args.cold_object == "item"
            else params["user_emb"]
        )
        x = jnp.concatenate([self.content[idx], table[idx]], axis=1)
        x = jnp.tanh(linear(params["G1"], x))
        x = jnp.tanh(linear(params["G2"], x))
        return jnp.tanh(linear(params["G3"], x))

    def _discriminator(self, params, idx, emb):
        x = jnp.concatenate([self.content[idx], emb], axis=1)
        x = jnp.tanh(linear(params["D1"], x))
        x = jnp.tanh(linear(params["D2"], x))
        return linear(params["D3"], x)  # logits (B, d)

    def loss_fn(self, params, batch, key):
        w = batch["weight"]
        if self.args.cold_object == "item":
            real_emb = params["user_emb"][batch["user"]]
            neg_emb = params["user_emb"][batch["neg_user"]]
            fake_emb = self._generator(params, batch["pos_item"])
            d_real = self._discriminator(params, batch["pos_item"], real_emb)
            d_fake = self._discriminator(params, batch["pos_item"], fake_emb)
            d_counter = self._discriminator(params, batch["neg_item"], neg_emb)
        else:
            real_emb = params["item_emb"][batch["pos_item"]]
            neg_emb = params["item_emb"][batch["neg_item"]]
            fake_emb = self._generator(params, batch["user"])
            d_real = self._discriminator(params, batch["user"], real_emb)
            d_fake = self._discriminator(params, batch["user"], fake_emb)
            d_counter = self._discriminator(params, batch["neg_user"], neg_emb)
        ones = jnp.ones_like(d_real)
        zeros = jnp.zeros_like(d_real)
        d_loss = (
            _bce_logits_mean(d_real, ones, w)
            + _bce_logits_mean(d_fake, zeros, w)
            + _bce_logits_mean(d_counter, zeros, w)
        )
        g_loss = _bce_logits_mean(d_fake, ones, w)
        return d_loss + g_loss

    def forward_tables(self, params):
        if self.args.cold_object == "item":
            fake = self._generator(
                params, jnp.arange(self.data.item_num, dtype=jnp.int32)
            )
            return params["user_emb"], fake
        fake = self._generator(
            params, jnp.arange(self.data.user_num, dtype=jnp.int32)
        )
        return fake, params["item_emb"]
