"""Heater cold-start re-encoder (reference: model/Heater.py).

Mixture-of-experts content tower: n_expert SHARED-weight FC experts (the
reference calls the same DenseFC n times, Heater.py:191-194 — the expert
mix reduces to gate.sum() * fc(content), reproduced here exactly), tanh
gate, similarity-constraint diff loss alpha*sum||content_emb - emb||^2
(Heater.py:197), randomized blend emb*(1-p) + content_emb*p (198), shared
out/trans Linears (218-222). Target = frozen backbone pair scores (MSE).
Eval re-encodes all users+items (127-136). Backbone frozen (105-106).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .cold_base import ColdStartModelBase
from .common import linear, linear_params


class Heater(ColdStartModelBase):
    def __init__(self, config):
        super().__init__(config)
        self.backbone = self.load_backbone()
        self.content = self.cold_side_content
        d = self.emb_size
        h1 = int(self.args.heater_mlp_hidden)
        self.alpha = float(self.args.alpha)
        self.n_expert = int(self.args.n_expert)
        self.n_dropout = float(self.args.n_dropout)
        keys = jax.random.split(self.next_key(), 5)
        self.params = {
            "fc1": linear_params(keys[0], self.content_dim, h1),
            "fc2": linear_params(keys[1], h1, d),
            "gate": linear_params(keys[2], self.content_dim, self.n_expert),
            "out": linear_params(keys[3], d, d),
            "trans": linear_params(keys[4], d, d),
        }
        self.setup_optimizer()

    def _content_emb(self, params, content):
        """tanh(bmm(gate, expert stack)); experts share weights so the mix is
        (sum_e gate_e) * fc(content) (Heater.py:187-195)."""
        gate = jnp.tanh(linear(params["gate"], content))  # (B, E)
        h = jnp.tanh(linear(params["fc1"], content))
        expert = jnp.tanh(linear(params["fc2"], h))  # (B, d)
        return jnp.tanh(jnp.sum(gate, axis=1, keepdims=True) * expert)

    def _encode(self, params, user_emb, item_emb, content, weight=None):
        """Returns (U_emb, V_emb, diff_loss) for cold_object side = content."""
        cold_in = item_emb if self.args.cold_object == "item" else user_emb
        c_last = self._content_emb(params, content)
        sq = jnp.sum((c_last - cold_in) ** 2, axis=1)
        if weight is not None:
            sq = sq * weight
        diff_loss = self.alpha * jnp.sum(sq)
        keep = 1.0 - self.n_dropout
        blended = cold_in * keep + c_last * (1.0 - keep)
        if self.args.cold_object == "item":
            u_last, v_last = user_emb, blended
        else:
            u_last, v_last = blended, item_emb
        u_last = jnp.tanh(linear(params["out"], u_last))
        v_last = jnp.tanh(linear(params["out"], v_last))
        return (
            linear(params["trans"], u_last),
            linear(params["trans"], v_last),
            diff_loss,
        )

    def _pair_pred(self, params, uid, iid, weight):
        ue = self.backbone["user_emb"][uid]
        ie = self.backbone["item_emb"][iid]
        cid = iid if self.args.cold_object == "item" else uid
        u, v, diff = self._encode(params, ue, ie, self.content[cid], weight)
        return jnp.sum(u * v, axis=1), diff

    def loss_fn(self, params, batch, key):
        ue = self.backbone["user_emb"]
        ie = self.backbone["item_emb"]
        w = batch["weight"]
        pos_t = jnp.sum(ue[batch["user"]] * ie[batch["pos_item"]], axis=1)
        neg_t = jnp.sum(ue[batch["user"]] * ie[batch["neg_item"]], axis=1)
        pos_p, diff1 = self._pair_pred(params, batch["user"], batch["pos_item"], w)
        neg_p, diff2 = self._pair_pred(params, batch["user"], batch["neg_item"], w)
        se = ((pos_p - pos_t) ** 2 + (neg_p - neg_t) ** 2) * w
        mse = jnp.sum(se) / jnp.maximum(2 * jnp.sum(w), 1.0)
        return mse + diff1 + diff2

    def forward_tables(self, params):
        n_u, n_i = self.data.user_num, self.data.item_num
        ue = self.backbone["user_emb"]
        ie = self.backbone["item_emb"]
        content = self.content[: (n_i if self.args.cold_object == "item" else n_u)]
        u, v, _ = self._encode(params, ue, ie, content)
        return u, v
