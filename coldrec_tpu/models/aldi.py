"""ALDI cold-start distillation (reference: model/ALDI.py). Item-only.

Teacher = frozen backbone tables; student = user tower (emb -> emb) and item
tower (content -> emb), both Linear-BN-tanh-Linear with truncated-normal
init (ALDI.py:191-208). Losses (ALDI.py:50-82): student BPR + gamma*|rating
distance| + alpha*BCE(student rank logit, sigmoid(teacher rank logit)) +
beta*BCE(identity logits), the latter two weighted by a tanh-capped item
frequency (tws flag; freq ALDI.py:12-22, weights 226-239). Optimizer: Adam
with weight decay on Linear params only, not BN affine (170-188).

Dual-table inference (ALDI.py:149-160): warm item columns are scored with
the backbone user embedding, cold columns with the user-tower output; items
in neither set score 0. Here both score matrices fold into ONE MXU matmul by
concatenating [warm_u ∥ cold_u] x [item*warm_mask ∥ item*cold_mask].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.losses import bpr_loss
from .cold_base import ColdStartModelBase
from .common import (
    adam,
    batchnorm_apply,
    batchnorm_params,
    batchnorm_state,
    linear,
    linear_params_tn,
)


def aldi_item_frequency(data) -> np.ndarray:
    """freq[i] = sum over users linked to i of 1/|user's train items|
    (ALDI.py:12-22); items with no train interactions keep 1.0."""
    freq = np.ones(data.item_num, dtype=np.float32)
    tp = data.train_pairs
    user_deg = np.diff(data.train_indptr)
    contrib = 1.0 / np.maximum(user_deg[tp[:, 0]], 1.0)
    sums = np.bincount(tp[:, 1], weights=contrib, minlength=data.item_num)
    has = np.bincount(tp[:, 1], minlength=data.item_num) > 0
    freq[has] = sums[has].astype(np.float32)
    return freq


def _tower_init(key, in_dim, hidden, out_dim):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_params_tn(k1, in_dim, hidden),
        "bn": batchnorm_params(hidden),
        "fc2": linear_params_tn(k2, hidden, out_dim),
    }


def _tower_apply(params, state, x, training, weight=None):
    h = linear(params["fc1"], x)
    h, new_state = batchnorm_apply(
        params["bn"], state, h, training, weight=weight
    )
    return linear(params["fc2"], jnp.tanh(h)), new_state


def _bce_logits(logits, targets):
    return (
        jnp.maximum(logits, 0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


class ALDI(ColdStartModelBase):
    stateful = True

    def __init__(self, config):
        super().__init__(config)
        self.require_item_cold()
        self.backbone = self.load_backbone()
        self.content = self.cold_side_content
        hidden = int(self.args.aldi_hidden)
        d = self.emb_size
        k1, k2 = jax.random.split(self.next_key())
        self.params = {
            "user_tower": _tower_init(k1, d, hidden, d),
            "item_tower": _tower_init(k2, self.content_dim, hidden, d),
        }
        self.net_state = {
            "user_bn": batchnorm_state(hidden),
            "item_bn": batchnorm_state(hidden),
        }
        self.alpha = float(self.args.alpha)
        self.beta = float(self.args.beta)
        self.gamma = float(self.args.gamma)

        # tanh-capped teacher-weight per item (ALDI.py:226-239)
        train_n = max(self.data.n_train, 1)
        x_expect = (train_n / max(self.data.item_num, 1)) * (
            1.0 / max(train_n / max(self.data.user_num, 1), 1e-12)
        )
        a = float(self.args.freq_coef_M) / float(x_expect)
        freq = aldi_item_frequency(self.data)
        cap = float(np.tanh(float(self.args.freq_coef_M)))
        if int(self.args.tws):
            tw = np.clip(np.tanh(a * freq), 0.0, cap)
        else:
            tw = np.ones_like(freq)
        self.pos_item_weights = jnp.asarray(tw)

        # masks for the dual-table scoring
        warm_mask = np.zeros(self.data.item_num, np.float32)
        warm_mask[self.data.mapped_warm_item_idx] = 1.0
        cold_mask = np.zeros(self.data.item_num, np.float32)
        cold_mask[self.data.mapped_cold_item_idx] = 1.0
        self._warm_mask = jnp.asarray(warm_mask)
        self._cold_mask = jnp.asarray(cold_mask)
        self.setup_optimizer()

    def setup_optimizer(self):
        # weight decay on Linear weights/biases only (ALDI.py:170-188)
        def label(path_tuple):
            return "decay"

        labels = jax.tree_util.tree_map_with_path(
            lambda path, _: (
                "no_decay"
                if any(getattr(p, "key", None) == "bn" for p in path)
                else "decay"
            ),
            self.params,
        )
        self.optimizer = optax.multi_transform(
            {
                "decay": adam(self.lr, weight_decay=self.reg),
                "no_decay": adam(self.lr),
            },
            labels,
        )
        self.opt_state = self.optimizer.init(self.params)
        from .common import make_train_step_aux

        def loss_no_key(params, state, batch):
            return self.loss_fn(params, state, batch, None)

        self._step = make_train_step_aux(loss_no_key, self.optimizer)
        self._forward_jit = jax.jit(self.forward_tables)
        self.user_emb, self.item_emb = self._forward_jit(
            self.params, self.net_state
        )
        self.best_user_emb, self.best_item_emb = self.user_emb, self.item_emb
        self._score_fn = None

    def loss_fn(self, params, state, batch, key):
        uid, iid, nid = batch["user"], batch["pos_item"], batch["neg_item"]
        w = batch["weight"]
        ue = self.backbone["user_emb"][uid]
        pe = self.backbone["item_emb"][iid]
        ne = self.backbone["item_emb"][nid]
        gen_u, s_u = _tower_apply(
            params["user_tower"], state["user_bn"], ue, True, weight=w
        )
        gen_p, s_i = _tower_apply(
            params["item_tower"], state["item_bn"], self.content[iid], True,
            weight=w,
        )
        gen_n, s_i2 = _tower_apply(
            params["item_tower"], s_i, self.content[nid], True, weight=w
        )
        new_state = {"user_bn": s_u, "item_bn": s_i2}

        basic = bpr_loss(gen_u, gen_p, gen_n, w)
        t_pos = jnp.sum(ue * pe, axis=1)
        t_neg = jnp.sum(ue * ne, axis=1)
        s_pos = jnp.sum(gen_u * gen_p, axis=1)
        s_neg = jnp.sum(gen_u * gen_n, axis=1)

        def wmean(x):
            return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)

        rating = self.gamma * wmean(
            jnp.abs(t_pos - s_pos) + jnp.abs(t_neg - s_neg)
        )
        pos_w = self.pos_item_weights[iid]
        rank_per = _bce_logits(s_pos - s_neg, jax.nn.sigmoid(t_pos - t_neg))
        ranking = self.alpha * wmean(pos_w * rank_per)
        w_sum = jnp.maximum(jnp.sum(w), 1.0)
        s_ii = jnp.sum(gen_p * gen_p, axis=1)
        s_ij = jnp.sum((gen_p @ gen_n.T) * w[None, :], axis=1) / w_sum
        t_ii = jnp.sum(pe * pe, axis=1)
        t_ij = jnp.sum((pe @ ne.T) * w[None, :], axis=1) / w_sum
        iden_per = _bce_logits(s_ii - s_ij, jax.nn.sigmoid(t_ii - t_ij))
        iden = self.beta * wmean(pos_w * iden_per)
        return basic + rating + ranking + iden, new_state

    def forward_tables(self, params, state):
        """Concatenated dual tables: one matmul covers warm+cold columns."""
        ue = self.backbone["user_emb"]
        ie = self.backbone["item_emb"]
        cold_u, _ = _tower_apply(params["user_tower"], state["user_bn"], ue, False)
        gen_items, _ = _tower_apply(
            params["item_tower"], state["item_bn"], self.content[self.cold_idx], False
        )
        item_patched = ie.at[self.cold_idx].set(gen_items)
        user_table = jnp.concatenate([ue, cold_u], axis=1)
        item_table = jnp.concatenate(
            [
                item_patched * self._warm_mask[:, None],
                item_patched * self._cold_mask[:, None],
            ],
            axis=1,
        )
        return user_table, item_table

    def extra_saved_tensors(self):
        # reference saves warm/cold user tables + patched item table
        # (ALDI.py:112-124); recover them from the concatenated eval tables
        d = self.emb_size
        u = np.asarray(self.best_user_emb)
        return {
            "warm_user_emb": u[:, :d],
            "cold_user_emb": u[:, d:],
        }
