"""DropoutNet cold-start re-encoder (reference: model/DropoutNet.py).

DeepCF two-tower (Linear -> BatchNorm(momentum .01, eps .001) -> tanh blocks,
DropoutNet.py:222-236) over [backbone emb ∥ content] for the cold-object
side and plain backbone emb for the other; training target = frozen backbone
pair scores of pos and neg pairs (MSE); input dropout zeroes a random
fraction of cold-side embedding rows per batch (DropoutNet.py:110-121).
Divergence note: the reference zeroes exactly int(B*rate) rows of the real
batch; here the fraction applies to the fixed padded batch (same expected
rate on real rows). BatchNorm batch statistics are weighted by the batch's
real/pad weight vector so they match the reference's unpadded batches —
unweighted stats over heavily padded final batches (thousands of identical
gathered rows) measurably degrade small datasets. Eval re-encodes ALL
users+items through the towers in eval mode (running BN stats).
Linear init: truncated normal std 0.01, zero bias (DropoutNet.py:138-152).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .cold_base import ColdStartModelBase
from .common import (
    batchnorm_apply,
    batchnorm_params,
    batchnorm_state,
    linear,
    linear_params_tn,
)

BN_MOMENTUM = 0.01
BN_EPS = 0.001


def _tower_init(key, dims):
    keys = jax.random.split(key, len(dims))
    blocks = []
    for i in range(len(dims) - 2):
        blocks.append(
            {
                "lin": linear_params_tn(keys[i], dims[i], dims[i + 1]),
                "bn": batchnorm_params(dims[i + 1]),
            }
        )
    out = linear_params_tn(keys[-1], dims[-2], dims[-1])
    return {"blocks": blocks, "out": out}


def _tower_state(dims):
    return [batchnorm_state(d) for d in dims[1:-1]]


def _tower_apply(params, state, x, training, weight=None):
    new_state = []
    for blk, st in zip(params["blocks"], state):
        x = linear(blk["lin"], x)
        x, st2 = batchnorm_apply(
            blk["bn"],
            st,
            x,
            training,
            momentum=BN_MOMENTUM,
            eps=BN_EPS,
            weight=weight,
        )
        x = jnp.tanh(x)
        new_state.append(st2)
    return linear(params["out"], x), new_state


class DropoutNet(ColdStartModelBase):
    stateful = True
    uses_rng_in_loss = True

    def __init__(self, config):
        super().__init__(config)
        self.backbone = self.load_backbone()
        self.content = self.cold_side_content
        d = self.emb_size
        h1 = int(self.args.dropoutnet_hidden1)
        h2 = int(self.args.dropoutnet_hidden2)
        self.n_dropout = float(self.args.n_dropout)
        cold_in = d + self.content_dim
        if self.args.cold_object == "item":
            u_dims = [d, h1, h2, d]
            v_dims = [cold_in, h1, h2, d]
        else:
            u_dims = [cold_in, h1, h2, d]
            v_dims = [d, h1, h2, d]
        k1, k2 = jax.random.split(self.next_key())
        # The reference registers the loaded backbone tables in an
        # nn.ParameterDict and optimizes model.parameters() (DropoutNet.py:
        # 13,96-100) — so the backbone embeddings are FINE-TUNED during
        # DropoutNet training, with gradients through both the tower inputs
        # and the (undetached) pair_score MSE targets.
        self.params = {
            "u_tower": _tower_init(k1, u_dims),
            "v_tower": _tower_init(k2, v_dims),
            "user_emb": jnp.asarray(self.backbone["user_emb"]),
            "item_emb": jnp.asarray(self.backbone["item_emb"]),
        }
        self.net_state = {
            "u": _tower_state(u_dims),
            "v": _tower_state(v_dims),
        }
        self.setup_optimizer()

    def _encode(self, params, state, user_emb, item_emb, training):
        if self.args.cold_object == "item":
            u_in = user_emb
            v_in = jnp.concatenate(
                [item_emb, self.content[: item_emb.shape[0]]], axis=1
            )
        else:
            u_in = jnp.concatenate(
                [user_emb, self.content[: user_emb.shape[0]]], axis=1
            )
            v_in = item_emb
        u_out, su = _tower_apply(params["u_tower"], state["u"], u_in, training)
        v_out, sv = _tower_apply(params["v_tower"], state["v"], v_in, training)
        return u_out, v_out, {"u": su, "v": sv}

    def _encode_pairs(self, params, state, uid, iid, drop_key, weight=None):
        ue = params["user_emb"][uid]
        ie = params["item_emb"][iid]
        cold_emb = ie if self.args.cold_object == "item" else ue
        n = cold_emb.shape[0]
        n_zero = int(n * self.n_dropout)
        perm = jax.random.permutation(drop_key, n)
        mask = jnp.ones((n,)).at[perm[:n_zero]].set(0.0)
        cold_emb = cold_emb * mask[:, None]
        if self.args.cold_object == "item":
            content = self.content[iid]
            v_in = jnp.concatenate([cold_emb, content], axis=1)
            u_in = ue
        else:
            content = self.content[uid]
            u_in = jnp.concatenate([cold_emb, content], axis=1)
            v_in = ie
        u_out, su = _tower_apply(
            params["u_tower"], state["u"], u_in, True, weight=weight
        )
        v_out, sv = _tower_apply(
            params["v_tower"], state["v"], v_in, True, weight=weight
        )
        return jnp.sum(u_out * v_out, axis=1), {"u": su, "v": sv}

    def loss_fn(self, params, state, batch, key):
        k1, k2 = jax.random.split(key)
        ue = params["user_emb"]
        ie = params["item_emb"]
        pos_target = jnp.sum(
            ue[batch["user"]] * ie[batch["pos_item"]], axis=1
        )
        neg_target = jnp.sum(
            ue[batch["user"]] * ie[batch["neg_item"]], axis=1
        )
        w = batch["weight"]
        pos_pred, state = self._encode_pairs(
            params, state, batch["user"], batch["pos_item"], k1, weight=w
        )
        neg_pred, state = self._encode_pairs(
            params, state, batch["user"], batch["neg_item"], k2, weight=w
        )
        se = (pos_pred - pos_target) ** 2 * w + (neg_pred - neg_target) ** 2 * w
        loss = jnp.sum(se) / jnp.maximum(2 * jnp.sum(w), 1.0)
        return loss, state

    def forward_tables(self, params, state):
        u_out, v_out, _ = self._encode(
            params,
            state,
            params["user_emb"],
            params["item_emb"],
            training=False,
        )
        return u_out, v_out
