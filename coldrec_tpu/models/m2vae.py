"""M2VAE hierarchical multimodal VAE (reference: model/M2VAE.py). Item-only.

Attribute-attention view a_v + content-projection view c_v (M2VAE.py:271-287);
per-view Gaussian encoders, product-of-experts fusion (27-33), user-gated MoE
mixing of view posteriors, view_gate blend, MoPoE average with the item-emb
posterior (289-349); decoder on [z ∥ a_v ∥ c_v]; loss = KLD (prior from
fc2([a_v, c_v])) + recon + rank + CCFCRec-style contrast + decoupling InfoNCE
(373-402). Cold inference drops the user branch (404-419). Optimizer: Adam
with global weight decay (59-63); optional frozen/trainable backbone
pretrain (via multi_transform masking).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..data.sampler import ccfcrec_batches, warm_item_pool
from .cold_base import ColdStartModelBase
from .common import (
    batchnorm_apply,
    batchnorm_params,
    batchnorm_state,
    linear,
    linear_params,
    make_train_step_aux,
    xavier_uniform,
)


def _xavier_normal(key, shape):
    fan_in, fan_out = shape[-2], shape[-1]
    std = (2.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.normal(key, shape) * std


def _kl_to_std(mu, logvar, w):
    """-0.5 * sum(1 - e^lv - mu^2 + lv), batch-summed, pad rows masked."""
    el = 1 - jnp.exp(logvar) - mu**2 + logvar
    return -0.5 * jnp.sum(el * w[:, None])


def _kl_between(mu0, lv0, mu1, lv1, w):
    el = 1 - jnp.exp(lv0) / jnp.exp(lv1) - (mu0 - mu1) ** 2 / jnp.exp(lv1) + lv0 - lv1
    return -0.5 * jnp.sum(el * w[:, None])


def _poe(mu_a, lv_a, mu_c, lv_c, eps=1e-8):
    var_a = jnp.exp(lv_a) + eps
    var_c = jnp.exp(lv_c) + eps
    prec = 1.0 / var_a + 1.0 / var_c
    pd_mu = (mu_a / var_a + mu_c / var_c) / prec
    pd_var = 1.0 / prec
    return pd_mu, jnp.log(pd_var + eps)


def _norm(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def _infonce_3(tau, e1, e2, e3, w):
    """cross_entropy([cos(e1,e2) | e1 @ e3.T], label 0) with pad columns
    masked out of the in-batch negatives (M2VAE.py:36-45)."""
    n1, n2, n3 = _norm(e1), _norm(e2), _norm(e3)
    pos = jnp.sum(n1 * n2, axis=-1) / tau
    negs = (n1 @ n3.T) / tau
    neg_inf = jnp.finfo(negs.dtype).min
    negs = jnp.where(w[None, :] > 0, negs, neg_inf)
    logits = jnp.concatenate([pos[:, None], negs], axis=1)
    lp = logits[:, 0] - jax.nn.logsumexp(logits, axis=1)
    return -jnp.sum(lp * w) / jnp.maximum(jnp.sum(w), 1.0)


class M2VAE(ColdStartModelBase):
    stateful = True
    uses_rng_in_loss = True

    def __init__(self, config):
        super().__init__(config)
        self.require_item_cold()
        self.content = self.cold_side_content
        d = int(self.args.implicit_dim)
        a_dim = int(self.args.attr_present_dim)
        cat_dim = int(self.args.cat_implicit_dim)
        c_dim = self.content_dim
        self.tau = float(self.args.tau)
        self.P = int(self.args.positive_number)
        self.N = int(self.args.negative_number)
        self._frozen_emb = False
        keys = jax.random.split(self.next_key(), 40)
        ki = iter(range(40))

        if bool(self.args.m2vae_pretrain):
            backbone = self.load_backbone()
            user_emb = backbone["user_emb"]
            item_emb = backbone["item_emb"]
            d = a_dim = cat_dim = int(user_emb.shape[1])
            self.args.implicit_dim = self.args.attr_present_dim = d
            self.args.cat_implicit_dim = d
            self._frozen_emb = not bool(self.args.m2vae_pretrain_update)
        else:
            user_emb = _xavier_normal(keys[next(ki)], (self.data.user_num, d))
            item_emb = _xavier_normal(keys[next(ki)], (self.data.item_num, d))
        self.d = d

        def lin(i, o):
            return linear_params(keys[next(ki)], i, o)

        self.params = {
            "user_embedding": user_emb,
            "item_embedding": item_emb,
            "attr_matrix": _xavier_normal(keys[next(ki)], (c_dim, a_dim)),
            "attr_W1": _xavier_normal(keys[next(ki)], (a_dim, a_dim)),
            "attr_b1": _xavier_normal(keys[next(ki)], (a_dim, 1)),
            "attr_W2": _xavier_normal(keys[next(ki)], (a_dim, 1)),
            "content_projection": {
                "w": _xavier_normal(keys[next(ki)], (c_dim, d))
            },
            "moe_gate_a": [lin(d, d // 2), lin(d // 2, 1)],
            "moe_gate_c": [lin(d, d // 2), lin(d // 2, 1)],
            "user_gate_w": xavier_uniform(keys[next(ki)], (2, d, d)),
            "user_gate_b": jnp.zeros((2, d)),
            "view_gate": [lin(2 * d, d), lin(d, 1)],
            "fc2": {"lin": lin(2 * a_dim, cat_dim), "bn": batchnorm_params(a_dim)},
            "fc3": {
                "lin": lin(a_dim + 2 * d, cat_dim),
                "bn": batchnorm_params(cat_dim),
            },
            "decoder": {"lin": lin(cat_dim, d), "bn": batchnorm_params(d)},
            "mean_a_q": lin(a_dim, d),
            "log_a_q": lin(a_dim, d),
            "mean_c_q": lin(d, d),
            "log_c_q": lin(d, d),
            "mean_i": lin(d, d),
            "log_i": lin(d, d),
            "mean_a_p": lin(d, d),
            "log_a_p": lin(d, d),
        }
        self.net_state = {
            "fc2": batchnorm_state(a_dim),
            "fc3": batchnorm_state(cat_dim),
            "decoder": batchnorm_state(d),
            "eval_key": jax.random.PRNGKey(0),
        }
        self._pool = warm_item_pool(self.data)
        self.setup_optimizer()

    def setup_optimizer(self):
        wd = float(self.args.m2vae_weight_decay)
        if self._frozen_emb:
            labels = jax.tree_util.tree_map_with_path(
                lambda path, _: (
                    "frozen"
                    if any(
                        getattr(p, "key", None)
                        in ("user_embedding", "item_embedding")
                        for p in path
                    )
                    else "train"
                ),
                self.params,
            )
            self.optimizer = optax.multi_transform(
                {
                    "train": optax.chain(
                        optax.add_decayed_weights(wd), optax.adam(self.lr)
                    ),
                    "frozen": optax.set_to_zero(),
                },
                labels,
            )
        else:
            self.optimizer = optax.chain(
                optax.add_decayed_weights(wd), optax.adam(self.lr)
            )
        self.opt_state = self.optimizer.init(self.params)
        self._step = make_train_step_aux(self.loss_fn, self.optimizer)
        self._forward_jit = jax.jit(self.forward_tables)
        self.user_emb, self.item_emb = self._forward_jit(
            self.params, self.net_state
        )
        self.best_user_emb, self.best_item_emb = self.user_emb, self.item_emb
        self._score_fn = None

    def batches(self):
        return ccfcrec_batches(
            self.data, self.batch_size, self.host_rng,
            self.P, self.N, 1, self._pool,
        )

    def epoch_hook(self, epoch):
        self.net_state = dict(self.net_state)
        self.net_state["eval_key"] = self.next_key()

    # -------------------------------------------------------------- encoders
    def _encode_views(self, params, i_idx):
        attribute = self.content[i_idx]
        z_v = (
            (params["attr_matrix"] @ params["attr_W1"] + params["attr_b1"][:, 0])
            @ params["attr_W2"]
        )[:, 0]
        z_v = jnp.broadcast_to(z_v[None, :], attribute.shape)
        if bool(getattr(self.args, "m2vae_attr_mask_neg1", False)):
            z_v = jnp.where(attribute == -1, -1e6, z_v)
        else:
            valid = attribute != 0
            all_zero = jnp.sum(valid, axis=1, keepdims=True) == 0
            valid = valid | all_zero
            z_v = jnp.where(valid, z_v, -1e6)
        attn = jax.nn.softmax(z_v, axis=1)
        a_v = attn @ params["attr_matrix"]
        c_v = attribute @ params["content_projection"]["w"]
        return a_v, c_v

    def _mlp2(self, params, x, act):
        return linear(params[1], act(linear(params[0], x)))

    def _bn_block(self, blk, st, x, training, weight=None):
        h = linear(blk["lin"], x)
        h, st2 = batchnorm_apply(blk["bn"], st, h, training, weight=weight)
        return jnp.tanh(h), st2

    def loss_fn(self, params, state, batch, key):
        if self._frozen_emb:
            params = {
                **params,
                "user_embedding": jax.lax.stop_gradient(params["user_embedding"]),
                "item_embedding": jax.lax.stop_gradient(params["item_embedding"]),
            }
        w = batch["weight"]
        u_idx, i_idx = batch["user"], batch["pos_item"]
        user_emb = params["user_embedding"][u_idx]
        a_v, c_v = self._encode_views(params, i_idx)
        i_v = params["item_embedding"][i_idx]
        k1, k2, k3, k4 = jax.random.split(key, 4)

        mean_i = linear(params["mean_i"], i_v)
        log_i = linear(params["log_i"], i_v)
        mean_a_q = linear(params["mean_a_q"], a_v)
        log_a_q = linear(params["log_a_q"], a_v)
        z_a = mean_a_q + jnp.exp(0.5 * log_a_q) * jax.random.normal(
            k1, mean_a_q.shape
        )
        h1, st_fc2 = self._bn_block(
            params["fc2"], state["fc2"], jnp.concatenate([a_v, c_v], -1), True,
            weight=w,
        )
        mean_p = linear(params["mean_a_p"], h1)
        log_p = linear(params["log_a_p"], h1)
        mean_c_q = linear(params["mean_c_q"], c_v)
        log_c_q = linear(params["log_c_q"], c_v)
        z_c = mean_c_q + jnp.exp(0.5 * log_c_q) * jax.random.normal(
            k2, mean_c_q.shape
        )
        mean_p1, log_p1 = _poe(mean_a_q, log_a_q, mean_c_q, log_c_q)
        z_p = mean_p1 + jnp.exp(0.5 * log_p1) * jax.random.normal(
            k3, mean_p1.shape
        )

        # user-gated MoE mixing (M2VAE.py:309-321)
        gate_logit = (
            jnp.einsum("bd,mdh->mbh", user_emb, params["user_gate_w"])
            + params["user_gate_b"][:, None, :]
        )
        gates = jax.nn.sigmoid(gate_logit)
        user_a = user_emb * gates[0]
        user_c = user_emb * gates[1]
        moe_a = self._mlp2(params["moe_gate_a"], user_a * z_a * z_p, jnp.tanh)
        moe_c = self._mlp2(params["moe_gate_c"], user_c * z_c * z_p, jnp.tanh)
        moe_w = jax.nn.softmax(jnp.concatenate([moe_a, moe_c], 1), axis=1)
        mean_u = moe_w[:, 0:1] * mean_a_q + moe_w[:, 1:2] * mean_c_q
        log_u = moe_w[:, 0:1] * log_a_q + moe_w[:, 1:2] * log_c_q

        com_w = jax.nn.sigmoid(
            self._mlp2(
                params["view_gate"],
                jnp.concatenate([user_emb, z_p], 1),
                jax.nn.leaky_relu,
            )
        )
        mean_q = com_w * mean_p1 + (1 - com_w) * mean_u
        log_q = com_w * log_p1 + (1 - com_w) * log_u
        mean_mopoe = 0.5 * (mean_q + mean_i)
        log_mopoe = 0.5 * (log_q + log_i)
        z = mean_mopoe + jnp.exp(0.5 * log_mopoe) * jax.random.normal(
            k4, mean_mopoe.shape
        )
        h3, st_fc3 = self._bn_block(
            params["fc3"], state["fc3"],
            jnp.concatenate([z, a_v, c_v], -1), True, weight=w,
        )
        decoder, st_dec = self._bn_block(
            params["decoder"], state["decoder"], h3, True, weight=w
        )
        new_state = {
            "fc2": st_fc2, "fc3": st_fc3, "decoder": st_dec,
            "eval_key": state["eval_key"],
        }

        decouple = _infonce_3(self.tau, z_a, a_v, z_p, w) + _infonce_3(
            self.tau, z_c, c_v, z_p, w
        )
        kld = _kl_between(mean_mopoe, log_mopoe, mean_p, log_p, w)
        kld = kld + (
            _kl_to_std(mean_i, log_i, w)
            + _kl_to_std(mean_c_q, log_c_q, w)
            + _kl_to_std(mean_a_q, log_a_q, w)
        ) / 3.0
        recon = jnp.sum(
            jnp.sum((i_v - decoder) ** 2, axis=1) * w
        ) / jnp.maximum(jnp.sum(w), 1.0)

        ie = params["item_embedding"]

        def cos(a, b):
            na = jnp.maximum(jnp.linalg.norm(a, axis=-1), 1e-12)
            nb = jnp.maximum(jnp.linalg.norm(b, axis=-1), 1e-12)
            return jnp.sum(a * b, axis=-1) / (self.tau * na * nb)

        pos_emb = ie[batch["pos_grid"]]
        neg_emb = ie[batch["neg_grid"]]
        pos_exp = jnp.exp(cos(decoder[:, None, :], pos_emb))
        neg_sum = jnp.sum(jnp.exp(cos(decoder[:, None, None, :], neg_emb)), axis=2)
        contrast = -jnp.log(pos_exp / (pos_exp + neg_sum))
        contrast_sum = jnp.sum(jnp.sum(contrast, axis=1) * w) / self.P

        pos_u = params["user_embedding"][u_idx]
        neg_u = params["user_embedding"][batch["neg_user"]]
        y_uv = jnp.sum(decoder * pos_u, axis=1)
        y_kv = jnp.sum(decoder * neg_u, axis=1)
        rank_sum = -jnp.sum(jax.nn.log_sigmoid(y_uv - y_kv) * w)

        total = (
            float(self.args.m2vae_kld_weight) * kld
            + float(self.args.m2vae_recon_weight) * recon
            + rank_sum
            + contrast_sum
            + float(self.args.m2vae_decouple_weight) * decouple
        )
        return total, new_state

    # ----------------------------------------------------------------- eval
    def _generate(self, params, state, idx, key):
        a_v, c_v = self._encode_views(params, idx)
        i_v = params["item_embedding"][idx]
        mean_i = linear(params["mean_i"], i_v)
        log_i = linear(params["log_i"], i_v)
        mean_a_q = linear(params["mean_a_q"], a_v)
        log_a_q = linear(params["log_a_q"], a_v)
        mean_c_q = linear(params["mean_c_q"], c_v)
        log_c_q = linear(params["log_c_q"], c_v)
        mean_p1, log_p1 = _poe(mean_a_q, log_a_q, mean_c_q, log_c_q)
        mean_mopoe = 0.5 * (mean_p1 + mean_i)
        log_mopoe = 0.5 * (log_p1 + log_i)
        z = mean_mopoe + jnp.exp(0.5 * log_mopoe) * jax.random.normal(
            key, mean_mopoe.shape
        )
        h3, _ = self._bn_block(
            params["fc3"], state["fc3"], jnp.concatenate([z, a_v, c_v], -1), False
        )
        out, _ = self._bn_block(params["decoder"], state["decoder"], h3, False)
        return out

    def forward_tables(self, params, state):
        gen = self._generate(params, state, self.cold_idx, state["eval_key"])
        return self.patch_cold_rows(
            params["user_embedding"], params["item_embedding"], gen
        )
