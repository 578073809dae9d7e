"""NCL warm backbone (reference: model/NCL.py).

LightGCN propagation + two SSL terms:

  * layer-contrast loss between layer-0 and layer-(2*hyper_layers)
    embeddings, negatives = ALL embeddings, sum-reduced (NCL.py:68-94);
  * ProtoNCE against k-means centroids (NCL.py:57-66), with the e-step
    rerun every epoch >= 20 (101-104); warm-up epochs < 20 skip the
    proto term (116-121).

faiss.Kmeans is replaced by the jit k-means of ops/kmeans.py. Constraint
``hyper_layers*2 <= layers`` enforced (NCL.py:19-23). Reference quirk note:
NCL.py uses ``np`` at line 40 without importing numpy (crashes as written);
the rebuild is self-contained.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.kmeans import kmeans
from ..ops.losses import _normalize, bpr_loss, l2_reg_loss
from ..ops.spmm import spmm
from .common import xavier_uniform
from .warm_base import WarmBackboneTrainer

WARMUP_EPOCHS = 20  # NCL.py:103,116


def _ssl_one_side(context, initial, initial_all, idx, w, temp):
    c = _normalize(context[idx])
    i = _normalize(initial[idx])
    all_n = _normalize(initial_all)
    pos = jnp.exp(jnp.sum(c * i, axis=1) / temp)
    ttl = jnp.sum(jnp.exp(c @ all_n.T / temp), axis=1)
    return jnp.sum(-jnp.log(pos / ttl) * w)


class NCL(WarmBackboneTrainer):
    def __init__(self, config):
        super().__init__(config)
        self.n_layers = int(self.args.layers)
        self.hyper_layers = int(self.args.hyper_layers)
        if self.hyper_layers * 2 > self.n_layers:
            raise ValueError(
                "NCL needs hyper_layers*2 <= layers, got "
                f"hyper_layers={self.hyper_layers}, layers={self.n_layers}."
            )
        self.ssl_temp = float(self.args.tau)
        self.ssl_reg = float(self.args.ssl_reg)
        self.alpha = float(self.args.alpha)
        self.proto_reg = float(self.args.proto_reg)
        self.k = int(self.args.num_clusters)
        self.graph = self.build_graph()
        k1, k2 = jax.random.split(self.next_key())
        self.params = {
            "user_emb": xavier_uniform(k1, (self.data.user_num, self.emb_size)),
            "item_emb": xavier_uniform(k2, (self.data.item_num, self.emb_size)),
        }
        # cluster state (filled by e_step); placeholders keep jit signatures
        self.user_centroids = jnp.zeros((self.k, self.emb_size))
        self.user_2cluster = jnp.zeros((self.data.user_num,), jnp.int32)
        self.item_centroids = jnp.zeros((self.k, self.emb_size))
        self.item_2cluster = jnp.zeros((self.data.item_num,), jnp.int32)
        self._proto_on = False
        self.setup_optimizer()
        # second step function with the proto term (post-warm-up)
        from .common import make_train_step

        def loss_with_proto(params, batch, uc, u2c, ic, i2c):
            return self._full_loss(params, batch, (uc, u2c, ic, i2c))

        self._step_proto = make_train_step(loss_with_proto, self.optimizer)

    # ----------------------------------------------------------------- ssl
    def _layer_embs(self, params):
        ego = jnp.concatenate(
            [params["user_emb"], params["item_emb"]], axis=0
        )
        embs = [ego]
        for _ in range(self.n_layers):
            ego = spmm(self.graph, ego)
            embs.append(ego)
        mean = sum(embs) / (self.n_layers + 1)
        nu = self.data.user_num
        return mean[:nu], mean[nu:], embs

    def _ssl_layer_loss(self, embs, batch):
        nu = self.data.user_num
        initial = embs[0]
        context = embs[self.hyper_layers * 2]
        w = batch["weight"]
        lu = _ssl_one_side(
            context[:nu], initial[:nu], initial[:nu], batch["user"], w, self.ssl_temp
        )
        li = _ssl_one_side(
            context[nu:], initial[nu:], initial[nu:], batch["pos_item"], w, self.ssl_temp
        )
        return self.ssl_reg * (lu + self.alpha * li)

    def _proto_loss(self, embs, batch, clusters):
        uc, u2c, ic, i2c = clusters
        nu = self.data.user_num
        initial_u, initial_i = embs[0][:nu], embs[0][nu:]
        w = batch["weight"]
        # InfoNCE(user_emb[idx], centroid[cluster[idx]]) * batch_size
        # (NCL.py:61-64); padded rows excluded from both the mean and the
        # in-batch negative columns
        neg_inf = jnp.finfo(jnp.float32).min

        def _one(v, c):
            logits = (_normalize(v) @ _normalize(c).T) / self.ssl_temp
            logits = jnp.where(w[None, :] > 0, logits, neg_inf)
            lp = jnp.diag(logits) - jax.nn.logsumexp(logits, axis=1)
            return -jnp.sum(jnp.where(w > 0, lp, 0.0)) / jnp.maximum(
                jnp.sum(w), 1.0
            )

        loss_u = _one(initial_u[batch["user"]], uc[u2c[batch["user"]]])
        loss_i = _one(initial_i[batch["pos_item"]], ic[i2c[batch["pos_item"]]])
        return self.proto_reg * (loss_u + loss_i) * self.batch_size

    def _full_loss(self, params, batch, clusters):
        ut, it, embs = self._layer_embs(params)
        u = ut[batch["user"]]
        pos = it[batch["pos_item"]]
        neg = it[batch["neg_item"]]
        w = batch["weight"]
        loss = (
            bpr_loss(u, pos, neg, w)
            + l2_reg_loss(self.reg, u, pos, neg, weight=w)
            + self._ssl_layer_loss(embs, batch)
        )
        if clusters is not None:
            loss = loss + self._proto_loss(embs, batch, clusters)
        return loss

    def loss_fn(self, params, batch, key):
        return self._full_loss(params, batch, None)

    def forward_tables(self, params):
        ut, it, _ = self._layer_embs(params)
        return ut, it

    # --------------------------------------------------------------- e-step
    def e_step(self):
        k1, k2 = jax.random.split(self.next_key())
        self.user_centroids, self.user_2cluster = kmeans(
            k1, self.params["user_emb"], self.k
        )
        self.item_centroids, self.item_2cluster = kmeans(
            k2, self.params["item_emb"], self.k
        )

    def epoch_hook(self, epoch: int):
        self._proto_on = epoch >= WARMUP_EPOCHS
        if self._proto_on:
            self.e_step()

    # override the inner step to switch between warm-up and proto phases
    def train(self):
        base_step = self._step

        def dispatch(params, opt_state, batch):
            if self._proto_on:
                return self._step_proto(
                    params,
                    opt_state,
                    batch,
                    self.user_centroids,
                    self.user_2cluster,
                    self.item_centroids,
                    self.item_2cluster,
                )
            return base_step(params, opt_state, batch)

        self._step = dispatch
        try:
            super().train()
        finally:
            self._step = base_step
