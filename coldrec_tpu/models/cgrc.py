"""CGRC graph-reconstruction cold-start model (reference: model/CGRC.py).
Item-only.

Training (CGRC.py:291-344): item x = Linear(content); edge-predictor MLP
trained on simulated cold items (Bernoulli-masked graph G', LightGCN
propagation with cold rows frozen to content each layer) via a per-edge
softmax reconstruction loss L_E; L_R = temperature contrastive ranking over
a shared minibatch item set B. Inference (CGRC.py:369-401) builds Ĝ by
adding the top-K predicted users per true cold item, renormalizes, and
re-propagates.

TPU-native redesign (static shapes, SURVEY §7 hard part b):
  * G' is the full static edge list with per-edge 0/1 weights (edges
    incident to sampled cold items zeroed) and degrees recomputed by
    segment-sum — no CSR rebuild per step;
  * L_E is estimated over a FIXED number of uniformly sampled train edges
    weighted by the cold-item indicator (same conditional distribution as
    the reference's subsampled masked-edge mean); denominators run over all
    items with cold ∧ unrated masking via batched searchsorted;
  * B for L_R = batch positives + a fixed count of uniform extra items
    (the reference dedups its shared set; here duplicates are kept —
    documented divergence, identical in expectation);
  * Ĝ construction stays a host-side scipy rebuild once per evaluation,
    exactly like the reference's own inference path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..data.builder import SparseGraphHost
from ..ops.losses import l2_reg_loss
from ..ops.spmm import SparseGraph, make_sym_spmm, spmm
from .cold_base import ColdStartModelBase
from .common import linear, linear_params, xavier_uniform


class CGRC(ColdStartModelBase):
    uses_rng_in_loss = True

    def __init__(self, config):
        super().__init__(config)
        if self.args.cold_object != "item":
            raise ValueError("CGRC is defined for item cold-start only")
        self.Lg = int(self.args.cgrc_layers_gprime)
        self.Lf = int(self.args.cgrc_layers_full)
        self.Lh = int(self.args.cgrc_layers_ghat)
        self.rho = float(self.args.cgrc_mask_rho)
        self.topk = int(self.args.cgrc_recon_topk)
        self.lambda_e = float(self.args.cgrc_lambda_e)
        self.tau = float(self.args.cgrc_tau)
        self.le_max = int(self.args.cgrc_le_max_edges)
        self.ranking_neg = int(self.args.cgrc_ranking_neg_per_user)

        d = self.emb_size
        self.content = self.cold_side_content[: self.data.item_num]
        keys = jax.random.split(self.next_key(), 3)
        self.params = {
            "user_emb": xavier_uniform(keys[0], (self.data.user_num, d)),
            "item_lin": linear_params(keys[1], self.content_dim, d),
            "edge_mlp": [
                linear_params(keys[2], 2 * d, int(self.args.cgrc_mlp_hidden)),
                linear_params(
                    jax.random.fold_in(keys[2], 1),
                    int(self.args.cgrc_mlp_hidden),
                    1,
                ),
            ],
        }
        # static bipartite edge arrays (both directions), with the item
        # endpoint id per edge for cold masking
        tp = self.data.train_pairs
        n_u, n_i = self.data.user_num, self.data.item_num
        rows = np.concatenate([tp[:, 0], tp[:, 1] + n_u]).astype(np.int32)
        cols = np.concatenate([tp[:, 1] + n_u, tp[:, 0]]).astype(np.int32)
        edge_item = np.concatenate([tp[:, 1], tp[:, 1]]).astype(np.int32)
        self._edges = (
            jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(edge_item)
        )
        self.n_nodes = n_u + n_i
        self.full_graph = make_sym_spmm(self.data.norm_adj)
        # eligible items (>=1 training interaction) as a dense mask
        elig = np.zeros(n_i, bool)
        elig[np.unique(tp[:, 1])] = True
        self._eligible = jnp.asarray(elig)
        # dense (user_num, max_rated) sorted rated table for device-side
        # membership tests (pad = item_num)
        self._rated_all = jnp.asarray(
            self.data.rated_padded(np.arange(n_u)).astype(np.int32)
        )
        self._ghat_cache = None
        self.setup_optimizer()

    def batches(self):
        from ..data.sampler import pairwise_batches

        # reuse BPR batches; negatives ignored, extras drawn in-loss
        self._ghat_cache = None
        return pairwise_batches(self.data, self.batch_size, self.host_rng)

    # ----------------------------------------------------------- propagation
    def _item_x(self, params):
        return linear(params["item_lin"], self.content)

    def _masked_graph_vals(self, cold_mask):
        rows, cols, edge_item = self._edges
        keep = (~cold_mask[edge_item]).astype(jnp.float32)
        deg = jax.ops.segment_sum(keep, rows, num_segments=self.n_nodes)
        d_inv = jnp.where(deg > 0, deg**-0.5, 0.0)
        vals = d_inv[rows] * d_inv[cols] * keep
        return SparseGraph(rows=rows, cols=cols, vals=vals, n_rows=self.n_nodes)

    def _propagate_frozen(self, graph, user_emb, item_x, n_layers, cold_mask):
        """G' propagation; cold item rows pinned to x each layer
        (CGRC.py:76-93). Returns user-row mean over layers 1..L."""
        n_u = self.data.user_num
        ego = jnp.concatenate([user_emb, item_x], axis=0)
        acc_u = jnp.zeros_like(user_emb)
        h = ego
        pin = (
            jnp.concatenate(
                [jnp.zeros(n_u, bool), cold_mask]
            )[:, None]
            if cold_mask is not None
            else None
        )
        for _ in range(n_layers):
            h = spmm(graph, h)
            if pin is not None:
                h = jnp.where(pin, ego, h)
            acc_u = acc_u + h[:n_u]
        return acc_u / max(n_layers, 1) if n_layers > 0 else user_emb

    def _lightgcn_full(self, graph, user_emb, item_x, n_layers):
        n_u = self.data.user_num
        ego = jnp.concatenate([user_emb, item_x], axis=0)
        acc = ego
        h = ego
        for _ in range(n_layers):
            h = spmm(graph, h)
            acc = acc + h
        mean = acc / (n_layers + 1)
        return mean[:n_u], mean[n_u:]

    def _edge_logits(self, params, h_users, item_x):
        """(R, I) logits: edge_mlp([h_u ∥ x_i]) decomposed to avoid the RxIx2d
        concat blowup: first Linear splits into user-part + item-part."""
        w = params["edge_mlp"][0]["w"]
        b = params["edge_mlp"][0]["b"]
        d = h_users.shape[1]
        hu = h_users @ w[:d]  # (R, H)
        xi = item_x @ w[d:]  # (I, H)
        h = jax.nn.relu(hu[:, None, :] + xi[None, :, :] + b)
        w2 = params["edge_mlp"][1]
        return (h @ w2["w"])[..., 0] + w2["b"][0]  # (R, I)

    def _rated_mask(self, users, item_ids=None):
        """(B, I) or (B, L) bool: user rated item (batched searchsorted)."""
        rated = self._rated_all[users]  # (B, R) sorted, pad=item_num

        def row(r, q):
            pos = jnp.searchsorted(r, q)
            pos = jnp.minimum(pos, r.shape[0] - 1)
            return r[pos] == q

        if item_ids is None:
            item_ids = jnp.arange(self.data.item_num, dtype=jnp.int32)
            return jax.vmap(lambda r: row(r, item_ids))(rated)
        return jax.vmap(row)(rated, item_ids)

    # ----------------------------------------------------------------- loss
    def loss_fn(self, params, batch, key):
        n_i = self.data.item_num
        k1, k2, k3 = jax.random.split(key, 3)
        x_all = self._item_x(params)

        # --- L_E: reconstruction on simulated cold items ---
        cold_mask = (
            jax.random.uniform(k1, (n_i,)) < self.rho
        ) & self._eligible
        graph_m = self._masked_graph_vals(cold_mask)
        h_u_bar = self._propagate_frozen(
            graph_m, params["user_emb"], x_all, self.Lg, cold_mask
        )
        tp = self.data.train_pairs
        eidx = jax.random.randint(k2, (self.le_max,), 0, tp.shape[0])
        e_pairs = jnp.asarray(tp.astype(np.int32))[eidx]
        e_u, e_i = e_pairs[:, 0], e_pairs[:, 1]
        e_w = cold_mask[e_i].astype(jnp.float32)  # masked-edge indicator
        logits = self._edge_logits(params, h_u_bar[e_u], x_all)  # (E, I)
        valid = cold_mask[None, :] & ~self._rated_mask(e_u)
        neg_inf = jnp.finfo(logits.dtype).min
        lse = jax.nn.logsumexp(jnp.where(valid, logits, neg_inf), axis=1)
        pos = jnp.take_along_axis(logits, e_i[:, None], axis=1)[:, 0]
        has_valid = jnp.any(valid, axis=1)
        e_w = e_w * has_valid.astype(jnp.float32)
        loss_e = jnp.sum(-(pos - lse) * e_w) / jnp.maximum(jnp.sum(e_w), 1.0)

        # --- L_R: contrastive over shared batch item set B ---
        z_u, z_i = self._lightgcn_full(
            self.full_graph, params["user_emb"], x_all, self.Lf
        )
        bs = batch["user"].shape[0]
        n_extra = self.ranking_neg * 8
        extra = jax.random.randint(k3, (n_extra,), 0, n_i)
        b_items = jnp.concatenate([batch["pos_item"], extra])  # (L,)
        sim = (z_u[batch["user"]] @ z_i[b_items].T) / self.tau  # (B, L)
        not_rated = ~self._rated_mask(
            batch["user"], jnp.broadcast_to(b_items, (bs, b_items.shape[0]))
        )
        le_row = jax.nn.logsumexp(
            jnp.where(not_rated, sim, neg_inf), axis=1
        )
        pos_s = jnp.diag(sim[:, :bs])
        w = batch["weight"] * jnp.any(not_rated, axis=1)
        loss_r = jnp.sum(-(pos_s - le_row) * w) / jnp.maximum(jnp.sum(w), 1.0)

        reg = l2_reg_loss(
            self.reg,
            params["user_emb"][batch["user"]],
            x_all[batch["pos_item"]],
            weight=batch["weight"],
        )
        return self.lambda_e * loss_e + loss_r + reg

    # ----------------------------------------------------------------- eval
    def forward_tables(self, params):
        """Ĝ reconstruction + LightGCN; host graph rebuild once per eval,
        mirroring the reference inference (CGRC.py:369-401)."""
        n_u, n_i = self.data.user_num, self.data.item_num
        x_all = self._item_x(params)
        if self.Lg > 0:
            h_u_bar = self._propagate_frozen(
                self.full_graph, params["user_emb"], x_all, self.Lg, None
            )
        else:
            h_u_bar = params["user_emb"]
        cold = np.asarray(self.data.mapped_cold_item_idx)
        if cold.size == 0:
            return self._lightgcn_full(
                self.full_graph, params["user_emb"], x_all, self.Lh
            )
        logits = self._edge_logits(params, h_u_bar, x_all[jnp.asarray(cold)].reshape(cold.size, -1))
        k = min(self.topk, n_u)
        _, top_rows = jax.lax.top_k(logits.T, k)  # (C, k) users per cold item
        top_rows = np.asarray(top_rows)
        # host: union of base edges + predicted edges, weights clamped to 1
        R = self.data.interaction_csr.tocoo()
        pu = top_rows.reshape(-1)
        pi = np.repeat(cold, k)
        rows = np.concatenate([R.row, pu])
        cols = np.concatenate([R.col, pi])
        vals = np.ones(rows.shape[0], np.float32)
        R_hat = sp.csr_matrix((vals, (rows, cols)), shape=(n_u, n_i))
        R_hat.data = np.minimum(R_hat.data, 1.0)
        bip = sp.bmat(
            [[None, R_hat], [R_hat.T, None]], format="csr"
        ).astype(np.float32)
        adj = self.data.normalize_graph(bip)
        graph = SparseGraph.from_host(SparseGraphHost.from_scipy(adj))
        return self._lightgcn_full(graph, params["user_emb"], x_all, self.Lh)

    def setup_optimizer(self):
        # forward_tables mixes host scipy (Ĝ rebuild) with device compute,
        # so it must not be jitted — replicate the base wiring without it.
        from .common import adam, make_train_step

        self.optimizer = adam(self.lr)
        self.opt_state = self.optimizer.init(self.params)
        self._step = make_train_step(self.loss_fn, self.optimizer)
        self._forward_jit = lambda params: self.forward_tables(params)
        self.user_emb, self.item_emb = self.forward_tables(self.params)
        self.best_user_emb, self.best_item_emb = self.user_emb, self.item_emb
        self._score_fn = None

    def extra_saved_tensors(self):
        x_all = self._item_x(self.params)
        z_u, z_i = self._lightgcn_full(
            self.full_graph, self.params["user_emb"], x_all, self.Lf
        )
        return {"user_emb_full": np.asarray(z_u), "item_emb_full": np.asarray(z_i)}
