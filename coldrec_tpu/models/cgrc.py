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
    items with cold ∧ unrated masking via broadcast-equality membership;
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


@functools.partial(jax.jit, static_argnames=("k", "n_u"))
def _cgrc_block_topk(mlp_tail, xi_blk, hu_chunks, uid_chunks, k, n_u):
    """Running top-k users for one cold-item block. mlp_tail = (b1, w2, b2)
    of the edge MLP; scan over user chunks merges (prev_topk ∥ chunk) with
    lax.top_k — exact, peak memory (iblk, ublk, H)."""
    b1, w2, b2 = mlp_tail
    ci = xi_blk.shape[0]
    neg_inf = jnp.finfo(jnp.float32).min

    def body(carry, inp):
        bv, bi = carry  # (Ci, k)
        hu_b, id_b = inp
        h = jax.nn.relu(xi_blk[:, None, :] + hu_b[None, :, :] + b1)
        lg = (h @ w2)[..., 0] + b2[0]  # (Ci, ublk)
        lg = jnp.where(id_b[None, :] < n_u, lg, neg_inf)
        v = jnp.concatenate([bv, lg], axis=1)
        i = jnp.concatenate(
            [bi, jnp.broadcast_to(id_b[None, :], (ci, id_b.shape[0]))], axis=1
        )
        nv, pos = jax.lax.top_k(v, k)
        return (nv, jnp.take_along_axis(i, pos, axis=1)), None

    init = (
        jnp.full((ci, k), neg_inf, jnp.float32),
        jnp.zeros((ci, k), jnp.int32),
    )
    (_, bi), _ = jax.lax.scan(body, init, (hu_chunks, uid_chunks))
    return bi


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

    def _edge_parts(self, params, h_users, item_x):
        """Decomposed first Linear of the edge MLP: [h_u ∥ x_i] @ W splits
        into a user part (R, H) and an item part (I, H)."""
        w = params["edge_mlp"][0]["w"]
        d = h_users.shape[1]
        return h_users @ w[:d], item_x @ w[d:]

    def _block_logits(self, params, hu, xi):
        """(R, H) x (B, H) -> (R, B) edge logits from precomputed parts."""
        b = params["edge_mlp"][0]["b"]
        w2 = params["edge_mlp"][1]
        h = jax.nn.relu(hu[:, None, :] + xi[None, :, :] + b)
        return (h @ w2["w"])[..., 0] + w2["b"][0]

    def _pair_logits(self, params, hu, xi):
        """(N, H) x (N, H) -> (N,) logits for aligned user/item pairs."""
        b = params["edge_mlp"][0]["b"]
        w2 = params["edge_mlp"][1]
        h = jax.nn.relu(hu + xi + b)
        return (h @ w2["w"])[:, 0] + w2["b"][0]

    def _edge_logits(self, params, h_users, item_x):
        """(R, I) logits: edge_mlp([h_u ∥ x_i]); materializes (R, I, H) —
        only safe for small R*I (the scan paths below bound memory)."""
        hu, xi = self._edge_parts(params, h_users, item_x)
        return self._block_logits(params, hu, xi)

    def _rated_mask(self, users, item_ids=None):
        """(B, I) or (B, L) bool: user rated item.

        Broadcast-equality any-reduce over the (B, R) rated rows — the
        same membership formulation as the retrieval resolve step
        (ops/pallas/retrieval.py:_resolve). A vmapped searchsorted here
        lowers to a serial binary search which KERNEL-FAULTS the TPU
        worker at book-crossing scale (bisected in
        tools/debug_cgrc_bx.py); never reintroduce it on the device path.
        """
        rated = self._rated_all[users]  # (B, R), pad = item_num
        if item_ids is None:
            item_ids = jnp.arange(self.data.item_num, dtype=jnp.int32)
        if item_ids.ndim == 1:
            return jnp.any(
                rated[:, None, :] == item_ids[None, :, None], axis=-1
            )
        return jnp.any(rated[:, None, :] == item_ids[:, :, None], axis=-1)

    # ---------------------------------------------------- L_E softmax terms
    # dense path only when the (E, I, H) edge-MLP intermediate is small;
    # otherwise an exact running-logsumexp lax.scan over item blocks keeps
    # peak memory at (E, blk, H) regardless of item count (book-crossing's
    # 270k items would need ~280GB dense).
    _DENSE_ELEMS_CAP = 1 << 27  # fp32 elements (~512MB) for E*I*H

    def _edge_softmax_terms(self, params, h_e, e_u, e_i, x_all, cold_mask):
        """Per-sampled-edge (pos_logit, logsumexp over valid items, any_valid).

        valid = simulated-cold ∧ not rated by the edge's user — identical to
        the dense ``where(valid, logits, -inf)`` logsumexp (CGRC.py:206-256
        semantics), chunked for static bounded memory.
        """
        n_i = self.data.item_num
        hsz = int(self.args.cgrc_mlp_hidden)
        hu, xi_all = self._edge_parts(params, h_e, x_all)
        pos = self._pair_logits(params, hu, xi_all[e_i])
        if self.le_max * n_i * hsz <= self._DENSE_ELEMS_CAP:
            logits = self._block_logits(params, hu, xi_all)  # (E, I)
            valid = cold_mask[None, :] & ~self._rated_mask(e_u)
            neg_inf = jnp.finfo(logits.dtype).min
            lse = jax.nn.logsumexp(jnp.where(valid, logits, neg_inf), axis=1)
            return pos, lse, jnp.any(valid, axis=1)

        # remat bounds live memory to ONE block, so the scan block can be
        # 2x the dense cap (fewer, larger steps amortize scan overhead)
        blk = max(
            256, min(8192, 2 * self._DENSE_ELEMS_CAP // (self.le_max * hsz))
        )
        pad = (-n_i) % blk
        xi_pad = (
            jnp.concatenate([xi_all, jnp.zeros((pad, hsz), xi_all.dtype)])
            if pad
            else xi_all
        )
        cm_pad = (
            jnp.concatenate([cold_mask, jnp.zeros(pad, bool)])
            if pad
            else cold_mask
        )
        ids = jnp.arange(n_i + pad, dtype=jnp.int32).reshape(-1, blk)
        rated = self._rated_all[e_u]  # (E, R), pad = n_i
        neg_inf = jnp.finfo(jnp.float32).min

        # jax.checkpoint: reverse-mode through scan would otherwise stash
        # every step's (E, blk, H) relu residual — 141 GB at book-crossing
        # scale; remat recomputes the block logits in the backward instead.
        @jax.checkpoint
        def body(carry, idx):
            m, s = carry  # running max (E,), running sum-exp (E,)
            lg = self._block_logits(params, hu, xi_pad[idx])  # (E, blk)
            # membership by broadcast equality — a vmapped searchsorted
            # here kernel-faults the worker at 270k items (see _rated_mask)
            is_rated = jnp.any(
                rated[:, None, :] == idx[None, :, None], axis=-1
            )
            valid = cm_pad[idx][None, :] & ~is_rated
            lg = jnp.where(valid, lg, neg_inf)
            bm = jnp.max(lg, axis=1)
            nm = jnp.maximum(m, bm)
            scale = jnp.where(nm == neg_inf, 0.0, jnp.exp(m - nm))
            add = jnp.sum(jnp.where(valid, jnp.exp(lg - nm[:, None]), 0.0), 1)
            return (nm, s * scale + add), None

        init = (
            jnp.full((self.le_max,), neg_inf, jnp.float32),
            jnp.zeros((self.le_max,), jnp.float32),
        )
        (m, s), _ = jax.lax.scan(body, init, ids)
        has_valid = s > 0
        lse = m + jnp.log(jnp.maximum(s, 1e-38))
        return pos, lse, has_valid

    # ------------------------------------------------------- loss reductions
    # factored so the torch-oracle tests exercise the SAME reduction code
    # loss_fn uses (tests/test_cgrc_torch_oracle.py) — a regression in the
    # weighted-mean reductions cannot pass the oracle unnoticed
    def _reconstruction_reduce(self, pos, lse, cold_ind, has_valid):
        """L_E reduction (Eq. 6, CGRC.py:206-256): masked-edge-indicator
        weighted mean of -(pos_logit - logsumexp)."""
        e_w = cold_ind * has_valid.astype(jnp.float32)
        return jnp.sum(-(pos - lse) * e_w) / jnp.maximum(jnp.sum(e_w), 1.0)

    def _ranking_loss(self, z_u, z_i, users, b_items, weight):
        """L_R (Eq. 8, CGRC.py:258-287): temperature contrastive over the
        shared item set B; the first ``len(users)`` entries of ``b_items``
        are the aligned positives; rows with no un-rated candidate drop."""
        bs = users.shape[0]
        sim = (z_u[users] @ z_i[b_items].T) / self.tau  # (B, L)
        not_rated = ~self._rated_mask(
            users, jnp.broadcast_to(b_items, (bs, b_items.shape[0]))
        )
        le_row = jax.nn.logsumexp(
            jnp.where(not_rated, sim, jnp.finfo(sim.dtype).min), axis=1
        )
        pos_s = jnp.diag(sim[:, :bs])
        w = weight * jnp.any(not_rated, axis=1)
        return jnp.sum(-(pos_s - le_row) * w) / jnp.maximum(jnp.sum(w), 1.0)

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
        pos, lse, has_valid = self._edge_softmax_terms(
            params, h_u_bar[e_u], e_u, e_i, x_all, cold_mask
        )
        loss_e = self._reconstruction_reduce(pos, lse, e_w, has_valid)

        # --- L_R: contrastive over shared batch item set B ---
        z_u, z_i = self._lightgcn_full(
            self.full_graph, params["user_emb"], x_all, self.Lf
        )
        n_extra = self.ranking_neg * 8
        extra = jax.random.randint(k3, (n_extra,), 0, n_i)
        b_items = jnp.concatenate([batch["pos_item"], extra])  # (L,)
        loss_r = self._ranking_loss(
            z_u, z_i, batch["user"], b_items, batch["weight"]
        )

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
        k = min(self.topk, n_u)
        x_cold = x_all[jnp.asarray(cold)].reshape(cold.size, -1)
        hsz = int(self.args.cgrc_mlp_hidden)
        if n_u * cold.size * hsz <= self._DENSE_ELEMS_CAP:
            logits = self._edge_logits(params, h_u_bar, x_cold)
            _, top_rows = jax.lax.top_k(logits.T, k)  # (C, k) users/item
            top_rows = np.asarray(top_rows)
        else:
            top_rows = self._topk_users_chunked(params, h_u_bar, x_cold, k)
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

    def _topk_users_chunked(self, params, h_u_bar, x_cold, k):
        """(C, k) top-scoring users per cold item without the (n_u, C, H)
        dense intermediate: host loop over cold-item blocks; inside one jit,
        a lax.scan over user blocks carries a running top-k merge (exact)."""
        n_u = h_u_bar.shape[0]
        hsz = int(self.args.cgrc_mlp_hidden)
        iblk = 512
        ublk = max(256, min(8192, self._DENSE_ELEMS_CAP // (iblk * hsz)))
        hu_all, xi_cold = self._edge_parts(params, h_u_bar, x_cold)
        pad_u = (-n_u) % ublk
        hu_pad = (
            jnp.concatenate([hu_all, jnp.zeros((pad_u, hsz), hu_all.dtype)])
            if pad_u
            else hu_all
        )
        uids = jnp.arange(n_u + pad_u, dtype=jnp.int32)
        hu_chunks = hu_pad.reshape(-1, ublk, hsz)
        uid_chunks = uids.reshape(-1, ublk)
        c = xi_cold.shape[0]
        pad_c = (-c) % iblk
        if pad_c:
            xi_cold = jnp.concatenate(
                [xi_cold, jnp.zeros((pad_c, hsz), xi_cold.dtype)]
            )
        mlp_tail = (
            params["edge_mlp"][0]["b"],
            params["edge_mlp"][1]["w"],
            params["edge_mlp"][1]["b"],
        )
        outs = [
            np.asarray(
                _cgrc_block_topk(
                    mlp_tail, xi_cold[s : s + iblk], hu_chunks, uid_chunks,
                    k, n_u,
                )
            )
            for s in range(0, c + pad_c, iblk)
        ]
        return np.concatenate(outs, axis=0)[:c]

    def setup_optimizer(self):
        # forward_tables mixes host scipy (Ĝ rebuild) with device compute,
        # so it must not be jitted — replicate the base wiring without it.
        from .common import adam, make_train_step

        self._setup_mesh()  # --mesh DxM: user_emb row-sharded, MLPs replicated
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
