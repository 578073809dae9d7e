"""FS-GNN feature+structure completion model (reference: model/FSGNN.py).

Pipeline (FSGNN.py:444-457): content -> Linear h0; bipartite GAT encoder
with segment-softmax attention (319-356); stacked GCN decoder on the train
graph (358-366); L_fc = MSE on cold rows (368-387); structure completion:
precomputed PPR top-k extra U-I edges (54-103) + cosine-kNN U-U/I-I graphs
(106-152); merged weighted graph (155-170); per-type GCN + edge-MLP L_sc on
sampled kNN edges (401-431); LightGCN over the merged graph (433-442);
BPR + lam*L_fc + mu*L_sc + L2 (485-492). Adam with global weight decay.

TPU notes: all graphs are one-time host preprocessing (PPR power iteration
chunked over users); per-step compute is static-shape segment ops. L_sc edge
subsampling uses a fixed-size draw with replacement (reference: randperm
without replacement — identical in expectation; documented divergence).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp

from ..data.builder import SparseGraphHost
from ..ops.losses import bpr_loss, l2_reg_loss
from ..ops.spmm import build_ell, ell_arrays, sym_spmm_arrays
from .cold_base import ColdStartModelBase
from .common import dropout, linear, linear_params, make_train_step, xavier_uniform


# dense power-iteration PPR only while the (users x nodes) block fits
# this element budget; above it the native forward-push path runs
# (module constant so tests can force the push branch on small graphs)
_DENSE_PPR_ELEMS = 1 << 28


def ppr_topk_extra_edges(r_train, delta, n_iter, topk, weighted, chunk=1024,
                         push_eps=1e-5):
    """PPR restart-to-user over the self-looped bipartite graph; add top-k
    unobserved item links per user (FSGNN.py:54-103), chunked over users.

    Two paths behind one contract:
      * dense power iteration (the reference's exact formulation) while the
        (users x nodes) block stays small;
      * native forward-push approximate PPR (Andersen-Chung-Lang; C++,
        threaded — native/coldrec_native.cpp::ppr_push_topk) above that —
        the dense block is (92k x 362k) float64 iterated 30x at
        book-crossing scale (hours on the host), while push work is
        O(1/(alpha*eps)) per source independent of node count.

    Documented divergences of the push path: (a) scores carry an additive
    error <= push_eps*deg per node — top-k sets agree with the dense path
    on test graphs (tests/test_native.py); (b) it emits only items the
    push actually REACHED (p > 0), so a weakly-connected user can get
    fewer than topk extra edges — the dense path pads unweighted rows up
    to k_eff with arbitrary zero-score items (argpartition over zeros),
    which carry no ranking signal.
    """
    nu, ni = r_train.shape
    n = nu + ni
    rows, cols = r_train.nonzero()
    a = sp.coo_matrix(
        (
            np.ones(2 * len(rows), np.float32),
            (
                np.concatenate([rows, cols + nu]),
                np.concatenate([cols + nu, rows]),
            ),
        ),
        shape=(n, n),
    ).tocsr()
    a = a + sp.eye(n, format="csr", dtype=np.float32)

    if nu * n > _DENSE_PPR_ELEMS:
        from ..native import ppr_push_topk_native

        r_csr = r_train.tocsr().astype(np.float32)
        r_csr.sort_indices()
        res = ppr_push_topk_native(
            a.indptr, a.indices, nu,
            r_csr.indptr, r_csr.indices,
            float(delta), float(push_eps), int(topk),
        )
        if res is None:
            raise RuntimeError(
                "PPR at this scale needs the native push kernel "
                "(native/ failed to build); the dense power iteration "
                f"would materialize a ({nu} x {n}) float64 block"
            )
        items, vals = res
        valid = items >= 0
        w = np.where(valid, np.clip(vals, 0.0, None), 0.0)
        if weighted:
            # per-row max-normalize; rows with zero max keep zero weights
            # (same as the dense path's `if mx > 0` guard)
            mx = w.max(axis=1, keepdims=True)
            w = np.where(mx > 0, w / np.maximum(mx, 1e-30), w)
        else:
            w = valid.astype(np.float32)
        out_r = np.repeat(np.arange(nu), items.shape[1])[valid.ravel()]
        out_c = items.ravel()[valid.ravel()]
        out_v = w.ravel()[valid.ravel()].astype(np.float32)
        if out_r.size == 0:
            return sp.csr_matrix((nu, ni), dtype=np.float32)
        return sp.csr_matrix((out_v, (out_r, out_c)), shape=(nu, ni))

    deg = np.asarray(a.sum(1)).flatten()
    d_inv = np.divide(1.0, deg, out=np.zeros_like(deg), where=deg > 0)
    p_mat = (sp.diags(d_inv) @ a).tocsr().astype(np.float64)

    out_rows, out_cols, out_vals = [], [], []
    r_csr = r_train.tocsr()
    for u0 in range(0, nu, chunk):
        u1 = min(u0 + chunk, nu)
        c = u1 - u0
        pi = np.zeros((c, n))
        pi[np.arange(c), np.arange(u0, u1)] = 1.0
        restart = pi * float(delta)
        for _ in range(int(n_iter)):
            pi = (1.0 - delta) * (pi @ p_mat) + restart
        scores = pi[:, nu:]
        for r in range(c):
            u = u0 + r
            observed = r_csr[u].indices
            cand = scores[r].copy()
            cand[observed] = -np.inf
            k_eff = min(int(topk), ni - len(observed))
            if k_eff <= 0:
                continue
            top = np.argpartition(-cand, kth=k_eff - 1)[:k_eff]
            if weighted:
                w = np.clip(cand[top], 0.0, None).astype(np.float32)
                mx = w.max() if w.size else 0.0
                if mx > 0:
                    w = w / mx
            else:
                w = np.ones(k_eff, np.float32)
            out_rows.extend([u] * k_eff)
            out_cols.extend(top.tolist())
            out_vals.extend(w.tolist())
    if not out_rows:
        return sp.csr_matrix((nu, ni), dtype=np.float32)
    return sp.csr_matrix((out_vals, (out_rows, out_cols)), shape=(nu, ni))


def cosine_knn_graph(feat, k, weighted):
    """Symmetric cosine kNN graph, weights in (0, 1] (FSGNN.py:106-152)."""
    from ..ops.knn import knn_cosine

    n = feat.shape[0]
    k_eff = min(int(k), n - 1)
    if n <= 1 or k_eff <= 0:
        return sp.csr_matrix((n, n), dtype=np.float32)
    sims, idx = knn_cosine(feat, feat, k_eff + 1)
    rows, cols, vals = [], [], []
    for i in range(n):
        cnt = 0
        for j_pos in range(idx.shape[1]):
            j = int(idx[i, j_pos])
            if j == i or cnt >= k_eff:
                continue
            s = 1.0 if not weighted else max(
                1e-6, min(1.0, (float(sims[i, j_pos]) + 1.0) * 0.5)
            )
            rows.append(i)
            cols.append(j)
            vals.append(s)
            cnt += 1
    g = sp.coo_matrix((vals, (rows, cols)), shape=(n, n), dtype=np.float32).tocsr()
    g = g.maximum(g.T)
    g.setdiag(0)
    g.eliminate_zeros()
    return g


def _sym_norm(adj):
    rowsum = np.asarray(adj.sum(1)).flatten()
    d_inv = np.zeros_like(rowsum, dtype=np.float32)
    np.power(rowsum, -0.5, out=d_inv, where=rowsum != 0)
    d = sp.diags(d_inv)
    return (d @ adj @ d).tocsr()


class FSGNN(ColdStartModelBase):
    uses_rng_in_loss = True

    def __init__(self, config):
        super().__init__(config)
        d = self.emb_size
        a = self.args
        nu, ni = self.data.user_num, self.data.item_num
        rng = np.random.default_rng(int(a.seed))

        def side_feat(content, rows, dim_fallback):
            if content is not None:
                return np.asarray(content[:rows], np.float32)
            return (rng.standard_normal((rows, dim_fallback)) * 0.01).astype(
                np.float32
            )

        self.raw_u = jnp.asarray(
            side_feat(self.data.user_content, nu, int(a.fsgnn_fallback_dim))
        )
        self.raw_i = jnp.asarray(
            side_feat(self.data.item_content, ni, int(a.fsgnn_fallback_dim))
        )
        du, di = self.raw_u.shape[1], self.raw_i.shape[1]
        hid = int(a.fsgnn_gat_hidden)
        n_dec = max(1, int(a.fsgnn_fc_decoder_layers))
        n_sc = max(1, int(a.fsgnn_sc_layers))
        keys = jax.random.split(self.next_key(), 10 + n_dec + 2 * n_sc)
        ki = iter(range(len(keys)))
        self.params = {
            "proj_u": linear_params(keys[next(ki)], du, d),
            "proj_i": linear_params(keys[next(ki)], di, d),
            "lin_u_gat": linear_params(keys[next(ki)], d, hid),
            "lin_i_gat": linear_params(keys[next(ki)], d, hid),
            "gat_att": linear_params(keys[next(ki)], 2 * hid, 1, bias=False),
            "fc_dec": [
                linear_params(keys[next(ki)], d, d) for _ in range(n_dec)
            ],
            "struct_mlp": [
                linear_params(keys[next(ki)], 2 * d, hid),
                linear_params(keys[next(ki)], hid, 1),
            ],
            "sc_uu": [linear_params(keys[next(ki)], d, d) for _ in range(n_sc)],
            "sc_ii": [linear_params(keys[next(ki)], d, d) for _ in range(n_sc)],
        }
        self.id_residual = bool(a.fsgnn_id_residual)
        if self.id_residual:
            self.params["emb_user"] = xavier_uniform(keys[next(ki)], (nu, d))
            self.params["emb_item"] = xavier_uniform(keys[next(ki)], (ni, d))

        # ---- one-time host graph construction ----
        r_train = self.data.interaction_csr.tocsr()
        r_extra = ppr_topk_extra_edges(
            r_train,
            delta=float(a.fsgnn_ppr_delta),
            n_iter=int(a.fsgnn_ppr_iter),
            topk=int(a.fsgnn_ppr_topk),
            weighted=bool(a.fsgnn_ppr_weighted),
        )
        r_ui = (r_train.astype(np.float32) + r_extra).tocsr()
        fu = np.asarray(self.raw_u)
        fi = np.asarray(self.raw_i)
        a_uu = cosine_knn_graph(fu, int(a.fsgnn_knn_k), bool(a.fsgnn_knn_weighted))
        a_ii = cosine_knn_graph(fi, int(a.fsgnn_knn_k), bool(a.fsgnn_knn_weighted))
        z_uu = sp.csr_matrix((nu, nu), dtype=np.float32)
        z_ii = sp.csr_matrix((ni, ni), dtype=np.float32)
        merged = sp.bmat([[z_uu, r_ui], [r_ui.T, z_ii]], format="csr") + sp.block_diag(
            (a_uu, a_ii), format="csr"
        )
        merged = merged.maximum(merged.T)
        # All big device arrays (4 adjacencies, side features, edge lists)
        # ride on a "bus" dict threaded through the jitted functions as an
        # ARGUMENT: closure capture would embed them as HLO constants
        # (~300 MB at book-crossing scale) and overflow the remote compile
        # request (HTTP 413). See ops/spmm.py::sym_spmm_arrays.
        tp = self.data.train_pairs
        uu = sp.triu(a_uu, k=1).tocoo()
        ii = sp.triu(a_ii, k=1).tocoo()
        self._n_all = nu + ni
        self._bus = {
            "g_complete": ell_arrays(
                build_ell(SparseGraphHost.from_scipy(_sym_norm(merged)))
            ),
            "g_train": ell_arrays(build_ell(self.data.norm_adj)),
            "g_uu": ell_arrays(build_ell(SparseGraphHost.from_scipy(
                _sym_norm(a_uu + sp.eye(nu, format="csr", dtype=np.float32))
            ))),
            "g_ii": ell_arrays(build_ell(SparseGraphHost.from_scipy(
                _sym_norm(a_ii + sp.eye(ni, format="csr", dtype=np.float32))
            ))),
            "raw_u": self.raw_u,
            "raw_i": self.raw_i,
            "edge_u": jnp.asarray(tp[:, 0].astype(np.int32)),
            "edge_i": jnp.asarray(tp[:, 1].astype(np.int32)),
            "uu_edges": (
                jnp.asarray(uu.row.astype(np.int32)),
                jnp.asarray(uu.col.astype(np.int32)),
            ),
            "ii_edges": (
                jnp.asarray(ii.row.astype(np.int32)),
                jnp.asarray(ii.col.astype(np.int32)),
            ),
        }
        self.n_layers = int(a.fsgnn_light_layers)
        self.setup_optimizer()

    def batches(self):
        for b in super().batches():
            b["bus"] = self._bus
            yield b

    def _place_batch(self, batch):
        # the bus is already device-resident; only shard the sample keys
        bus = batch.pop("bus", None)
        batch = super()._place_batch(batch)
        if bus is not None:
            batch["bus"] = bus
        return batch

    def setup_optimizer(self):
        wd = float(self.args.fsgnn_weight_decay)
        self.optimizer = optax.chain(
            optax.add_decayed_weights(wd), optax.adam(self.lr)
        )
        self.opt_state = self.optimizer.init(self.params)
        self._step = make_train_step(self.loss_fn, self.optimizer)
        self._forward_jit = self._make_forward_jit()
        self.user_emb, self.item_emb = self._forward_jit(self.params)
        self.best_user_emb, self.best_item_emb = self.user_emb, self.item_emb
        self._score_fn = None

    def _make_forward_jit(self):
        jf = jax.jit(self._forward_impl)
        return lambda params: jf(params, self._bus)

    # ------------------------------------------------------------- encoders
    def _gat_encode(self, params, bus, h0_u, h0_i, hu_t, hi_t):
        """Segment-softmax bipartite GAT (FSGNN.py:319-356)."""
        nu, ni = h0_u.shape[0], h0_i.shape[0]
        eu, ei = bus["edge_u"], bus["edge_i"]
        wh_u = linear(params["lin_u_gat"], h0_u)
        wh_i = linear(params["lin_i_gat"], h0_i)

        def seg_softmax_agg(scores_e, seg_ids, n_seg, values_e):
            alpha = jnp.exp(jnp.clip(scores_e, -20.0, 20.0))
            den = jax.ops.segment_sum(alpha, seg_ids, num_segments=n_seg)
            den_e = den[seg_ids]
            w = jnp.where(den_e > 1e-8, alpha / jnp.maximum(den_e, 1e-8), 0.0)
            return jax.ops.segment_sum(
                w[:, None] * values_e, seg_ids, num_segments=n_seg
            )

        att_w = params["gat_att"]["w"]
        z_i = jax.nn.leaky_relu(
            (jnp.concatenate([wh_i[ei], wh_u[eu]], -1) @ att_w)[:, 0], 0.2
        )
        agg_i = seg_softmax_agg(z_i, ei, ni, h0_u[eu])
        enc_i = jax.nn.sigmoid(agg_i + hi_t)
        z_u = jax.nn.leaky_relu(
            (jnp.concatenate([wh_u[eu], wh_i[ei]], -1) @ att_w)[:, 0], 0.2
        )
        agg_u = seg_softmax_agg(z_u, eu, nu, h0_i[ei])
        enc_u = jax.nn.sigmoid(agg_u + hu_t)
        return enc_u, enc_i

    def _gcn_decode(self, params, bus, enc):
        x = enc
        for k, lin_p in enumerate(params["fc_dec"]):
            x = sym_spmm_arrays(
                self._n_all, *bus["g_train"], linear(lin_p, x)
            )
            if k < len(params["fc_dec"]) - 1:
                x = jax.nn.relu(x)
        return x

    def _forward_training(self, params, bus, key):
        nu = self.data.user_num
        h0_u = linear(params["proj_u"], bus["raw_u"])
        h0_i = linear(params["proj_i"], bus["raw_i"])
        p = float(self.args.fsgnn_p_drop)
        hu_t, hi_t = h0_u, h0_i
        if key is not None and p > 0:
            k1, k2 = jax.random.split(key)
            if bool(self.args.fsgnn_dropout_cold_side_only):
                if self.args.cold_object == "item":
                    hi_t = dropout(k2, h0_i, p, True)
                else:
                    hu_t = dropout(k1, h0_u, p, True)
            else:
                hu_t = dropout(k1, h0_u, p, True)
                hi_t = dropout(k2, h0_i, p, True)
        enc_u, enc_i = self._gat_encode(params, bus, h0_u, h0_i, hu_t, hi_t)
        dec = self._gcn_decode(
            params, bus, jnp.concatenate([enc_u, enc_i], 0)
        )
        dec_u, dec_i = dec[:nu], dec[nu:]
        # L_fc (cold side only by default, FSGNN.py:368-387)
        if bool(self.args.fsgnn_lfc_cold_side_only):
            if self.args.cold_object == "item":
                idx = jnp.asarray(self.data.mapped_cold_item_idx)
                l_fc = jnp.mean((dec_i[idx] - h0_i[idx]) ** 2)
            else:
                idx = jnp.asarray(self.data.mapped_cold_user_idx)
                l_fc = jnp.mean((dec_u[idx] - h0_u[idx]) ** 2)
        else:
            l_fc = jnp.mean((dec_u - h0_u) ** 2) + jnp.mean((dec_i - h0_i) ** 2)
        return dec_u, dec_i, l_fc

    def _structure_loss(self, params, bus, hu, hi, key):
        def gcn(h, g_arrs, n_rows, layers):
            x = h
            for lin_p in layers:
                x = jax.nn.relu(
                    sym_spmm_arrays(n_rows, *g_arrs, linear(lin_p, x))
                )
            return x

        hu_n = gcn(hu, bus["g_uu"], self.data.user_num, params["sc_uu"])
        hi_n = gcn(hi, bus["g_ii"], self.data.item_num, params["sc_ii"])
        max_e = int(self.args.fsgnn_sc_max_edges)
        k1, k2 = jax.random.split(key)
        parts = []
        for (rows, cols), h_n, k in (
            (bus["uu_edges"], hu_n, k1),
            (bus["ii_edges"], hi_n, k2),
        ):
            m = rows.shape[0]
            if m == 0:
                continue
            n_take = min(m, max_e)
            sel = jax.random.randint(k, (n_take,), 0, m)
            a_h = h_n[rows[sel]]
            b_h = h_n[cols[sel]]
            x = jax.nn.relu(
                linear(params["struct_mlp"][0], jnp.concatenate([a_h, b_h], -1))
            )
            pred = linear(params["struct_mlp"][1], x)[:, 0]
            parts.append(jnp.mean((pred - 1.0) ** 2))
        if not parts:
            return jnp.zeros(())
        return sum(parts) / len(parts)

    def _lightgcn(self, bus, ego_u, ego_i):
        ego = jnp.concatenate([ego_u, ego_i], 0)
        acc = ego
        h = ego
        for _ in range(self.n_layers):
            h = sym_spmm_arrays(self._n_all, *bus["g_complete"], h)
            acc = acc + h
        mean = acc / (self.n_layers + 1)
        nu = ego_u.shape[0]
        return mean[:nu], mean[nu:]

    def loss_fn(self, params, batch, key):
        bus = batch["bus"]
        k1, k2 = jax.random.split(key)
        dec_u, dec_i, l_fc = self._forward_training(params, bus, k1)
        l_sc = self._structure_loss(params, bus, dec_u, dec_i, k2)
        if self.id_residual:
            ego_u = dec_u + params["emb_user"]
            ego_i = dec_i + params["emb_item"]
        else:
            ego_u, ego_i = dec_u, dec_i
        rec_u, rec_i = self._lightgcn(bus, ego_u, ego_i)
        u = rec_u[batch["user"]]
        pos = rec_i[batch["pos_item"]]
        neg = rec_i[batch["neg_item"]]
        w = batch["weight"]
        return (
            bpr_loss(u, pos, neg, w)
            + float(self.args.fsgnn_lambda_fc) * l_fc
            + float(self.args.fsgnn_mu_sc) * l_sc
            + l2_reg_loss(self.reg, u, pos, neg, weight=w)
        )

    def forward_tables(self, params):
        return self._forward_impl(params, self._bus)

    def _forward_impl(self, params, bus):
        dec_u, dec_i, _ = self._forward_training(params, bus, None)
        if self.id_residual:
            dec_u = dec_u + params["emb_user"]
            dec_i = dec_i + params["emb_item"]
        return self._lightgcn(bus, dec_u, dec_i)
