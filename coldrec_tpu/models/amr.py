"""AMR cold-start model (reference: model/AMR.py).

VBPR + adversarial FGSM noise on content: noise = ∂(sum softplus BPR)/∂content
(detached), adversarial prediction perturbs content by eps*normalize(noise),
adv loss weighted by lmd (AMR.py:146-180). Loads **VBPR's** saved tensors
(P, Q, PQ2/aux, W — AMR.py:94-124), not the generic backbone. The reference's
inner loss.backward() only harvests the content gradient (its param grads
are zeroed before the outer step) — here that is a plain jax.grad wrt the
gathered content rows under stop_gradient. Divergence note: the reference
differentiates wrt the FULL content matrix, so an item occurring several
times in one batch sums its occurrences' gradients into one noise row; here
the grad is per-batch-row (memory-bounded at book-crossing scale). Identical
when batch items are distinct.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .vbpr import VBPR


class AMR(VBPR):
    def __init__(self, config):
        # bypass VBPR.__init__'s backbone load; replicate with VBPR tensors
        super(VBPR, self).__init__(config)
        vbpr = self.load_backbone(
            model="VBPR",
            required=("user_emb_main_P", "item_emb_main_Q", "W"),
        )
        aux_key = "user_emb_aux" if self.args.cold_object == "item" else "item_emb_aux"
        if aux_key not in vbpr:
            raise KeyError(f"VBPR checkpoint missing {aux_key}")
        self.params = {
            "P": vbpr["user_emb_main_P"],
            "Q": vbpr["item_emb_main_Q"],
            "PQ2": vbpr[aux_key],
            "W": vbpr["W"],
        }
        self.content = self.cold_side_content
        self.eps = float(self.args.eps)
        self.lmd = float(self.args.lmd)
        self.lr1, self.wd1 = [float(x) for x in self.args.p_emb]
        self.lr2, self.wd2 = [float(x) for x in self.args.p_ctx]
        self.setup_optimizer()

    def _pair_scores_content(self, params, uid, iid, content_rows):
        """Scores with explicit content rows for the cold-object side."""
        p1 = jnp.sum(params["P"][uid] * params["Q"][iid], axis=1)
        if self.args.cold_object == "item":
            p2 = jnp.sum(params["PQ2"][uid] * (content_rows @ params["W"]), axis=1)
        else:
            p2 = jnp.sum((content_rows @ params["W"]) * params["PQ2"][iid], axis=1)
        return p1 + p2

    def loss_fn(self, params, batch, key):
        uid, iid, nid = batch["user"], batch["pos_item"], batch["neg_item"]
        w = batch["weight"]
        cold_pos = iid if self.args.cold_object == "item" else uid
        cold_neg = nid if self.args.cold_object == "item" else uid
        c_pos = self.content[cold_pos]
        c_neg = self.content[cold_neg]

        # FGSM direction: grad of the softplus BPR sum wrt the content rows
        def bpr_of_content(cp, cn):
            pred_p = self._pair_scores_content(params, uid, iid, cp)
            pred_n = self._pair_scores_content(params, uid, nid, cn)
            return jnp.sum(jax.nn.softplus(-(pred_p - pred_n)) * w)

        g_pos, g_neg = jax.grad(bpr_of_content, argnums=(0, 1))(c_pos, c_neg)
        g_pos = jax.lax.stop_gradient(g_pos)
        g_neg = jax.lax.stop_gradient(g_neg)

        def _norm(x):
            n = jnp.linalg.norm(x, axis=1, keepdims=True)
            return x / jnp.maximum(n, 1e-12)

        # normal loss
        pred_p = self._pair_scores_content(params, uid, iid, c_pos)
        pred_n = self._pair_scores_content(params, uid, nid, c_neg)
        loss = jnp.sum(jax.nn.softplus(-(pred_p - pred_n)) * w)
        # adversarial loss
        pred_p_adv = self._pair_scores_content(
            params, uid, iid, c_pos + self.eps * _norm(g_pos)
        )
        pred_n_adv = self._pair_scores_content(
            params, uid, nid, c_neg + self.eps * _norm(g_neg)
        )
        loss = loss + self.lmd * jnp.sum(
            jax.nn.softplus(-(pred_p_adv - pred_n_adv)) * w
        )

        wcol = w[:, None]
        if self.args.cold_object == "item":
            emb_regs = (
                jnp.sum(params["P"][uid] ** 2 * wcol)
                + jnp.sum(params["PQ2"][uid] ** 2 * wcol)
                + jnp.sum(params["Q"][iid] ** 2 * wcol)
                + jnp.sum(params["Q"][nid] ** 2 * wcol)
            )
        else:
            emb_regs = (
                jnp.sum(params["P"][uid] ** 2 * wcol)
                + jnp.sum(params["PQ2"][iid] ** 2 * wcol)
                + jnp.sum(params["PQ2"][nid] ** 2 * wcol)
                + jnp.sum(params["Q"][iid] ** 2 * wcol)
                + jnp.sum(params["Q"][nid] ** 2 * wcol)
            )
        return loss + self.wd1 * emb_regs + self.wd2 * jnp.sum(params["W"] ** 2)
