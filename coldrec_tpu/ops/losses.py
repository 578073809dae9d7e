"""Loss library (reference: ColdRec util/utils.py:25-120), weighted for padding.

Every loss takes an optional per-row ``weight`` vector (1.0 real / 0.0 pad)
so that jitted fixed-shape batches reproduce the reference's mean over the
*real* rows exactly: weighted_mean(x, w) == mean(x[real]).

Numerical constants preserved: the reference's sigmoid epsilon is
``10e-6`` = 1e-5 (utils.py:28) and the softmax epsilon ``10e-6`` (utils.py:57).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_BPR_EPS = 1e-5  # reference writes 10e-6 (utils.py:28)


def _wmean(x: jnp.ndarray, weight: Optional[jnp.ndarray]) -> jnp.ndarray:
    if weight is None:
        return jnp.mean(x)
    return jnp.sum(x * weight) / jnp.maximum(jnp.sum(weight), 1.0)


def bpr_loss(
    user_emb: jnp.ndarray,
    pos_item_emb: jnp.ndarray,
    neg_item_emb: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """-log(eps + sigmoid(pos - neg)) averaged (utils.py:25-29)."""
    pos_score = jnp.sum(user_emb * pos_item_emb, axis=1)
    neg_score = jnp.sum(user_emb * neg_item_emb, axis=1)
    loss = -jnp.log(_BPR_EPS + jax.nn.sigmoid(pos_score - neg_score))
    return _wmean(loss, weight)


def softplus_bpr_loss(
    pos_score: jnp.ndarray,
    neg_score: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """softplus(neg - pos) form used by VBPR/AMR/MTPR (VBPR.py:143-165)."""
    return _wmean(jax.nn.softplus(neg_score - pos_score), weight)


def l2_reg_loss(
    reg: float, *embs: jnp.ndarray, weight: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """reg * sum_e ||e||_F / batch (utils.py:44-48).

    The reference divides the full-tensor L2 norm by the row count. With
    padding, pad rows are zeroed before the norm and the divisor is the real
    row count, which reproduces the un-padded value exactly.
    """
    total = 0.0
    for emb in embs:
        if weight is not None:
            emb = emb * weight.reshape((-1,) + (1,) * (emb.ndim - 1))
            denom = jnp.maximum(jnp.sum(weight), 1.0)
        else:
            denom = emb.shape[0]
        total = total + jnp.sqrt(jnp.sum(emb * emb)) / denom
    return total * reg


def mse_loss(
    pred: jnp.ndarray, target: jnp.ndarray, weight: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Elementwise-mean MSE (utils.py:32-34)."""
    sq = (pred - target) ** 2
    if weight is None:
        return jnp.mean(sq)
    w = weight.reshape((-1,) + (1,) * (sq.ndim - 1))
    return jnp.sum(sq * w) / jnp.maximum(jnp.sum(w) * sq.shape[-1], 1.0)


def triplet_loss(
    user_emb: jnp.ndarray,
    pos_item_emb: jnp.ndarray,
    neg_item_emb: jnp.ndarray,
    margin: float = 0.5,
    weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """relu(d(u,p) - d(u,n) + margin) (utils.py:37-41)."""
    pos = jnp.sum((user_emb - pos_item_emb) ** 2, axis=1)
    neg = jnp.sum((user_emb - neg_item_emb) ** 2, axis=1)
    return _wmean(jax.nn.relu(pos - neg + margin), weight)


def batch_softmax_loss(
    user_emb: jnp.ndarray,
    item_emb: jnp.ndarray,
    temperature: float,
    weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """In-batch softmax over cosine scores (utils.py:51-58)."""
    u = _normalize(user_emb)
    v = _normalize(item_emb)
    pos = jnp.exp(jnp.sum(u * v, axis=-1) / temperature)
    ttl = jnp.sum(jnp.exp(u @ v.T / temperature), axis=1)
    loss = -jnp.log(pos / ttl + 1e-5)
    return _wmean(loss, weight)


def _normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """torch.nn.functional.normalize semantics: x / max(||x||, eps)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def info_nce(
    view1: jnp.ndarray,
    view2: jnp.ndarray,
    temperature: float,
    b_cos: bool = True,
    weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Diagonal-positive InfoNCE over in-batch negatives (utils.py:61-76)."""
    if b_cos:
        view1, view2 = _normalize(view1), _normalize(view2)
    logits = (view1 @ view2.T) / temperature
    score = jnp.diag(jax.nn.log_softmax(logits, axis=1))
    return -_wmean(score, weight)


def info_nce_all(
    view1: jnp.ndarray,
    view2_pos: jnp.ndarray,
    view2_all: jnp.ndarray,
    temperature: float,
    weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """InfoNCE where negatives are *all* rows of view2_all (NCL.py:68-94 form):
    -log exp(cos(v1, pos)/t) / sum_j exp(cos(v1, all_j)/t)."""
    v1 = _normalize(view1)
    vp = _normalize(view2_pos)
    va = _normalize(view2_all)
    pos = jnp.sum(v1 * vp, axis=1) / temperature
    ttl = jax.nn.logsumexp(v1 @ va.T / temperature, axis=1)
    return _wmean(-(pos - ttl), weight)


def unique_padded(
    ids: jnp.ndarray, weight: Optional[jnp.ndarray], size: int, sentinel: int
):
    """Static-shape unique: returns (safe_ids, valid_mask).

    The reference calls ``torch.unique`` on batch indices before its CL
    losses (SimGCL.py:54-55). XLA needs static shapes, so uniques are padded
    to ``size`` with ``sentinel`` and consumers mask the pad entries.
    """
    if weight is not None:
        ids = jnp.where(weight > 0, ids, sentinel)
    vals = jnp.unique(ids, size=size, fill_value=sentinel)
    mask = vals != sentinel
    return jnp.where(mask, vals, 0), mask.astype(jnp.float32)


def info_nce_masked(
    view1: jnp.ndarray,
    view2: jnp.ndarray,
    valid: jnp.ndarray,
    temperature: float,
) -> jnp.ndarray:
    """InfoNCE over a padded unique batch: padded rows are dropped and padded
    columns are excluded from every denominator. Matches the reference's
    InfoNCE on the unpadded unique set exactly."""
    v1 = _normalize(view1)
    v2 = _normalize(view2)
    logits = (v1 @ v2.T) / temperature
    neg_inf = jnp.finfo(logits.dtype).min
    logits = jnp.where(valid[None, :] > 0, logits, neg_inf)
    log_prob = jnp.diag(logits) - jax.nn.logsumexp(logits, axis=1)
    return -_wmean(jnp.where(valid > 0, log_prob, 0.0), valid)


def kl_divergence(p_logit: jnp.ndarray, q_logit: jnp.ndarray) -> jnp.ndarray:
    """Mean KL(p||q) from logits (utils.py:117-120)."""
    p = jax.nn.softmax(p_logit, axis=-1)
    kl = jnp.sum(
        p * (jax.nn.log_softmax(p_logit, axis=-1) - jax.nn.log_softmax(q_logit, axis=-1)),
        axis=1,
    )
    return jnp.mean(kl)
