"""Host-side minibatch samplers with static output shapes.

Rebuild of the reference samplers (ColdRec util/utils.py:123-336) in
vectorized numpy, adapted for XLA's static-shape world:

  * every batch has exactly ``batch_size`` rows; the final partial batch is
    padded and carries a float ``weight`` vector (1.0 real / 0.0 pad) so
    jitted loss steps see one shape and losses stay exact
    (weighted mean == reference mean over real rows);
  * negative sampling is uniform over the *seen* item table (the reference
    samples from ``data.item.keys()``, utils.py:128) with vectorized
    rejection resampling against the training CSR (utils.py:141-153);
  * all randomness flows through an explicit numpy Generator.

Each sampler yields dict batches of int32/float32 arrays, ready for
``jax.device_put``.
"""
from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

from .builder import ColdStartDataset


def _pad(arr: np.ndarray, batch_size: int, fill=0) -> np.ndarray:
    n = arr.shape[0]
    if n == batch_size:
        return arr
    pad_shape = (batch_size - n,) + arr.shape[1:]
    return np.concatenate([arr, np.full(pad_shape, fill, dtype=arr.dtype)])


def sample_negatives(
    data: ColdStartDataset,
    users: np.ndarray,
    rng: np.random.Generator,
    n_negs: int = 1,
    pool: Optional[np.ndarray] = None,
    max_rounds: int = 200,
) -> np.ndarray:
    """Uniform negatives with rejection against training positives.

    Matches the reference's resample-until-clean loop (utils.py:141-153):
    every returned item is guaranteed not rated by its user in training.
    ``pool`` optionally restricts the candidate item ids (e.g. warm-only
    pools for CLCRec/CCFCRec); default is all seen items.
    """
    total = users.shape[0] * n_negs
    u_rep = np.repeat(users, n_negs)
    # native C++ fast path (same semantics: uniform + rejection)
    from .. import native

    if native.available():
        negs = native.sample_negatives_native(
            data.train_indptr,
            data.train_items_sorted,
            u_rep,
            data.n_seen_items,
            int(rng.integers(0, 2**63 - 1)),
            pool=pool,
        )
        if negs is not None:
            if n_negs == 1:
                return negs
            return negs.reshape(users.shape[0], n_negs)
    if pool is None:
        negs = rng.integers(0, data.n_seen_items, size=total, dtype=np.int64)
    else:
        negs = pool[rng.integers(0, pool.shape[0], size=total)]
    bad = data.is_rated(u_rep, negs)
    rounds = 0
    while bad.any():
        idx = np.where(bad)[0]
        if pool is None:
            negs[idx] = rng.integers(0, data.n_seen_items, size=idx.shape[0])
        else:
            negs[idx] = pool[rng.integers(0, pool.shape[0], size=idx.shape[0])]
        bad[idx] = data.is_rated(u_rep[idx], negs[idx])
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                "negative sampling failed to converge; candidate pool too small"
            )
    if n_negs == 1:
        return negs
    return negs.reshape(users.shape[0], n_negs)


def pairwise_batches(
    data: ColdStartDataset,
    batch_size: int,
    rng: np.random.Generator,
    n_negs: int = 1,
) -> Iterator[Dict[str, np.ndarray]]:
    """BPR triplet batches (utils.py:123-157): shuffled positives + 1 rejected
    negative per positive. Yields {user, pos_item, neg_item, weight}."""
    perm = rng.permutation(data.n_train)
    pairs = data.train_pairs[perm]
    for start in range(0, data.n_train, batch_size):
        chunk = pairs[start : start + batch_size]
        users = chunk[:, 0]
        negs = sample_negatives(data, users, rng, n_negs=n_negs)
        n = chunk.shape[0]
        w = np.ones(n, dtype=np.float32)
        yield {
            "user": _pad(users.astype(np.int32), batch_size),
            "pos_item": _pad(chunk[:, 1].astype(np.int32), batch_size),
            "neg_item": _pad(negs.astype(np.int32), batch_size),
            "weight": _pad(w, batch_size, fill=0.0),
        }


def pairwise_batches_with_neg_users(
    data: ColdStartDataset,
    batch_size: int,
    rng: np.random.Generator,
) -> Iterator[Dict[str, np.ndarray]]:
    """LARA-style batches (utils.py:160-188): positive (u,i) plus a negative
    item for the user and a negative user for the item."""
    # item->users CSR for negative-user rejection
    tp = data.train_pairs
    order = np.lexsort((tp[:, 0], tp[:, 1]))
    items_sorted_u = tp[order, 0]
    counts = np.bincount(tp[:, 1], minlength=data.item_num)
    indptr = np.zeros(data.item_num + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    item_keys = (
        np.repeat(np.arange(data.item_num, dtype=np.int64), counts)
        * (data.user_num + 1)
        + items_sorted_u
    )

    def user_rated_item(users_q, items_q):
        keys = items_q * (data.user_num + 1) + users_q
        pos = np.searchsorted(item_keys, keys)
        pos = np.minimum(pos, max(item_keys.shape[0] - 1, 0))
        if item_keys.size == 0:
            return np.zeros(users_q.shape, dtype=bool)
        return item_keys[pos] == keys

    perm = rng.permutation(data.n_train)
    pairs = data.train_pairs[perm]
    for start in range(0, data.n_train, batch_size):
        chunk = pairs[start : start + batch_size]
        users, items = chunk[:, 0], chunk[:, 1]
        neg_items = sample_negatives(data, users, rng)
        neg_users = rng.integers(0, data.n_seen_users, size=users.shape[0])
        bad = user_rated_item(neg_users, items)
        while bad.any():
            idx = np.where(bad)[0]
            neg_users[idx] = rng.integers(0, data.n_seen_users, size=idx.shape[0])
            bad[idx] = user_rated_item(neg_users[idx], items[idx])
        n = chunk.shape[0]
        yield {
            "user": _pad(users.astype(np.int32), batch_size),
            "pos_item": _pad(items.astype(np.int32), batch_size),
            "neg_item": _pad(neg_items.astype(np.int32), batch_size),
            "neg_user": _pad(neg_users.astype(np.int32), batch_size),
            "weight": _pad(np.ones(n, np.float32), batch_size, fill=0.0),
        }


def warm_item_pool(data: ColdStartDataset) -> np.ndarray:
    """Seen items minus cold items — the CLCRec/CCFCRec negative pool
    (utils.py:196-209)."""
    cold = np.zeros(data.n_seen_items, dtype=bool)
    cold[data.mapped_cold_item_idx[data.mapped_cold_item_idx < data.n_seen_items]] = True
    pool = np.where(~cold)[0].astype(np.int64)
    if pool.size == 0:
        raise ValueError("warm-item negative pool is empty; check cold_item split")
    return pool


def ccfcrec_batches(
    data: ColdStartDataset,
    batch_size: int,
    rng: np.random.Generator,
    positive_number: int,
    negative_number: int,
    self_neg_number: int,
    pool: Optional[np.ndarray] = None,
) -> Iterator[Dict[str, np.ndarray]]:
    """CCFCRec batches (utils.py:237-300): positive pair + negative user +
    P co-occurring positives (with replacement) + PxN warm negatives +
    S self-negatives per row."""
    if pool is None:
        pool = warm_item_pool(data)
    # item -> users CSR for negative-user rejection
    tp = data.train_pairs
    order = np.lexsort((tp[:, 0], tp[:, 1]))
    by_item_users = tp[order, 0]
    counts_i = np.bincount(tp[:, 1], minlength=data.item_num)
    indptr_i = np.zeros(data.item_num + 1, dtype=np.int64)
    np.cumsum(counts_i, out=indptr_i[1:])
    item_keys = (
        np.repeat(np.arange(data.item_num, dtype=np.int64), counts_i)
        * (data.user_num + 1)
        + by_item_users
    )

    def user_rated_item(users_q, items_q):
        if item_keys.size == 0:
            return np.zeros(users_q.shape, dtype=bool)
        keys = items_q * (data.user_num + 1) + users_q
        pos = np.minimum(np.searchsorted(item_keys, keys), item_keys.shape[0] - 1)
        return item_keys[pos] == keys

    perm = rng.permutation(data.n_train)
    pairs = data.train_pairs[perm]
    deg = np.diff(data.train_indptr)
    for start in range(0, data.n_train, batch_size):
        chunk = pairs[start : start + batch_size]
        users, items = chunk[:, 0], chunk[:, 1]
        n = chunk.shape[0]
        # P positives per row with replacement from the user's train items
        starts = data.train_indptr[users]
        cnt = np.maximum(deg[users], 1)
        r = rng.random((n, positive_number))
        pos_grid = data.train_items_sorted[
            starts[:, None] + (r * cnt[:, None]).astype(np.int64)
        ]
        # negative user per row (not a rater of the item)
        neg_users = rng.integers(0, data.n_seen_users, size=n)
        bad = user_rated_item(neg_users, items)
        while bad.any():
            idx = np.where(bad)[0]
            neg_users[idx] = rng.integers(0, data.n_seen_users, size=idx.shape[0])
            bad[idx] = user_rated_item(neg_users[idx], items[idx])
        # PxN negative grid + S self negatives from warm pool minus rated
        neg_grid = sample_negatives(
            data, np.repeat(users, negative_number * positive_number),
            rng, pool=pool,
        ).reshape(n, positive_number, negative_number)
        self_negs = sample_negatives(
            data, np.repeat(users, self_neg_number), rng, pool=pool
        ).reshape(n, self_neg_number)
        yield {
            "user": _pad(users.astype(np.int32), batch_size),
            "pos_item": _pad(items.astype(np.int32), batch_size),
            "neg_user": _pad(neg_users.astype(np.int32), batch_size),
            "pos_grid": _pad(pos_grid.astype(np.int32), batch_size),
            "neg_grid": _pad(neg_grid.astype(np.int32), batch_size),
            "self_negs": _pad(self_negs.astype(np.int32), batch_size),
            "weight": _pad(np.ones(n, np.float32), batch_size, fill=0.0),
        }


def pairwise_batches_multi_neg(
    data: ColdStartDataset,
    batch_size: int,
    rng: np.random.Generator,
    n_negs: int,
    pool: Optional[np.ndarray] = None,
) -> Iterator[Dict[str, np.ndarray]]:
    """CLCRec-style batches (utils.py:191-233): positive + n_negs negatives per
    row drawn from a restricted (warm) pool, rejecting training positives."""
    perm = rng.permutation(data.n_train)
    pairs = data.train_pairs[perm]
    for start in range(0, data.n_train, batch_size):
        chunk = pairs[start : start + batch_size]
        users = chunk[:, 0]
        negs = sample_negatives(data, users, rng, n_negs=n_negs, pool=pool)
        n = chunk.shape[0]
        yield {
            "user": _pad(users.astype(np.int32), batch_size),
            "pos_item": _pad(chunk[:, 1].astype(np.int32), batch_size),
            "neg_items": _pad(negs.astype(np.int32), batch_size),
            "weight": _pad(np.ones(n, np.float32), batch_size, fill=0.0),
        }
