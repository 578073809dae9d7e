"""Vectorized ranking metrics with reference-identical semantics.

Mirrors ColdRec util/evaluator.py:

  * hits         — |gt ∩ top-n| per user (evaluator.py:8-15)
  * hit_ratio    — sum(hits) / total gt interactions, round 5 (17-32)
  * precision    — sum(hits) / (|users| * n), round 5 (46-51)
  * recall       — mean over users of hits/|gt| (skipping |gt|=0), round 5 (53-63)
  * NDCG         — binary gain DCG / IDCG with IDCG over the first
                   min(n, |gt|) positions; users with IDCG=0 skipped;
                   round 5 (94-115)

The reference computes these with python dict loops; here everything is a
vectorized numpy pass over CSR ground truth + a (n_users, max_N) matrix of
recommended item ids. The hard size-mismatch check of ranking_evaluation
(evaluator.py:161-164) becomes a raised ValueError.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def _membership(
    gt_indptr: np.ndarray,
    gt_items: np.ndarray,
    rec_items: np.ndarray,
    item_space: int,
) -> np.ndarray:
    """(n_users, max_N) bool: is rec_items[u, k] in user u's ground truth."""
    n_users, max_n = rec_items.shape
    rows = np.repeat(np.arange(n_users, dtype=np.int64), np.diff(gt_indptr))
    gt_keys = np.sort(rows * item_space + gt_items)
    rec_keys = (
        np.arange(n_users, dtype=np.int64)[:, None] * item_space + rec_items
    ).ravel()
    pos = np.searchsorted(gt_keys, rec_keys)
    pos = np.minimum(pos, max(gt_keys.shape[0] - 1, 0))
    if gt_keys.size == 0:
        return np.zeros((n_users, max_n), dtype=bool)
    return (gt_keys[pos] == rec_keys).reshape(n_users, max_n)


def ranking_metrics(
    gt_indptr: np.ndarray,
    gt_items: np.ndarray,
    rec_items: np.ndarray,
    topN: Sequence[int],
    item_space: int,
) -> List[List[float]]:
    """Per-n [hit_ratio, precision, recall, ndcg], matching evaluator.py output.

    Args:
      gt_indptr/gt_items: CSR ground truth over the eval users (mapped ids).
      rec_items: (n_users, >=max(topN)) recommended item ids, ranked.
      topN: cutoffs, e.g. [10, 20].
      item_space: strictly greater than any item id (for key packing).
    """
    n_users = rec_items.shape[0]
    if gt_indptr.shape[0] - 1 != n_users:
        raise ValueError(
            f"ground-truth set size {gt_indptr.shape[0] - 1} != "
            f"predicted set size {n_users}"
        )
    gt_counts = np.diff(gt_indptr)
    hit_mat = _membership(gt_indptr, gt_items, rec_items, item_space + 1)
    max_n = max(topN)
    # discount[k] = 1/log2(k+2)
    discount = 1.0 / np.log2(np.arange(max_n) + 2.0)

    out: List[List[float]] = []
    total_gt = int(gt_counts.sum())
    for n in topN:
        hits_n = hit_mat[:, :n].sum(axis=1)
        total_hits = int(hits_n.sum())
        hr = 0.0 if total_gt == 0 else round(total_hits / total_gt, 5)
        prec = 0.0 if n_users == 0 or n == 0 else round(total_hits / (n_users * n), 5)
        valid = gt_counts > 0
        recall = (
            0.0
            if not valid.any()
            else round(float(np.mean(hits_n[valid] / gt_counts[valid])), 5)
        )
        dcg = (hit_mat[:, :n] * discount[:n]).sum(axis=1)
        idcg_cum = np.concatenate([[0.0], np.cumsum(discount[:n])])
        idcg = idcg_cum[np.minimum(gt_counts, n)]
        nz = idcg > 0
        ndcg = 0.0 if not nz.any() else round(float(np.mean(dcg[nz] / idcg[nz])), 5)
        out.append([hr, prec, recall, ndcg])
    return out


def ranking_evaluation(
    gt_indptr: np.ndarray,
    gt_items: np.ndarray,
    rec_items: np.ndarray,
    topN: Sequence[int],
    item_space: int,
) -> Tuple[List[str], List[List[float]]]:
    """Reference-shaped (measure lines, performance) pair (evaluator.py:153-187)."""
    performance = ranking_metrics(gt_indptr, gt_items, rec_items, topN, item_space)
    measure: List[str] = []
    for n, (hr, prec, recall, ndcg) in zip(topN, performance):
        measure.append(f"Top {n}\n")
        measure.append(f"Hit Ratio:{hr}\n")
        measure.append(f"Precision:{prec}\n")
        measure.append(f"Recall:{recall}\n")
        measure.append(f"NDCG:{ndcg}\n")
    return measure, performance
