"""Metrics vs a dict-based oracle that mirrors the reference evaluator."""
import math

import numpy as np

from coldrec_tpu.utils.metrics import ranking_evaluation, ranking_metrics


def oracle_metrics(origin, res, n):
    """Literal transcription of the reference's Metric semantics
    (ColdRec util/evaluator.py) over dict-of-dict ground truth + rec lists."""
    predicted = {u: res[u][:n] for u in res}
    hits = {
        u: len(set(origin[u]).intersection(set(predicted[u]))) for u in origin
    }
    total = sum(len(origin[u]) for u in origin)
    hr = 0.0 if total == 0 else round(sum(hits.values()) / total, 5)
    prec = round(sum(hits.values()) / (len(hits) * n), 5)
    recall_list = [hits[u] / len(origin[u]) for u in hits if len(origin[u]) > 0]
    recall = round(sum(recall_list) / len(recall_list), 5)
    sum_ndcg, n_valid = 0.0, 0
    for u in res:
        dcg = sum(
            1.0 / math.log2(k + 2)
            for k, item in enumerate(predicted[u])
            if item in origin[u]
        )
        idcg = sum(1.0 / math.log2(k + 2) for k in range(min(n, len(origin[u]))))
        if idcg == 0:
            continue
        sum_ndcg += dcg / idcg
        n_valid += 1
    ndcg = 0.0 if n_valid == 0 else round(sum_ndcg / n_valid, 5)
    return [hr, prec, recall, ndcg]


def random_case(rng, n_users=40, n_items=200, max_gt=8, max_n=20):
    gt_items, indptr = [], [0]
    origin = {}
    for u in range(n_users):
        k = rng.integers(1, max_gt + 1)
        items = rng.choice(n_items, size=k, replace=False)
        origin[u] = set(int(x) for x in items)
        gt_items.extend(items.tolist())
        indptr.append(len(gt_items))
    rec = np.stack([rng.choice(n_items, size=max_n, replace=False) for _ in range(n_users)])
    res = {u: [int(x) for x in rec[u]] for u in range(n_users)}
    return (
        np.array(indptr),
        np.array(gt_items),
        rec,
        origin,
        res,
        n_items,
    )


def test_metrics_match_oracle(rng):
    for trial in range(5):
        indptr, gt, rec, origin, res, n_items = random_case(rng)
        got = ranking_metrics(indptr, gt, rec, [5, 10, 20], n_items)
        for i, n in enumerate([5, 10, 20]):
            expect = oracle_metrics(origin, res, n)
            assert got[i] == expect, f"trial {trial} n={n}: {got[i]} vs {expect}"


def test_perfect_recommendation(rng):
    # rec list starts with all gt items -> recall=1, ndcg=1
    n_items = 50
    indptr = np.array([0, 3])
    gt = np.array([7, 3, 11])
    rec = np.array([[7, 3, 11, 0, 1, 2, 4, 5, 6, 8]])
    ((hr, prec, recall, ndcg),) = ranking_metrics(indptr, gt, rec, [10], n_items)
    assert recall == 1.0 and ndcg == 1.0 and hr == 1.0
    assert prec == round(3 / 10, 5)


def test_size_mismatch_raises(rng):
    import pytest

    with pytest.raises(ValueError):
        ranking_metrics(np.array([0, 1, 2]), np.array([1, 2]), np.zeros((3, 5), int), [5], 10)


def test_measure_lines_format(rng):
    indptr, gt, rec, origin, res, n_items = random_case(rng)
    measure, perf = ranking_evaluation(indptr, gt, rec, [10], n_items)
    assert measure[0] == "Top 10\n"
    assert measure[1].startswith("Hit Ratio:")
    assert float(measure[4].split(":")[1]) == perf[0][3]
