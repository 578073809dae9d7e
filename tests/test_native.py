"""Native C++ data plane vs numpy semantics."""
import os

import numpy as np
import pytest

from coldrec_tpu import native
from coldrec_tpu.data.synthetic import synthetic_dataset

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no toolchain)"
)


def test_parse_interactions(tmp_path):
    path = tmp_path / "x.csv"
    path.write_text("user,item\n3,7\n12,0\n5,999\n")
    out = native.parse_interactions_native(str(path))
    np.testing.assert_array_equal(out, [[3, 7], [12, 0], [5, 999]])


def test_parse_no_trailing_newline(tmp_path):
    path = tmp_path / "x.csv"
    path.write_text("user,item\n1,2\n3,4")
    out = native.parse_interactions_native(str(path))
    np.testing.assert_array_equal(out, [[1, 2], [3, 4]])


def test_parse_extra_columns(tmp_path):
    path = tmp_path / "x.csv"
    path.write_text("user,item,rating\n1,2,5\n3,4,1\n")
    out = native.parse_interactions_native(str(path))
    np.testing.assert_array_equal(out, [[1, 2], [3, 4]])


def test_sample_negatives_rejects_positives():
    data, _ = synthetic_dataset(n_users=80, n_items=60, n_inter=1500, seed=9)
    users = np.random.default_rng(0).integers(
        0, data.n_seen_users, 2000
    ).astype(np.int64)
    negs = native.sample_negatives_native(
        data.train_indptr, data.train_items_sorted, users,
        data.n_seen_items, seed=123,
    )
    assert negs.min() >= 0 and negs.max() < data.n_seen_items
    assert not data.is_rated(users, negs).any()


def test_sample_negatives_pool():
    data, _ = synthetic_dataset(n_users=80, n_items=60, n_inter=1500, seed=9)
    pool = np.arange(10, 30, dtype=np.int64)
    users = np.zeros(500, np.int64)
    negs = native.sample_negatives_native(
        data.train_indptr, data.train_items_sorted, users,
        data.n_seen_items, seed=7, pool=pool,
    )
    assert set(negs.tolist()) <= set(pool.tolist())
    assert not data.is_rated(users, negs).any()


def test_permutation():
    out = native.permutation_native(1000, seed=5)
    assert sorted(out.tolist()) == list(range(1000))
    out2 = native.permutation_native(1000, seed=5)
    np.testing.assert_array_equal(out, out2)  # deterministic
    out3 = native.permutation_native(1000, seed=6)
    assert not np.array_equal(out, out3)


def test_ppr_push_matches_power_iteration(monkeypatch):
    """The full production dispatch (ppr_topk_extra_edges) must produce
    near-identical extra edges through the dense power-iteration branch
    and the native forward-push branch (threshold forced down so the
    push branch runs on this small graph), in both weighted modes."""
    import scipy.sparse as sp

    import coldrec_tpu.models.fsgnn as F

    nu, ni = 60, 50
    dens = sp.random(
        nu, ni, density=0.08, random_state=7, dtype=np.float32
    )
    r_train = (dens > 0).astype(np.float32).tocsr()

    for weighted in (True, False):
        dense = F.ppr_topk_extra_edges(
            r_train, delta=0.15, n_iter=60, topk=5, weighted=weighted
        )
        monkeypatch.setattr(F, "_DENSE_PPR_ELEMS", 0)  # force push branch
        push = F.ppr_topk_extra_edges(
            r_train, delta=0.15, n_iter=60, topk=5, weighted=weighted,
            push_eps=1e-9,
        )
        monkeypatch.setattr(F, "_DENSE_PPR_ELEMS", 1 << 28)
        d, p = dense.toarray(), push.toarray()
        agree = total = 0
        for u in range(nu):
            want = set(np.where(d[u] > 0)[0].tolist())
            got = set(np.where(p[u] > 0)[0].tolist())
            if not want:
                continue
            total += len(want)
            agree += len(want & got)
        assert total > 0
        # tiny eps -> push is near-exact; allow boundary ties and the
        # documented unweighted zero-padding divergence
        threshold = 0.9 if weighted else 0.75
        assert agree / total > threshold, (weighted, agree, total)
        if weighted:
            # weights are per-row max-normalized PPR scores on both paths
            common = (d > 0) & (p > 0)
            np.testing.assert_allclose(d[common], p[common], atol=5e-3)
