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
