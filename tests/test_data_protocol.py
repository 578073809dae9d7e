"""Protocol tests: split rules, first-seen id remap, graph normalization."""
import numpy as np
import pytest
import scipy.sparse as sp

from coldrec_tpu.data.builder import ColdStartDataset, first_seen_order
from coldrec_tpu.data.split import cold_start_split
from coldrec_tpu.data.synthetic import synthetic_dataset, synthetic_interactions


def test_first_seen_order():
    ids = np.array([5, 3, 5, 9, 3, 1])
    assert first_seen_order(ids).tolist() == [5, 3, 9, 1]


class TestSplitProtocol:
    def setup_method(self):
        pairs = synthetic_interactions(150, 90, 3000, seed=3)
        self.res = cold_start_split(pairs, cold_object="item", seed=7)

    def test_warm_cold_items_disjoint(self):
        r = self.res
        warm_items = set(r.warm_train[:, 1]) | set(r.warm_val[:, 1]) | set(
            r.warm_test[:, 1]
        )
        cold_items = set(r.cold_val[:, 1]) | set(r.cold_test[:, 1])
        assert not warm_items & cold_items

    def test_leakage_repair(self):
        # every val/test user and item must appear in warm_train
        r = self.res
        tr_u, tr_i = set(r.warm_train[:, 0]), set(r.warm_train[:, 1])
        for split in (r.warm_val, r.warm_test):
            assert set(split[:, 0]) <= tr_u
            assert set(split[:, 1]) <= tr_i

    def test_cold_groups_disjoint_by_item(self):
        r = self.res
        assert not set(r.cold_val[:, 1]) & set(r.cold_test[:, 1])

    def test_overall_filter(self):
        # overall val contains only users present in both cold_val and warm_val
        r = self.res
        shared = set(r.cold_val[:, 0]) & set(r.warm_val[:, 0])
        assert set(r.overall_val[:, 0]) <= shared
        # and is exactly concat(cold, warm) filtered to those users
        expect = sum(
            1 for u in np.concatenate([r.cold_val, r.warm_val])[:, 0] if u in shared
        )
        assert r.overall_val.shape[0] == expect

    def test_no_duplicate_pairs(self):
        r = self.res
        allp = np.concatenate(
            [r.warm_train, r.warm_val, r.warm_test, r.cold_val, r.cold_test]
        )
        keys = allp[:, 0] * (allp[:, 1].max() + 1) + allp[:, 1]
        assert len(np.unique(keys)) == len(keys)


class TestBuilder:
    def setup_method(self):
        self.data, self.res = synthetic_dataset(seed=5)

    def test_remap_round_trip(self):
        d = self.data
        raw_users = d.id2user
        assert np.array_equal(d.map_users(raw_users), np.arange(d.n_seen_users))
        raw_items = d.id2item
        assert np.array_equal(d.map_items(raw_items), np.arange(d.n_seen_items))

    def test_remap_first_seen_matches_reference_scan(self):
        """Dict-based scan (reference semantics) == vectorized remap."""
        d = self.data
        user_map, item_map = {}, {}
        for name in (
            "training",
            "warm_val",
            "warm_test",
            "cold_val",
            "cold_test",
            "overall_val",
            "overall_test",
        ):
            for u, i in d.raw_splits[name]:
                user_map.setdefault(int(u), len(user_map))
                item_map.setdefault(int(i), len(item_map))
        for raw, mapped in user_map.items():
            assert d.map_users(np.array([raw]))[0] == mapped
        for raw, mapped in item_map.items():
            assert d.map_items(np.array([raw]))[0] == mapped

    def test_unknown_id_raises(self):
        with pytest.raises(KeyError):
            self.data.map_users(np.array([10**6]))

    def test_norm_adj_symmetric_normalization(self):
        d = self.data
        adj = d.bipartite_adjacency()
        norm = d.normalize_graph(adj)
        # D^-1/2 A D^-1/2 row sums: for a node of degree k, sum over nonzero
        # cols j of 1/sqrt(deg_i * deg_j). Check against dense computation.
        dense = adj.toarray()
        deg = dense.sum(1)
        with np.errstate(divide="ignore"):
            dinv = np.where(deg > 0, deg**-0.5, 0.0)
        expect = dinv[:, None] * dense * dinv[None, :]
        np.testing.assert_allclose(norm.toarray(), expect, rtol=1e-5)

    def test_norm_adj_coo_matches_scipy(self):
        d = self.data
        g = d.norm_adj
        mat = sp.coo_matrix((g.vals, (g.rows, g.cols)), shape=g.shape)
        expect = d.normalize_graph(d.bipartite_adjacency())
        np.testing.assert_allclose(
            mat.toarray(), expect.toarray(), rtol=1e-5, atol=1e-7
        )

    def test_is_rated(self):
        d = self.data
        tp = d.train_pairs
        assert d.is_rated(tp[:50, 0], tp[:50, 1]).all()
        # a (user, item) pair not in training
        rng = np.random.default_rng(0)
        for _ in range(20):
            u = rng.integers(0, d.n_seen_users)
            rated = set(d.user_rated_slice(u).tolist())
            unrated = [i for i in range(d.n_seen_items) if i not in rated][:3]
            if unrated:
                assert not d.is_rated(
                    np.full(len(unrated), u), np.array(unrated)
                ).any()

    def test_eval_split_structure(self):
        d = self.data
        for name, es in d.eval_splits.items():
            pairs = d.splits[name]
            if pairs.shape[0] == 0:
                continue
            assert es.n_interactions <= pairs.shape[0]  # dups collapsed
            # users in first-seen order
            seen = []
            for u in pairs[:, 0]:
                if u not in seen:
                    seen.append(u)
            assert es.users.tolist() == seen
            # every (u, i) in CSR was in the split
            raw_set = {(int(u), int(i)) for u, i in pairs}
            for k, u in enumerate(es.users):
                for i in es.items[es.indptr[k] : es.indptr[k + 1]]:
                    assert (int(u), int(i)) in raw_set

    def test_candidate_mask(self):
        d = self.data
        warm_mask = d.candidate_mask("item", "warm")
        cold_mask = d.candidate_mask("item", "cold")
        assert set(warm_mask.tolist()) == set(d.mapped_cold_item_idx.tolist())
        assert set(cold_mask.tolist()) == set(d.mapped_warm_item_idx.tolist())
        assert d.candidate_mask("item", "all") is None
        assert d.candidate_mask("user", "warm") is None

    def test_rated_padded(self):
        d = self.data
        users = d.eval_splits["overall_val"].users[:8]
        padded = d.rated_padded(users)
        for k, u in enumerate(users):
            items = set(d.user_rated_slice(int(u)).tolist())
            row = padded[k]
            got = set(row[row < d.item_num].tolist())
            assert got == items
