"""Statistical properties of the negative samplers (both native and numpy)."""
import numpy as np
import pytest

from coldrec_tpu.data.sampler import sample_negatives, warm_item_pool
from coldrec_tpu.data.synthetic import synthetic_dataset


@pytest.fixture(scope="module")
def data():
    d, _ = synthetic_dataset(
        n_users=40, n_items=60, n_inter=900, cold_object="item", seed=101
    )
    return d


def test_negatives_never_rated(data):
    rng = np.random.default_rng(0)
    users = rng.integers(0, data.n_seen_users, 5000)
    negs = sample_negatives(data, users, rng)
    assert not data.is_rated(users, negs).any()


def test_negatives_uniform_over_unrated(data):
    """chi-square-ish check: one user's negatives cover its unrated items
    roughly uniformly (both the native and numpy paths sample uniformly
    with rejection, like the reference utils.py:141-153)."""
    rng = np.random.default_rng(1)
    u = int(np.argmax(np.diff(data.train_indptr)))  # heaviest user
    rated = set(data.user_rated_slice(u).tolist())
    unrated = [i for i in range(data.n_seen_items) if i not in rated]
    n_draws = 20000
    negs = sample_negatives(data, np.full(n_draws, u), rng)
    counts = np.bincount(negs, minlength=data.n_seen_items)
    assert counts[list(rated)].sum() == 0
    expect = n_draws / len(unrated)
    chi2 = float(np.sum((counts[unrated] - expect) ** 2 / expect))
    # dof = len(unrated)-1; generous 5-sigma-ish bound
    dof = len(unrated) - 1
    assert chi2 < dof + 6 * np.sqrt(2 * dof), (chi2, dof)


def test_pool_restricted_sampling(data):
    rng = np.random.default_rng(2)
    pool = warm_item_pool(data)
    users = rng.integers(0, data.n_seen_users, 3000)
    negs = sample_negatives(data, users, rng, pool=pool)
    assert np.isin(negs, pool).all()
    assert not data.is_rated(users, negs).any()
