"""Latent-factor synthetic generator (data/synthetic.py) — the round-4
faithful-statistics parity tiers (mlfull/xing) depend on its contracts:
EXACT interaction count, full item coverage, no within-user duplicates,
and content that is an informative view of the latents.
"""
import numpy as np
import pytest

from coldrec_tpu.data.synthetic import latent_content, latent_interactions


@pytest.mark.parametrize("seed", [0, 3, 11, 42])
def test_exact_nnz_full_coverage_no_dups(seed):
    n_users, n_items, nnz = 180, 400, 2600
    pairs, uf, vf = latent_interactions(
        n_users, n_items, nnz, seed=seed, min_degree=5
    )
    assert pairs.shape == (nnz, 2)
    # full item coverage (the repair loop's contract, incl. the case where
    # a replaced pick was an item's only occurrence)
    assert np.unique(pairs[:, 1]).size == n_items
    # no (user, item) duplicates
    assert np.unique(pairs[:, 0] * n_items + pairs[:, 1]).size == nnz
    # min_degree respected
    assert np.bincount(pairs[:, 0], minlength=n_users).min() >= 5
    assert uf.shape == (n_users, 16) and vf.shape == (n_items, 16)


def test_infeasible_nnz_raises():
    with pytest.raises(ValueError, match="achievable range"):
        latent_interactions(300, 250, 1000, seed=0, min_degree=5)  # too few
    with pytest.raises(ValueError, match="achievable range"):
        latent_interactions(10, 20, 10_000, seed=0, min_degree=5)  # too many


def test_deterministic():
    a, _, _ = latent_interactions(120, 90, 1500, seed=9)
    b, _, _ = latent_interactions(120, 90, 1500, seed=9)
    np.testing.assert_array_equal(a, b)


def test_content_is_informative():
    """Content = noisy linear lift of the factors: rows with similar
    factors must have more similar content than random pairs."""
    _, _, vf = latent_interactions(120, 150, 1800, seed=1, min_degree=5)
    content = latent_content(vf, 32, seed=2)
    assert content.shape == (150, 32)
    # project content back: correlation between factor similarity and
    # content similarity over random pairs should be clearly positive
    rng = np.random.default_rng(0)
    i, j = rng.integers(0, 150, (2, 2000))
    fac_sim = (vf[i] * vf[j]).sum(1)
    con_sim = (content[i] * content[j]).sum(1)
    r = np.corrcoef(fac_sim, con_sim)[0, 1]
    assert r > 0.3, r
