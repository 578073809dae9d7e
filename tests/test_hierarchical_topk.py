"""Hierarchical two-stage top-k == flat top_k on wide item spaces."""
import jax
import jax.numpy as jnp
import numpy as np

from coldrec_tpu.runtime.eval import _hierarchical_topk, masked_topk


def test_hierarchical_matches_flat(rng):
    b, n_items, k = 8, 40000, 20  # wide enough to trigger the 2-stage path
    scores = jnp.asarray(rng.standard_normal((b, n_items)).astype(np.float32))
    hv, hi = _hierarchical_topk(scores, k)
    fv, fi = jax.lax.top_k(scores, k)
    np.testing.assert_allclose(np.asarray(hv), np.asarray(fv), rtol=1e-6)
    # values gathered via returned ids must equal the top values (ties may
    # reorder ids with equal scores)
    np.testing.assert_allclose(
        np.take_along_axis(np.asarray(scores), np.asarray(hi), axis=1),
        np.asarray(fv),
        rtol=1e-6,
    )


def test_masked_topk_wide(rng):
    b, n_items, r, k = 4, 50000, 16, 10
    scores = jnp.asarray(rng.standard_normal((b, n_items)).astype(np.float32))
    rated = np.full((b, r), n_items, np.int32)
    rated[0, :5] = rng.choice(n_items, 5, replace=False)
    excluded = np.zeros(n_items, bool)
    excluded[rng.choice(n_items, 1000, replace=False)] = True
    vals, idx = masked_topk(
        scores, jnp.asarray(rated), jnp.asarray(excluded), k
    )
    idx = np.asarray(idx)
    assert not (set(idx[0].tolist()) & set(rated[0, :5].tolist()))
    for b_i in range(b):
        assert not (set(idx[b_i].tolist()) & set(np.where(excluded)[0].tolist()))


def test_masked_topk_heavy_rated_scatter_path(rng):
    """XING regime (round-5 lane failure): when (k+R)*R > I the
    overfetch-reject cube is (B, k+R, R) — 264 GB at the real XING parity
    shape — and masked_topk must switch to the scattered (B, I+1) mask
    plane. The two formulations must agree exactly on values, rated
    exclusion, and exclusion masking."""
    b, n_items, k = 6, 1000, 20
    r = 200  # (k+r)*r = 44,000 > n_items -> scatter-plane path
    scores = jnp.asarray(
        rng.standard_normal((b, n_items)).astype(np.float32))
    rated = np.full((b, r), n_items, np.int32)
    for i in range(b):
        cnt = int(rng.integers(0, r))
        rated[i, :cnt] = rng.choice(n_items, cnt, replace=False)
    excluded = np.zeros(n_items, bool)
    excluded[rng.choice(n_items, 100, replace=False)] = True

    vals, idx = masked_topk(
        scores, jnp.asarray(rated), jnp.asarray(excluded), k)
    vals, idx = np.asarray(vals), np.asarray(idx)

    # oracle: dense numpy masking
    dense = np.asarray(scores).copy()
    dense[:, excluded] = -10e8
    for i in range(b):
        real = rated[i][rated[i] < n_items]
        dense[i, real] = -10e8
    order = np.argsort(-dense, axis=1, kind="stable")[:, :k]
    np.testing.assert_allclose(
        vals, np.take_along_axis(dense, order, axis=1), rtol=1e-6)
    for i in range(b):
        assert not (set(idx[i].tolist())
                    & set(rated[i][rated[i] < n_items].tolist()))
        assert not (set(idx[i].tolist())
                    & set(np.where(excluded)[0].tolist()))
