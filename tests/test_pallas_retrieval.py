"""Pallas retrieval kernel (interpret mode on CPU) vs masked_topk oracle."""
import numpy as np
import jax.numpy as jnp
import pytest

from coldrec_tpu.ops.pallas.retrieval import build_mask_tile, retrieval_topk
from coldrec_tpu.runtime.eval import masked_topk


@pytest.mark.parametrize("n_items", [100, 256])
def test_retrieval_matches_masked_topk(rng, n_items):
    n_users, d, k = 40, 16, 10
    ue = rng.standard_normal((n_users, d)).astype(np.float32)
    ie = rng.standard_normal((n_items, d)).astype(np.float32)
    max_rated = 12
    rated = np.full((n_users, max_rated), n_items, dtype=np.int32)
    for u in range(n_users):
        nr = rng.integers(0, max_rated)
        rated[u, :nr] = rng.choice(n_items, nr, replace=False)
    excluded = np.zeros(n_items, dtype=bool)
    excluded[rng.choice(n_items, n_items // 4, replace=False)] = True

    vals, ids = retrieval_topk(
        ue, ie, rated, excluded, k, tile_u=16, block_i=64, interpret=True
    )

    scores = jnp.asarray(ue) @ jnp.asarray(ie).T
    ref_vals, ref_ids = masked_topk(
        scores, jnp.asarray(rated), jnp.asarray(excluded), k
    )
    np.testing.assert_allclose(vals, np.asarray(ref_vals), rtol=1e-4, atol=1e-4)
    # indices may differ only where scores tie; compare via score values
    np.testing.assert_allclose(
        np.take_along_axis(np.asarray(scores), ids, axis=1),
        np.take_along_axis(np.asarray(scores), np.asarray(ref_ids), axis=1),
        rtol=1e-4, atol=1e-4,
    )
    # no excluded or rated items in the result
    for u in range(n_users):
        got = set(ids[u].tolist())
        assert not (got & set(np.where(excluded)[0].tolist()))
        assert not (got & set(rated[u][rated[u] < n_items].tolist()))


def test_build_mask_tile(rng):
    n_items, tu = 50, 8
    rated = np.full((tu, 5), n_items, dtype=np.int32)
    rated[0, :2] = [3, 7]
    excluded = np.zeros(n_items, dtype=bool)
    excluded[10] = True
    plane = np.asarray(build_mask_tile(jnp.asarray(rated), jnp.asarray(excluded), 64))
    assert plane.shape == (tu, 64)
    assert plane[0, 3] == 1 and plane[0, 7] == 1
    assert (plane[:, 10] == 1).all()
    assert (plane[:, 50:] == 1).all()  # padded region excluded
    assert plane[1, 3] == 0
